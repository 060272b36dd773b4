#!/usr/bin/env python3
"""Dump compiled HLO of the EMRT forward and print named fusions."""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from emrt_tpu.config import get_config
from emrt_tpu.models import get_model


def main():
    targets = sys.argv[1:] or ["fusion.1652", "fusion.1650",
                               "maximum_convert_fusion.79",
                               "maximum_convert_fusion.85", "copy.984",
                               "copy.983", "fusion.1605", "fusion.1649",
                               "fusion.1651", "fusion.1653",
                               "multiply_add_fusion.2"]
    cfg = get_config()
    cfg.DATA.DATASET = "Synthetic"
    cfg.DATA.NUM_CLASSES = 6
    cfg.DATA.CROP_SIZE = (256, 256)
    cfg.MODEL.NAME = "EMRT"
    cfg.MODEL.ENCODER.TYPE = "resnet50"
    cfg.MODEL.OUTPUT_STRIDE = 32
    cfg.TRAIN.DTYPE = "bfloat16"
    model = get_model(cfg)
    rng = jax.random.key(0)
    x = jnp.zeros((32, 256, 256, 3), jnp.float32)
    variables = jax.jit(lambda r, xx: model.init(r, xx, train=False))(rng, x[:1])

    @jax.jit
    def loop(c):
        def body(i, c):
            out = model.apply(variables, c, train=False)[0]
            return c * 0.999 + out.mean(axis=-1, keepdims=True)[:, :, :, :1] * 1e-3
        return jax.lax.fori_loop(0, 3, body, c)

    txt = loop.lower(x).compile().as_text()
    print("HLO size:", len(txt))
    for tgt in targets:
        # find the fusion computation root line(s) mentioning the name
        pat = re.compile(r"^\s*%?" + re.escape(tgt) + r"\b.*$", re.M)
        for m in pat.finditer(txt):
            line = m.group(0)
            print("=" * 20, tgt)
            print(line[:600])
            # find metadata op_name
            meta = re.search(r'op_name="([^"]+)"', line)
            if meta:
                print("  op_name:", meta.group(1))
            break


if __name__ == "__main__":
    main()
