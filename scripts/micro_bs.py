#!/usr/bin/env python3
"""Batch-size sweep for EMRT-r50 inference throughput (on-device loop)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from emrt_tpu.config import get_config
from emrt_tpu.models import get_model

K = 10


def main():
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
    x1 = jnp.zeros((1, 256, 256, 3), jnp.float32)
    variables = jax.jit(lambda r, xx: model.init(r, xx, train=False))(rng, x1)

    for bs in (16, 32, 64, 128):
        x = jnp.asarray(np.random.default_rng(0).uniform(
            -2, 2, (bs, 256, 256, 3)).astype(np.float32))

        def fwd_step(xc):
            out = model.apply(variables, xc, train=False)[0]
            return xc * 0.999 + out.mean(axis=-1, keepdims=True)[:, :, :, :1] * 1e-3

        @jax.jit
        def loop(c):
            return jax.lax.fori_loop(0, K, lambda i, c: fwd_step(c), c)

        try:
            c = loop(x)
            jax.block_until_ready(c)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                c = loop(x)
                jax.block_until_ready(c)
                best = min(best, (time.perf_counter() - t0) / K)
            print(f"bs={bs:4d}  {best * 1e3:8.2f} ms  {bs / best:8.1f} tiles/s")
        except Exception as e:
            print(f"bs={bs}: FAILED {type(e).__name__} {str(e)[:120]}")


if __name__ == "__main__":
    main()
