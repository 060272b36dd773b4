#!/usr/bin/env python3
"""On-device-loop timing: lax.fori_loop(K) inside one jit — immune to
tunnel dispatch noise. Times full EMRT forward and the deformable op."""
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
from emrt_tpu.ops.deformable_pallas import deformable_attention_pallas

K = 10


def time_loop(step, init, name, work_items):
    """step: carry -> carry. Times K on-device iterations inside one jit."""
    @jax.jit
    def loop(c):
        return jax.lax.fori_loop(0, K, lambda i, c: step(c), c)

    c = loop(init)  # compile+warm
    jax.block_until_ready(c)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        c = loop(init)
        jax.block_until_ready(c)
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{name:40s} {best * 1e3:9.3f} ms/iter  ({work_items / best:9.1f} items/s)")
    return best


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
    bs = 32
    x = jnp.asarray(np.random.default_rng(0).uniform(
        -2, 2, (bs, 256, 256, 3)).astype(np.float32))
    variables = jax.jit(lambda r, xx: model.init(r, xx, train=False))(rng, x[:1])

    def fwd_step(xc):
        out = model.apply(variables, xc, train=False)[0]
        # real data dependency: fold the logits back into the input
        return xc * 0.999 + out.mean(axis=-1, keepdims=True)[:, :, :, :1] * 1e-3

    time_loop(fwd_step, x, "full forward bs=32", bs)

    # deformable op, encoder shape
    shapes = ((32, 32), (16, 16), (8, 8))
    nh, c_, P = 8, 32, 6
    lv = sum(h * w for h, w in shapes)
    rng2 = np.random.default_rng(3)
    value = jnp.asarray(rng2.standard_normal((bs, lv, nh, c_)), dtype=jnp.bfloat16)
    loc = jnp.asarray(rng2.uniform(0, 1, (bs, lv, nh, 3, P, 2)).astype(np.float32))
    attnw = jnp.asarray((rng2.uniform(0, 1, (bs, lv, nh, 3, P)) / 18).astype(np.float32))

    def dattn_step(v):
        out = deformable_attention_pallas(v, shapes, loc, attnw)
        return v * 0.999 + out.reshape(v.shape).astype(v.dtype) * 1e-3

    time_loop(dattn_step, value, "deformable op (production, enc shape)", bs)


if __name__ == "__main__":
    main()
