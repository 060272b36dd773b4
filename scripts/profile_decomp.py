#!/usr/bin/env python3
"""Decomposition profile: where does EMRT-r50 inference time go on TPU?

Times (chained, serialized) the full forward and its major components
separately so the perf work targets the real bottleneck.
"""
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


def timed(fn, x, iters=10, name=""):
    y = fn(x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(y)
    jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:42s} {dt * 1e3:9.2f} ms/iter  ({x.shape[0] / dt:8.1f} tiles/s)")
    return dt


def main():
    print("backend:", jax.default_backend(), jax.devices())
    cfg = get_config()
    cfg.DATA.DATASET = "Synthetic"
    cfg.DATA.NUM_CLASSES = 6
    cfg.DATA.CROP_SIZE = (256, 256)
    cfg.MODEL.NAME = "EMRT"
    cfg.MODEL.ENCODER.TYPE = "resnet50"
    cfg.MODEL.OUTPUT_STRIDE = 32
    cfg.TRAIN.DTYPE = "bfloat16"

    model = get_model(cfg)
    print("use_pallas:", model.use_pallas, "dtype:", model.dtype)
    rng = jax.random.key(0)
    bs = 32
    x = jnp.asarray(np.random.default_rng(0).uniform(
        -2, 2, (bs, 256, 256, 3)).astype(np.float32))
    variables = jax.jit(lambda r, xx: model.init(r, xx, train=False))(rng, x[:1])

    @jax.jit
    def full(x):
        out = model.apply(variables, x, train=False)[0]
        return x + out.mean().astype(x.dtype) * 1e-9

    t_full = timed(full, x, name="full forward (bs=32)")

    # backbone only
    from emrt_tpu.models.backbones.resnet import resnet
    bb = resnet(50, output_stride=32, dtype=jnp.bfloat16)
    bvars = jax.jit(lambda r, xx: bb.init(r, xx, False))(rng, x[:1])

    @jax.jit
    def backbone(x):
        c1, c2, c3, c4 = bb.apply(bvars, x, False)
        return x + c4.mean().astype(x.dtype) * 1e-9

    t_bb = timed(backbone, x, name="resnet50 backbone only")

    # spatial branch + psp
    from emrt_tpu.models.emrt import PyramidPoolingModule, SpatialBranch
    import flax.linen as nn

    class SBP(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = SpatialBranch(dtype=jnp.bfloat16)(x, False)
            return PyramidPoolingModule((1, 3, 6, 8), 256, dtype=jnp.bfloat16)(y, False)

    sbp = SBP()
    svars = jax.jit(lambda r, xx: sbp.init(r, xx))(rng, x[:1])

    @jax.jit
    def spatial(x):
        t = sbp.apply(svars, x)
        return x + t.mean().astype(x.dtype) * 1e-9

    t_sp = timed(spatial, x, name="spatial branch + PSP")

    # encoder-decoder on random tokens
    from emrt_tpu.models.deformable_transformer import EncoderDecoder
    shapes = ((32, 32), (16, 16), (8, 8))
    feats = [jnp.asarray(np.random.default_rng(i).normal(
        0, 1, (bs, h, w, 256)).astype(np.float32), dtype=jnp.bfloat16)
        for i, (h, w) in enumerate(shapes)]
    psp = jnp.asarray(np.random.default_rng(9).normal(
        0, 1, (bs, 110, 256)), dtype=jnp.bfloat16)
    encdec = EncoderDecoder(dtype=jnp.bfloat16, use_pallas=model.use_pallas)
    evars = jax.jit(lambda r, ff, pp: encdec.init(r, ff, pp))(rng, [f[:1] for f in feats], psp[:1])

    @jax.jit
    def ed(carry):
        feats_, psp_ = carry
        hs, mem = encdec.apply(evars, feats_, psp_)
        d = mem.mean().astype(jnp.bfloat16) * 1e-9
        return ([f + d for f in feats_], psp_ + d)

    c = (feats, psp)
    y = ed(c)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(10):
        y = ed(y)
    jax.block_until_ready(y)
    t_ed = (time.perf_counter() - t0) / 10
    print(f"{'encoder-decoder (4+2 layers)':42s} {t_ed * 1e3:9.2f} ms/iter  ({bs / t_ed:8.1f} tiles/s)")

    # deformable attention op alone (encoder shape: Lq=Lv=1344)
    from emrt_tpu.ops.deformable_pallas import deformable_attention_pallas
    nh, c_, P = 8, 32, 6
    lv = sum(h * w for h, w in shapes)
    value = jnp.asarray(np.random.default_rng(3).normal(0, 1, (bs, lv, nh, c_)),
                        dtype=jnp.bfloat16)
    loc = jnp.asarray(np.random.default_rng(4).uniform(
        0, 1, (bs, lv, nh, 3, P, 2)).astype(np.float32))
    attnw = jnp.asarray(np.random.default_rng(5).uniform(
        0, 1, (bs, lv, nh, 3, P)).astype(np.float32) / (3 * P))

    @jax.jit
    def dattn(value):
        out = deformable_attention_pallas(value, shapes, loc, attnw)
        return value + out.reshape(value.shape).astype(value.dtype) * 1e-9

    t_da = timed(dattn, value, name="deformable attn op (enc shape, 1 call)")

    print()
    print(f"sum of parts: bb {t_bb*1e3:.1f} + spatial {t_sp*1e3:.1f} + encdec {t_ed*1e3:.1f} "
          f"= {(t_bb+t_sp+t_ed)*1e3:.1f} ms vs full {t_full*1e3:.1f} ms")
    print(f"encoder-decoder share: {t_ed/t_full*100:.0f}%  "
          f"(deform-attn 4 enc calls ~ {4*t_da*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
