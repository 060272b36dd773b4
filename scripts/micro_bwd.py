#!/usr/bin/env python3
"""Time the deformable fwd / gv / gla pallas kernels separately at the
train shape (bs, lq=lv=1344, nh=8, c=32, L=3, P=6 like EMRT, bf16 values)."""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from emrt_tpu.ops import deformable_pallas as dp

K = 10
SHAPES = ((32, 32), (16, 16), (8, 8))
LV = sum(h * w for h, w in SHAPES)


def _force(c):
    """block_until_ready alone does not force execution through the axon
    tunnel — fetch one scalar to host."""
    leaf = jax.tree.leaves(c)[0]
    return float(jnp.real(leaf.reshape(-1)[0]).astype(jnp.float32))


def time_loop(step, init, name):
    @jax.jit
    def loop(c):
        return jax.lax.fori_loop(0, K, lambda i, c: step(c), c)

    _force(loop(init))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _force(loop(init))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{name:44s} {best * 1e3:9.3f} ms")
    return best


def main(bs=8, P=6):
    r = np.random.default_rng(0)
    nh, c, L = 8, 32, 3
    lq = LV
    value = jnp.asarray(r.standard_normal((bs, LV, nh, c)), jnp.bfloat16)
    loc = jnp.asarray(r.uniform(0, 1, (bs, lq, nh, L, P, 2)), jnp.float32)
    attn = jax.nn.softmax(jnp.asarray(
        r.standard_normal((bs, lq, nh, L, P)), jnp.float32).reshape(
        bs, lq, nh, L * P)).reshape(bs, lq, nh, L, P).astype(jnp.bfloat16)
    g = jnp.asarray(r.standard_normal((bs, lq, nh * c)), jnp.bfloat16)

    tq_gv, tq_gla = dp._bwd_tqs(lq, LV, nh, c, 2)
    tq_fwd = dp._fwd_tq(lq, LV, nh, c, 2)
    print(f"tq fwd={tq_fwd} gv={tq_gv} gla={tq_gla}")

    def fwd_step(carry):
        v, l, a = carry
        out = dp._fwd_dispatch(v, SHAPES, l, a, False)
        return (v * jnp.bfloat16(0.999) + out.reshape(bs, LV, nh, c) * jnp.bfloat16(0.01), l, a)

    time_loop(fwd_step, (value, loc, attn), "fwd kernel")

    def full_bwd_step(carry):
        v, l, a, gg = carry
        gv, gl, ga = dp._bwd_dispatch(v, SHAPES, l, a, gg, False)
        return (v * jnp.bfloat16(0.999) + gv.astype(jnp.bfloat16) * jnp.bfloat16(0.01), l * 0.999 + gl * 0.01, a, gg)

    time_loop(full_bwd_step, (value, loc, attn, g), "bwd gv+gla")

    # gv alone: call the pallas_call via a trimmed dispatch
    def gv_only(v, l, a, gg):
        lq_ = l.shape[1]
        loc2 = l.reshape(bs, lq_, nh * L * P * 2).astype(jnp.float32)
        attn2 = a.reshape(bs, lq_, nh * L * P).astype(v.dtype)
        g2 = gg.reshape(bs, lq_, nh * c)
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        lp2, lp = loc2.shape[-1], attn2.shape[-1]
        return pl.pallas_call(
            functools.partial(dp._bwd_gv_kernel, shapes=SHAPES,
                              tq=tq_gv, n_points=P, n_heads=nh, c=c),
            grid=(bs, lq_ // tq_gv),
            in_specs=[
                pl.BlockSpec((1, tq_gv, lp2), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tq_gv, lp), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tq_gv, nh * c), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, nh * c, LV), lambda i, j: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bs, nh * c, LV), jnp.float32),
            scratch_shapes=[pltpu.VMEM((tq_gv, LV), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(loc2, attn2, g2)

    def gv_step(carry):
        v, l, a, gg = carry
        gv = gv_only(v, l, a, gg)
        return (v * jnp.bfloat16(0.999) + gv.reshape(bs, nh, c, LV).transpose(0, 3, 1, 2).astype(v.dtype) * jnp.bfloat16(0.01),
                l, a, gg)

    time_loop(gv_step, (value, loc, attn, g), "gv kernel alone")

    def gla_only(v, l, a, gg):
        lq_ = l.shape[1]
        loc2 = l.reshape(bs, lq_, nh * L * P * 2).astype(jnp.float32)
        attn2 = a.reshape(bs, lq_, nh * L * P).astype(v.dtype)
        v2 = v.reshape(bs, LV, nh * c)
        g2 = gg.reshape(bs, lq_, nh * c)
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        lp2, lp = loc2.shape[-1], attn2.shape[-1]
        return pl.pallas_call(
            functools.partial(dp._bwd_gla_kernel, shapes=SHAPES,
                              tq=tq_gla, n_points=P, n_heads=nh, c=c),
            grid=(bs, lq_ // tq_gla),
            in_specs=[
                pl.BlockSpec((1, tq_gla, lp2), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tq_gla, lp), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, LV, nh * c), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tq_gla, nh * c), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, tq_gla, lp2), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tq_gla, lp), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bs, lq_, nh * L * P * 2), jnp.float32),
                jax.ShapeDtypeStruct((bs, lq_, nh * L * P), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((tq_gla, LV), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(loc2, attn2, v2, g2)

    def gla_step(carry):
        v, l, a, gg = carry
        gl, ga = gla_only(v, l, a, gg)
        return (v, l * 0.999 + gl.reshape(l.shape) * 0.01, a, gg)

    time_loop(gla_step, (value, loc, attn, g), "gla kernel alone")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8,
         int(sys.argv[2]) if len(sys.argv) > 2 else 6)
