#!/usr/bin/env python3
"""Probe: time the fused fwd kernel at an explicit tq (argv[1]) at the
train shape (bs 8, lq=lv=1344, nh 8, c 32, L 3, P 4, bf16 values)."""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from emrt_tpu.ops.deformable_pallas import _fused_fwd_kernel

K = 10
SHAPES = ((32, 32), (16, 16), (8, 8))
LV = sum(h * w for h, w in SHAPES)


def _force(c):
    leaf = jax.tree.leaves(c)[0]
    return float(jnp.real(leaf.reshape(-1)[0]).astype(jnp.float32))


def main(tq, bs=8):
    nh, c, L, P = 8, 32, 3, 4
    lq = LV
    r = np.random.default_rng(0)
    loc2 = jnp.asarray(r.uniform(0, 1, (bs, lq, nh * L * P * 2)), jnp.float32)
    attn2 = jnp.asarray(r.uniform(0, 1.0 / 18, (bs, lq, nh * L * P)),
                        jnp.bfloat16)
    v2 = jnp.asarray(r.standard_normal((bs, LV, nh * c)), jnp.bfloat16)

    call = pl.pallas_call(
        functools.partial(_fused_fwd_kernel, shapes=SHAPES, tq=tq,
                          n_points=P, n_heads=nh, c=c),
        grid=(bs, lq // tq),
        in_specs=[
            pl.BlockSpec((1, tq, nh * L * P * 2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, nh * L * P), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LV, nh * c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, nh * c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bs, lq, nh * c), v2.dtype),
        scratch_shapes=[pltpu.VMEM((tq, LV), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )

    @jax.jit
    def loop(v):
        def body(i, v):
            o = call(loc2, attn2, v)
            return (v + o.astype(v.dtype) * jnp.bfloat16(1e-3)).astype(v.dtype)
        return jax.lax.fori_loop(0, K, body, v)

    _force(loop(v2))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _force(loop(v2))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"fwd kernel tq={tq} bs={bs}: {best * 1e3:9.3f} ms")


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]) if len(sys.argv) > 2 else 8)
