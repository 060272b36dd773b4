#!/usr/bin/env python3
"""Ablation diagnostic for the gla backward kernel: measure stripped
variants to locate its time (NOT a correctness harness — variants give
wrong grads by design)."""
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

K = 10
SHAPES = ((32, 32), (16, 16), (8, 8))
LV = sum(h * w for h, w in SHAPES)


def _force(c):
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


def gla_kernel_variant(loc_ref, attn_ref, v_ref, g_ref, gloc_ref, gattn_ref,
                       gm_scr, *, shapes, tq, n_points, n_heads, c, mode):
    """mode: full | no_t (skip t/gx) | no_mm (skip reduce matmuls)
    | no_sum (skip cross-lane sums) | gm_only (just gm build)"""
    n_levels = len(shapes)
    tables = []
    for l, (h, w) in enumerate(shapes):
        hw = h * w
        col_t = (jax.lax.broadcasted_iota(jnp.int32, (tq, hw), 1) % w
                 ).astype(jnp.float32)
        rowh = jax.lax.broadcasted_iota(jnp.int32, (tq, h), 1
                                        ).astype(jnp.float32)
        kk_t = jax.lax.broadcasted_iota(jnp.int32, (hw, h), 0)
        hh_t = jax.lax.broadcasted_iota(jnp.int32, (hw, h), 1)
        reduce_t = (kk_t // w == hh_t).astype(jnp.bfloat16)
        tables.append((col_t, rowh, reduce_t))

    for hd in range(n_heads):
        g = g_ref[0, :, hd * c:(hd + 1) * c]
        v = v_ref[0, :, hd * c:(hd + 1) * c]
        gm_scr[:] = jax.lax.dot_general(
            g, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if mode == "gm_only":
            if hd == n_heads - 1:
                gattn_ref[0] = jnp.zeros_like(gattn_ref[0]) + gm_scr[0, 0]
                gloc_ref[0] = jnp.zeros_like(gloc_ref[0])
            continue
        off = 0
        for l, (h, w) in enumerate(shapes):
            hw = h * w
            col_t, row_tab, reduce_t = tables[l]
            gm = gm_scr[:, off:off + hw]
            j0 = (hd * n_levels + l) * n_points
            gas, glocs = [], []
            for p in range(n_points):
                jj = j0 + p
                x_pix = loc_ref[0, :, 2 * jj:2 * jj + 1] * w - 0.5
                y_pix = loc_ref[0, :, 2 * jj + 1:2 * jj + 2] * h - 0.5
                a = attn_ref[0, :, jj:jj + 1].astype(jnp.float32)
                dxs = col_t - x_pix
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(dxs))
                dys_s = row_tab - y_pix
                wy_s = jnp.maximum(0.0, 1.0 - jnp.abs(dys_s))
                dwy_s = jnp.where(wy_s > 0.0, jnp.sign(dys_s), 0.0)
                u = (gm * wx).astype(jnp.bfloat16)
                if mode == "no_t":
                    t = u
                else:
                    dwx = jnp.where(wx > 0.0, jnp.sign(dxs), 0.0)
                    t = (gm * dwx).astype(jnp.bfloat16)
                if mode == "no_mm":
                    u_r = u[:, :h].astype(jnp.float32)
                    t_r = t[:, :h].astype(jnp.float32)
                else:
                    u_r = jnp.dot(u, reduce_t,
                                  preferred_element_type=jnp.float32)
                    t_r = jnp.dot(t, reduce_t,
                                  preferred_element_type=jnp.float32)
                if mode == "no_sum":
                    ga = u_r[:, :1]
                    gx = t_r[:, :1]
                    gy = u_r[:, 1:2]
                else:
                    ga = jnp.sum(u_r * wy_s, axis=1, keepdims=True)
                    gx = jnp.sum(t_r * wy_s, axis=1, keepdims=True)
                    gy = jnp.sum(u_r * dwy_s, axis=1, keepdims=True)
                gas.append(ga)
                glocs.append(a * (w * gx))
                glocs.append(a * (h * gy))
            gattn_ref[0, :, j0:j0 + n_points] = jnp.concatenate(
                gas, axis=1).astype(gattn_ref.dtype)
            gloc_ref[0, :, 2 * j0:2 * (j0 + n_points)] = jnp.concatenate(
                glocs, axis=1).astype(gloc_ref.dtype)
            off += hw


def main(bs=8):
    r = np.random.default_rng(0)
    nh, c, L, P = 8, 32, 3, 4
    lq = LV
    tq = 224
    value = jnp.asarray(r.standard_normal((bs, LV, nh, c)), jnp.bfloat16)
    loc = jnp.asarray(r.uniform(0, 1, (bs, lq, nh, L, P, 2)), jnp.float32)
    attn = jax.nn.softmax(jnp.asarray(
        r.standard_normal((bs, lq, nh, L, P)), jnp.float32).reshape(
        bs, lq, nh, L * P)).reshape(bs, lq, nh, L, P).astype(jnp.bfloat16)
    g = jnp.asarray(r.standard_normal((bs, lq, nh * c)), jnp.bfloat16)

    loc2 = loc.reshape(bs, lq, nh * L * P * 2)
    attn2 = attn.reshape(bs, lq, nh * L * P)
    v2 = value.reshape(bs, LV, nh * c)
    g2 = g.reshape(bs, lq, nh * c)
    lp2, lp = loc2.shape[-1], attn2.shape[-1]

    def run(mode):
        f = pl.pallas_call(
            functools.partial(gla_kernel_variant, shapes=SHAPES,
                              tq=tq, n_points=P, n_heads=nh, c=c, mode=mode),
            grid=(bs, lq // tq),
            in_specs=[
                pl.BlockSpec((1, tq, lp2), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tq, lp), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, LV, nh * c), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tq, nh * c), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, tq, lp2), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tq, lp), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bs, lq, lp2), jnp.float32),
                jax.ShapeDtypeStruct((bs, lq, lp), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((tq, LV), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )

        def step(carry):
            l, gg = carry
            gl, ga = f(l.astype(jnp.float32), attn2, v2, gg)
            return (l * 0.999 + gl * 0.001, gg)

        time_loop(step, (loc2, g2), f"gla[{mode}]")

    for mode in ("full", "no_t", "no_mm", "no_sum", "gm_only"):
        run(mode)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
