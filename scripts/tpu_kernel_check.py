#!/usr/bin/env python3
"""On-hardware numerical check of the fused deformable kernels against the
jnp golden reference (the interpret-mode suite covers semantics; this
catches Mosaic lowering differences). Run on the TPU backend."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from emrt_tpu.ops.deformable import deformable_attention_core
from emrt_tpu.ops.deformable_pallas import deformable_attention_pallas

SHAPES = ((32, 32), (16, 16), (8, 8))
LV = sum(h * w for h, w in SHAPES)


def main(bs=2):
    r = np.random.default_rng(0)
    nh, c, L, P = 8, 32, 3, 6
    lq = LV
    value = jnp.asarray(r.standard_normal((bs, LV, nh, c)), jnp.float32)
    loc = jnp.asarray(r.uniform(-0.05, 1.05, (bs, lq, nh, L, P, 2)),
                      jnp.float32)
    attn = jax.nn.softmax(jnp.asarray(
        r.standard_normal((bs, lq, nh, L * P)), jnp.float32)).reshape(
        bs, lq, nh, L, P)

    for dtype, tol in ((jnp.float32, 3e-4), (jnp.bfloat16, 5e-2)):
        v = value.astype(dtype)
        a = attn.astype(dtype)

        def loss_ref(v_, l_, a_):
            return jnp.sum(deformable_attention_core(
                v_.astype(jnp.float32), SHAPES, l_,
                a_.astype(jnp.float32)) ** 2)

        def loss_pal(v_, l_, a_):
            return jnp.sum(deformable_attention_pallas(
                v_, SHAPES, l_, a_).astype(jnp.float32) ** 2)

        out_ref = jax.jit(lambda v_, l_, a_: deformable_attention_core(
            v_.astype(jnp.float32), SHAPES, l_, a_.astype(jnp.float32)))(
            v, loc, a)
        out_pal = jax.jit(lambda v_, l_, a_: deformable_attention_pallas(
            v_, SHAPES, l_, a_))(v, loc, a)
        scale = float(jnp.abs(out_ref).max()) + 1e-8
        err_f = float(jnp.abs(out_pal.astype(jnp.float32) - out_ref).max())
        gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(v, loc, a)
        gp = jax.jit(jax.grad(loss_pal, argnums=(0, 1, 2)))(v, loc, a)
        errs = []
        for a_, b_ in zip(gr, gp):
            s = float(jnp.abs(a_.astype(jnp.float32)).max()) + 1e-8
            errs.append(float(jnp.abs(
                b_.astype(jnp.float32) - a_.astype(jnp.float32)).max()) / s)
        print(f"{np.dtype(dtype).name}: fwd rel-err {err_f / scale:.2e}, "
              f"grad rel-errs {[f'{e:.2e}' for e in errs]} (tol {tol})")
        assert err_f / scale < tol, "forward mismatch"
        assert all(e < tol for e in errs), "grad mismatch"
    print("TPU kernel check OK")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2)
