#!/usr/bin/env python3
"""On-device budget breakdown of EMRT-r50 bs=32 inference after the fused
kernel: full model, encoder-decoder, single attention module (projections +
softmax + loc build + op), bare op, decoder-shaped op."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from emrt_tpu.models.deformable_transformer import (EncoderDecoder,
                                                    MSDeformableAttention)
from emrt_tpu.ops.deformable_pallas import deformable_attention_pallas

K = 10
BS = 32
SHAPES = ((32, 32), (16, 16), (8, 8))
LV = sum(h * w for h, w in SHAPES)


def time_loop(step, init, name):
    @jax.jit
    def loop(c):
        return jax.lax.fori_loop(0, K, lambda i, c: step(c), c)

    c = loop(init)
    jax.block_until_ready(c)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        c = loop(init)
        jax.block_until_ready(c)
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{name:44s} {best * 1e3:9.3f} ms")
    return best


def main():
    rng = jax.random.key(0)
    rng2 = np.random.default_rng(1)
    tokens = jnp.asarray(rng2.standard_normal((BS, LV, 256)), dtype=jnp.bfloat16)
    ref_enc = jnp.asarray(rng2.uniform(0, 1, (BS, LV, 3, 2)).astype(np.float32))

    # single encoder self-attention module (projections + softmax + loc + op)
    attn_mod = MSDeformableAttention(256, 8, 3, 6, dtype=jnp.bfloat16,
                                     use_pallas=True)
    avars = jax.jit(lambda r, q, rp, v: attn_mod.init(r, q, rp, v, SHAPES)
                    )(rng, tokens[:1], ref_enc[:1], tokens[:1])

    def attn_step(t):
        o = attn_mod.apply(avars, t, ref_enc, t, SHAPES)
        return t * 0.999 + o.astype(t.dtype) * 1e-3

    time_loop(attn_step, tokens, "MSDeformableAttention module (enc)")

    # bare op (enc shape)
    value = jnp.asarray(rng2.standard_normal((BS, LV, 8, 32)), dtype=jnp.bfloat16)
    loc = jnp.asarray(rng2.uniform(0, 1, (BS, LV, 8, 3, 6, 2)).astype(np.float32))
    attnw = jnp.asarray((rng2.uniform(0, 1, (BS, LV, 8, 3, 6)) / 18).astype(np.float32))

    def op_step(v):
        o = deformable_attention_pallas(v, SHAPES, loc, attnw)
        return v * 0.999 + o.reshape(v.shape).astype(v.dtype) * 1e-3

    time_loop(op_step, value, "bare fused op (enc shape)")

    # bare op decoder shape (Lq=110)
    loc_d = jnp.asarray(rng2.uniform(0, 1, (BS, 110, 8, 3, 6, 2)).astype(np.float32))
    attn_d = jnp.asarray((rng2.uniform(0, 1, (BS, 110, 8, 3, 6)) / 18).astype(np.float32))

    def opd_step(v):
        o = deformable_attention_pallas(v, SHAPES, loc_d, attn_d)
        return v * 0.999 + o.mean().astype(v.dtype) * 1e-3

    time_loop(opd_step, value, "bare fused op (dec shape Lq=110)")

    # full encoder-decoder
    feats = [jnp.asarray(rng2.standard_normal((BS, h, w, 256)), dtype=jnp.bfloat16)
             for h, w in SHAPES]
    psp = jnp.asarray(rng2.standard_normal((BS, 110, 256)), dtype=jnp.bfloat16)
    encdec = EncoderDecoder(dtype=jnp.bfloat16, use_pallas=True)
    evars = jax.jit(lambda r, ff, pp: encdec.init(r, ff, pp))(
        rng, [f[:1] for f in feats], psp[:1])

    def ed_step(c):
        fs, pp = c
        hs, mem = encdec.apply(evars, fs, pp)
        d = mem.mean().astype(jnp.bfloat16) * 1e-3
        from emrt_tpu.models.deformable_transformer import tokens_to_levels
        mem_lvls = tokens_to_levels(mem, SHAPES)
        return ([f * 0.999 + m * 1e-3 for f, m in zip(fs, mem_lvls)],
                pp * 0.999 + hs * 1e-3)

    time_loop(ed_step, (feats, psp), "encoder-decoder (4 enc + 2 dec layers)")


if __name__ == "__main__":
    main()
