#!/usr/bin/env python3
"""Fine-grained per-segment attribution of the EMRT inference forward.

Same methodology as profile_train_tail.py (trace events joined with HLO
op_name metadata), but for the whole-tile forward — the flagship slide
path is >99% forward (BENCH_r04: 673.5 slide vs 675.8 whole-tile), so
this is the attribution for the north-star number too.

Usage: python scripts/profile_fwd_tail.py [bs] [size]
  default bs=32 size=256 (the bench whole-tile shape);
  bs=8 size=512 profiles the level-partitioned big-raster path.
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from emrt_tpu.config import get_config
from emrt_tpu.models import get_model
from emrt_tpu.train.state import init_variables

try:
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_emrt")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    cfg = get_config()
    cfg.DATA.DATASET = "Synthetic"
    cfg.DATA.NUM_CLASSES = 6
    cfg.DATA.CROP_SIZE = (size, size)
    cfg.MODEL.NAME = "EMRT"
    cfg.MODEL.ENCODER.TYPE = "resnet50"
    cfg.MODEL.OUTPUT_STRIDE = 32
    cfg.TRAIN.DTYPE = "bfloat16"
    model = get_model(cfg)
    rng = jax.random.key(0, impl="rbg")
    x = jnp.asarray(np.random.default_rng(0).uniform(
        -2, 2, (bs, size, size, 3)).astype(np.float32))
    variables = init_variables(model, rng, x[:1])

    @jax.jit
    def loop(c):
        def body(i, c):
            out = model.apply(variables, c, train=False)[0]
            return c * 0.999 + out.mean(axis=-1, keepdims=True)[:, :, :, :1] * 1e-3
        return jax.lax.fori_loop(0, 3, body, c)

    txt = loop.lower(x).compile().as_text()
    name2op = {}
    for m in re.finditer(r"%([\w.\-]+) = [^\n]*?op_name=\"([^\"]+)\"", txt):
        name2op[m.group(1)] = m.group(2)

    y = loop(x)
    jax.block_until_ready(y)
    os.system("rm -rf /tmp/trace_fwd")
    with jax.profiler.trace("/tmp/trace_fwd"):
        y = loop(x)
        jax.block_until_ready(y)

    agg = defaultdict(float)
    unmapped = defaultdict(float)
    total = 0.0
    for f in glob.glob("/tmp/trace_fwd/**/*.trace.json.gz", recursive=True):
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            nm = ev.get("name", "?")
            dur = ev.get("dur", 0) / 1e3 / 3
            op = name2op.get(nm)
            total += dur
            if op is None:
                unmapped[nm] += dur
                continue
            parts = [p for p in op.split("/") if p not in (
                "jit(loop)", "while", "body", "closed_call")]
            key = "/".join(parts[:5])
            agg[key] += dur
    print(f"bs={bs} size={size}  total {total:.1f} ms/iter "
          f"({bs / total * 1e3:.1f} img/s)  ({len(agg)} mapped groups)")
    for k, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:60]:
        print(f"{ms:8.2f} ms  {k}")
    rollup = defaultdict(float)
    for k, ms in agg.items():
        if not k.strip():
            continue
        top = k.split("/")[0]
        if "pallas" in k:
            top = "deformable_kernel"
        rollup[top] += ms
    print("--- subsystem rollup (all mapped groups) ---")
    for k, ms in sorted(rollup.items(), key=lambda kv: -kv[1]):
        if ms >= 0.2:
            print(f"{ms:8.2f} ms  {k}")
    print("--- top unmapped events ---")
    for k, ms in sorted(unmapped.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{ms:8.2f} ms  {k[:120]}")


if __name__ == "__main__":
    main()
