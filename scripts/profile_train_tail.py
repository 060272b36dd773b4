#!/usr/bin/env python3
"""Fine-grained decomposition of the train step's non-kernel tail.

profile_trace.py train groups by 3 path segments, which lumps transposes,
loss, optimizer, and resize matmuls into one bucket. This variant keeps
more segments and also reports the top UNMAPPED fusion names so nothing
hides. Usage: python scripts/profile_train_tail.py [bs]
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
from emrt_tpu.losses import get_loss_function
from emrt_tpu.solver import get_optimizer, get_scheduler
from emrt_tpu.train import make_train_step
from emrt_tpu.train.state import TrainState, init_variables

try:
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_emrt")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    cfg = get_config()
    cfg.DATA.DATASET = "Synthetic"
    cfg.DATA.NUM_CLASSES = 6
    cfg.DATA.CROP_SIZE = (256, 256)
    cfg.MODEL.NAME = "EMRT"
    cfg.MODEL.ENCODER.TYPE = "resnet50"
    cfg.MODEL.OUTPUT_STRIDE = 32
    cfg.TRAIN.OPTIMIZER.GRAD_CLIP = 1.0
    cfg.TRAIN.OPTIMIZER.WEIGHT_DECAY = 1e-4
    cfg.TRAIN.DTYPE = "bfloat16"
    model = get_model(cfg)
    # match train.py:96 — production uses hardware-RNG keys for dropout
    rng = jax.random.key(0, impl="rbg")
    batch = {
        "image": jnp.asarray(np.random.default_rng(1).uniform(
            -2, 2, (bs, 256, 256, 3)).astype(np.float32)),
        "label": jnp.asarray(np.random.default_rng(2).integers(
            0, 6, (bs, 256, 256)).astype(np.int32)),
    }
    variables = init_variables(model, rng, batch["image"][:1])
    schedule = get_scheduler(cfg)
    tx = get_optimizer(cfg, schedule, params=variables["params"])
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]), tx=tx)
    train_step = make_train_step(model, get_loss_function(cfg), donate=False)

    @jax.jit
    def loop(s):
        def body(i, s):
            s2, _ = train_step(s, batch, rng)
            return s2
        return jax.lax.fori_loop(0, 3, body, s)

    txt = loop.lower(state).compile().as_text()
    name2op = {}
    for m in re.finditer(r"%([\w.\-]+) = [^\n]*?op_name=\"([^\"]+)\"", txt):
        name2op[m.group(1)] = m.group(2)

    s = loop(state)
    jax.block_until_ready(s.params)
    os.system("rm -rf /tmp/trace_tail")
    with jax.profiler.trace("/tmp/trace_tail"):
        s = loop(state)
        jax.block_until_ready(s.params)

    agg = defaultdict(float)
    unmapped = defaultdict(float)
    total = 0.0
    for f in glob.glob("/tmp/trace_tail/**/*.trace.json.gz", recursive=True):
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
            tag = "bwd" if any("transpose" in p or p == "jvp"
                               for p in parts[:2]) else "fwd"
            core = [p for p in parts if not p.startswith(("transpose", "jvp"))]
            key = tag + " " + "/".join(core[:5])
            agg[key] += dur
    print(f"total {total:.1f} ms/iter ({len(agg)} mapped groups)")
    for k, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:60]:
        print(f"{ms:8.2f} ms  {k}")
    # coarse subsystem rollup over ALL mapped groups (the whole-program
    # event maps to an empty core path — drop it, it double-counts)
    rollup = defaultdict(float)
    for k, ms in agg.items():
        tag, _, path = k.partition(" ")
        if not path.strip():
            continue
        top = path.split("/")[1] if path.startswith("jit(train_step)/") \
            else path.split("/")[0]
        if "self_attn" in path and "pallas" in path:
            top = "deformable_kernel"
        elif "cross_attn" in path and "pallas" in path:
            top = "deformable_kernel"
        rollup[f"{tag} {top}"] += ms
    print("--- subsystem rollup (all mapped groups) ---")
    for k, ms in sorted(rollup.items(), key=lambda kv: -kv[1]):
        if ms >= 0.3:
            print(f"{ms:8.2f} ms  {k}")
    print("--- top unmapped events ---")
    for k, ms in sorted(unmapped.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{ms:8.2f} ms  {k[:120]}")


if __name__ == "__main__":
    main()
