#!/usr/bin/env python3
"""Capture a device trace of the EMRT forward and aggregate op times."""
from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from emrt_tpu.config import get_config
from emrt_tpu.models import get_model


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

    @jax.jit
    def loop(c):
        def body(i, c):
            out = model.apply(variables, c, train=False)[0]
            return c * 0.999 + out.mean(axis=-1, keepdims=True)[:, :, :, :1] * 1e-3
        return jax.lax.fori_loop(0, 3, body, c)

    y = loop(x)
    jax.block_until_ready(y)

    os.system("rm -rf /tmp/trace")
    with jax.profiler.trace("/tmp/trace"):
        y = loop(x)
        jax.block_until_ready(y)

    files = glob.glob("/tmp/trace/**/*.trace.json.gz", recursive=True)
    print("trace files:", files)
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            name = ev.get("name", "?")
            dur = ev.get("dur", 0) / 1e3  # ms
            agg[name] += dur
            cnt[name] += 1
            total += dur
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
    print(f"total event time {total:.1f} ms (3 iters)")
    for name, ms in top:
        print(f"{ms:9.2f} ms  x{cnt[name]:4d}  {name[:110]}")


if __name__ == "__main__" and len(sys.argv) == 1:
    main()


def module_budget():
    """Join trace event durations with HLO op_name metadata and aggregate
    by module path (usage: profile_trace.py budget)."""
    import re
    from collections import defaultdict

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
    x = jnp.asarray(np.random.default_rng(0).uniform(
        -2, 2, (32, 256, 256, 3)).astype(np.float32))
    variables = jax.jit(lambda r, xx: model.init(r, xx, train=False))(rng, x[:1])

    @jax.jit
    def loop(c):
        def body(i, c):
            out = model.apply(variables, c, train=False)[0]
            return c * 0.999 + out.mean(axis=-1, keepdims=True)[:, :, :, :1] * 1e-3
        return jax.lax.fori_loop(0, 3, body, c)

    # name -> op_name map from compiled HLO
    txt = loop.lower(x).compile().as_text()
    name2op = {}
    for m in re.finditer(r"%([\w.\-]+) = [^\n]*?op_name=\"([^\"]+)\"", txt):
        name2op[m.group(1)] = m.group(2)

    y = loop(x)
    jax.block_until_ready(y)
    os.system("rm -rf /tmp/trace")
    with jax.profiler.trace("/tmp/trace"):
        y = loop(x)
        jax.block_until_ready(y)

    agg = defaultdict(float)
    for f in glob.glob("/tmp/trace/**/*.trace.json.gz", recursive=True):
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            name = ev.get("name", "?")
            op = name2op.get(name)
            if op is None:
                continue
            # group: strip jit prefix, keep 3 path segments
            parts = op.split("/")
            parts = [p for p in parts if p not in (
                "jit(loop)", "while", "body", "closed_call")]
            key = "/".join(parts[:3])
            agg[key] += ev.get("dur", 0) / 1e3 / 3  # per-iter ms
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:30]
    total = sum(agg.values())
    print(f"total mapped {total:.1f} ms/iter")
    for k, ms in top:
        print(f"{ms:8.2f} ms  {k}")


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "budget":
    module_budget()


def train_budget():
    """Module-level budget of the train step (usage: profile_trace.py train)."""
    import re
    from collections import defaultdict

    from emrt_tpu.losses import get_loss_function
    from emrt_tpu.solver import get_optimizer, get_scheduler
    from emrt_tpu.train import make_train_step
    from emrt_tpu.train.state import TrainState, init_variables

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
    rng = jax.random.key(0)
    bs = 8
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
    os.system("rm -rf /tmp/trace")
    with jax.profiler.trace("/tmp/trace"):
        s = loop(state)
        jax.block_until_ready(s.params)

    agg = defaultdict(float)
    for f in glob.glob("/tmp/trace/**/*.trace.json.gz", recursive=True):
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            op = name2op.get(ev.get("name", "?"))
            if op is None:
                continue
            parts = [p for p in op.split("/") if p not in (
                "jit(loop)", "while", "body", "closed_call")]
            # separate fwd vs bwd via transpose marker
            tag = "bwd" if any("transpose" in p or p == "jvp" for p in parts[:2]) else "fwd"
            core = [p for p in parts if not p.startswith(("transpose", "jvp"))]
            key = tag + " " + "/".join(core[:3])
            agg[key] += ev.get("dur", 0) / 1e3 / 3
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:30]
    print(f"total mapped {sum(agg.values()):.1f} ms/iter")
    for k, ms in top:
        print(f"{ms:8.2f} ms  {k}")


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "train":
    train_budget()
