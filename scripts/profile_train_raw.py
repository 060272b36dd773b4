#!/usr/bin/env python3
"""Raw per-op trace dump of the train step: full op_name paths, no
3-segment grouping (attribution for the big 'fwd' bucket)."""
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


def main(bs=8):
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
    cnt = defaultdict(int)
    for f in glob.glob("/tmp/trace/**/*.trace.json.gz", recursive=True):
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            name = ev.get("name", "?")
            op = name2op.get(name, f"<unmapped:{name}>")
            agg[op] += ev.get("dur", 0) / 1e3 / 3
            cnt[op] += 1
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:50]
    total = sum(agg.values())
    print(f"total {total:.1f} ms/iter")
    for k, ms in top:
        print(f"{ms:8.2f} ms x{cnt[k]:3d}  {k[:150]}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
