#!/usr/bin/env python3
"""Benchmark: 256x256 tiles/sec/chip on the flagship EMRT model.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
North star (BASELINE.json): >=5k tiles/sec sliding-window inference on
v5e-8, i.e. 625 tiles/sec/chip — vs_baseline measures against that
per-chip target. Also reports train-step throughput.

Timing note: each iteration's input depends on the previous output
(a chained scalar), forcing serial execution — plain dispatch loops
over-report on asynchronous remote backends.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_TILES_PER_SEC_PER_CHIP = 625.0  # 5000 / 8 chips (BASELINE.json target)


def main():
    from emrt_tpu.config import get_config
    from emrt_tpu.losses import get_loss_function
    from emrt_tpu.models import get_model
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

    # ---- inference: chained forward ----
    infer_bs = 32
    x = jnp.asarray(np.random.default_rng(0).uniform(
        -2, 2, (infer_bs, 256, 256, 3)).astype(np.float32))
    variables = init_variables(model, rng, x[:1])

    @jax.jit
    def forward_chained(x):
        out = model.apply(variables, x, train=False)[0]
        return x + out.mean().astype(x.dtype) * 1e-9

    y = forward_chained(x)
    y.block_until_ready()
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        y = forward_chained(y)
    y.block_until_ready()
    infer_ips = infer_bs * iters / (time.perf_counter() - t0)

    # ---- training: chained step ----
    train_bs = 8
    batch = {
        "image": jnp.asarray(np.random.default_rng(1).uniform(
            -2, 2, (train_bs, 256, 256, 3)).astype(np.float32)),
        "label": jnp.asarray(np.random.default_rng(2).integers(
            0, 6, (train_bs, 256, 256)).astype(np.int32)),
    }
    schedule = get_scheduler(cfg)
    tx = get_optimizer(cfg, schedule, params=variables["params"])
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]), tx=tx)
    train_step = make_train_step(model, get_loss_function(cfg), donate=False)

    state, m = train_step(state, batch, rng)   # state chains across steps
    jax.block_until_ready(m["loss"])
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = train_step(state, batch, rng)
    jax.block_until_ready(m["loss"])
    train_ips = train_bs * iters / (time.perf_counter() - t0)

    value = round(infer_ips, 1)
    print(json.dumps({
        "metric": "EMRT-r50 256x256 inference tiles/sec/chip",
        "value": value,
        "unit": "tiles/sec/chip",
        "vs_baseline": round(value / BASELINE_TILES_PER_SEC_PER_CHIP, 3),
        "train_tiles_per_sec_per_chip": round(train_ips, 1),
        "infer_batch": infer_bs,
        "train_batch": train_bs,
    }))


if __name__ == "__main__":
    main()
