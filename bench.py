#!/usr/bin/env python3
"""Benchmark: 256x256 tiles/sec/chip on the flagship EMRT model.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
North star (BASELINE.json): >=5k tiles/sec sliding-window inference on
v5e-8, i.e. 625 tiles/sec/chip — vs_baseline is measured against that
per-chip target. Also reports train-step throughput in extra fields.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_TILES_PER_SEC_PER_CHIP = 625.0  # 5000 / 8 chips (BASELINE.json target)


def _timeit(fn, *args, warmup=3, iters=10):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from emrt_tpu.config import get_config
    from emrt_tpu.losses import get_loss_function
    from emrt_tpu.models import get_model
    from emrt_tpu.solver import get_optimizer, get_scheduler
    from emrt_tpu.train import make_train_step
    from emrt_tpu.train.state import TrainState

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

    infer_bs = 32
    x_inf = jnp.asarray(np.random.default_rng(0).uniform(
        -2, 2, (infer_bs, 256, 256, 3)).astype(np.float32))
    from emrt_tpu.train.state import init_variables
    variables = init_variables(model, rng, x_inf[:1])

    @jax.jit
    def forward(images):
        out = model.apply(variables, images, train=False)
        return out[0]

    t_inf = _timeit(forward, x_inf)
    infer_ips = infer_bs / t_inf

    # train step
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

    def step_fn(s, b):
        s2, m = train_step(s, b, rng)
        return m["loss"]

    t_train = _timeit(step_fn, state, batch, warmup=3, iters=10)
    train_ips = train_bs / t_train

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
