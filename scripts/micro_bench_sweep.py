#!/usr/bin/env python3
"""Sweep bench.py's batch knobs on hardware: whole-tile fwd bs, slide
window_batch, 512^2 fwd bs, train bs — prints tiles/s for each so the
recorded bench constants can be set to the measured optimum.

Usage: python scripts/micro_bench_sweep.py [section]
  section in {fwd, slide, 512, train, all} (default all)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_emrt")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass

from emrt_tpu.config import get_config
from emrt_tpu.models import get_model
from emrt_tpu.train.state import init_variables


def ondevice_time(step, init, iters=8, reps=3):
    @jax.jit
    def loop(c):
        return jax.lax.fori_loop(0, iters, lambda i, c: step(c), c)

    c = loop(init)
    jax.block_until_ready(c)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        c = loop(init)
        jax.block_until_ready(c)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    section = sys.argv[1] if len(sys.argv) > 1 else "all"
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
    rng = jax.random.key(0, impl="rbg")
    x1 = jnp.asarray(np.random.default_rng(0).uniform(
        -2, 2, (1, 256, 256, 3)).astype(np.float32))
    variables = init_variables(model, rng, x1)

    def fwd(imgs):
        return model.apply(variables, imgs, train=False)[0]

    pick = [int(a) for a in sys.argv[2:]]

    if section in ("fwd", "all"):
        for bs in (pick or (32, 48, 64)):
            x = jnp.asarray(np.random.default_rng(0).uniform(
                -2, 2, (bs, 256, 256, 3)).astype(np.float32))

            def fwd_step(xc):
                out = fwd(xc)
                return xc * 0.999 + out.mean(
                    axis=-1, keepdims=True)[:, :, :, :1] * 1e-3

            dt = ondevice_time(fwd_step, x, iters=24)
            print(f"fwd    bs={bs:3d}  {dt*1e3:7.2f} ms  "
                  f"{bs/dt:7.1f} tiles/s", flush=True)

    if section in ("slide", "all"):
        from emrt_tpu.inference.slide import slide_inference, window_grid
        nw = len(window_grid(1024, 1024, (256, 256), (171, 171)))
        combos = ([tuple(pick)] if len(pick) == 2 else
                  [(2, 32), (2, 36), (2, 64), (4, 36), (4, 48)])
        for slide_bs, wb in combos:
            big = jnp.asarray(np.random.default_rng(1).uniform(
                -2, 2, (slide_bs, 1024, 1024, 3)).astype(np.float32))

            def slide_step(xc):
                logits = slide_inference(fwd, xc, (256, 256), (171, 171),
                                         cfg.DATA.NUM_CLASSES,
                                         window_batch=wb)
                return xc * 0.999 + logits.mean(
                    axis=-1, keepdims=True)[:, :, :, :1] * 1e-3

            dt = ondevice_time(slide_step, big, iters=12)
            print(f"slide  bs={slide_bs} wb={wb:3d}  {dt*1e3:7.2f} ms  "
                  f"{slide_bs*nw/dt:7.1f} tiles/s", flush=True)

    if section in ("512", "all"):
        for bs in (pick or (8, 12, 16)):
            x512 = jnp.asarray(np.random.default_rng(3).uniform(
                -2, 2, (bs, 512, 512, 3)).astype(np.float32))

            def f512_step(xc):
                out = model.apply(variables, xc, train=False)[0]
                return xc * 0.999 + out.mean(
                    axis=-1, keepdims=True)[:, :, :, :1] * 1e-3

            dt = ondevice_time(f512_step, x512, iters=12)
            print(f"512fwd bs={bs:3d}  {dt*1e3:7.2f} ms  "
                  f"{bs/dt:7.1f} img/s", flush=True)

    if section in ("train", "all"):
        from emrt_tpu.losses import get_loss_function
        from emrt_tpu.solver import get_optimizer, get_scheduler
        from emrt_tpu.train import make_train_step
        from emrt_tpu.train.state import TrainState
        schedule = get_scheduler(cfg)
        tx = get_optimizer(cfg, schedule, params=variables["params"])
        train_step = make_train_step(model, get_loss_function(cfg),
                                     donate=False)
        for bs in (pick or (32, 64)):
            batch = {
                "image": jnp.asarray(np.random.default_rng(1).uniform(
                    -2, 2, (bs, 256, 256, 3)).astype(np.float32)),
                "label": jnp.asarray(np.random.default_rng(2).integers(
                    0, 6, (bs, 256, 256)).astype(np.int32)),
            }
            state = TrainState(step=jnp.zeros((), jnp.int32),
                               params=variables["params"],
                               batch_stats=variables.get("batch_stats", {}),
                               opt_state=tx.init(variables["params"]), tx=tx)

            def tstep(s):
                s2, _ = train_step(s, batch, rng)
                return s2

            dt = ondevice_time(tstep, state, iters=6)
            print(f"train  bs={bs:3d}  {dt*1e3:7.2f} ms  "
                  f"{bs/dt:7.1f} tiles/s", flush=True)


if __name__ == "__main__":
    main()
