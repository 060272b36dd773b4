#!/usr/bin/env python3
"""Benchmark: 256x256 tiles/sec/chip on the flagship EMRT model.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
North star (BASELINE.json): >=5k tiles/sec sliding-window inference on
v5e-8, i.e. 625 tiles/sec/chip — vs_baseline measures against that
per-chip target. Reports BOTH the whole-tile forward path and the actual
north-star path (sliding-window inference with the sum/count stitch,
crop 256 / stride 171 over 1024^2 tiles — reference src/api/infer.py:22-80),
plus train-step throughput.

Timing: the iteration loop runs ON DEVICE (lax.fori_loop inside one jit,
each iteration's input derived from the previous output) — host-side
dispatch loops mis-report badly through remote/tunneled backends, and a
bitwise no-op chain can be deduplicated (see the verify skill).
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache: first-compile of the fused kernels through
# the remote helper can take minutes; later bench invocations reuse it
try:
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_emrt")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass

BASELINE_TILES_PER_SEC_PER_CHIP = 625.0  # 5000 / 8 chips (BASELINE.json target)


def _ondevice_time(step, init, iters=8, reps=3):
    """Best wall time per iteration of an on-device chained fori_loop."""
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
    from emrt_tpu.config import get_config
    from emrt_tpu.inference.slide import slide_inference
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
    rng = jax.random.key(0, impl="rbg")  # production train rng (train.py:91)

    # ---- inference: whole-tile forward, chained on device ----
    infer_bs = 32
    x = jnp.asarray(np.random.default_rng(0).uniform(
        -2, 2, (infer_bs, 256, 256, 3)).astype(np.float32))
    variables = init_variables(model, rng, x[:1])

    def fwd(imgs):
        return model.apply(variables, imgs, train=False)[0]

    def fwd_step(xc):
        out = fwd(xc)
        return xc * 0.999 + out.mean(axis=-1, keepdims=True)[:, :, :, :1] * 1e-3

    print('bench: whole-tile fwd...', file=sys.stderr)
    dt = _ondevice_time(fwd_step, x, iters=24)
    infer_ips = infer_bs / dt

    # ---- north-star path: sliding-window inference over 1024^2 tiles ----
    # crop 256 / stride 171 (BASELINE.json metric counts 256^2-tile model
    # invocations, i.e. windows: 6x6 = 36 per 1024^2 image).
    from emrt_tpu.inference.slide import window_grid
    slide_bs = 2
    big = jnp.asarray(np.random.default_rng(1).uniform(
        -2, 2, (slide_bs, 1024, 1024, 3)).astype(np.float32))
    n_windows = len(window_grid(1024, 1024, (256, 256), (171, 171)))

    def slide_step(xc):
        logits = slide_inference(fwd, xc, (256, 256), (171, 171),
                                 cfg.DATA.NUM_CLASSES, window_batch=32)
        return xc * 0.999 + logits.mean(axis=-1, keepdims=True)[:, :, :, :1] * 1e-3

    print('bench: slide path...', file=sys.stderr)
    dt = _ondevice_time(slide_step, big, iters=12)
    slide_ips = slide_bs * n_windows / dt

    # ---- training: chained step ----
    # bs sweep (this chip): 8 -> 115.1, 16 -> 124.0, 32 -> 126.6 tiles/s;
    # the step is deformable-backward bound (see README perf notes), so
    # throughput saturates once per-call fixed costs amortize
    train_bs = 32
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

    def tstep(s):
        s2, _ = train_step(s, batch, rng)
        return s2

    print('bench: train step...', file=sys.stderr)
    dt = _ondevice_time(tstep, state)
    train_ips = train_bs / dt

    # ---- 512^2 EMRT forward (lv=5376): must ride the level-partitioned
    # Pallas path, not the jnp fallback (round-2 verdict item 3).
    # bs sweep on this chip (r05): bs8 -> 99.8, bs16 -> 100.4 img/s ----
    big_bs = 16
    x512 = jnp.asarray(np.random.default_rng(3).uniform(
        -2, 2, (big_bs, 512, 512, 3)).astype(np.float32))
    v512 = init_variables(model, rng, x512[:1])

    def fwd512_step(xc):
        out = model.apply(v512, xc, train=False)[0]
        return xc * 0.999 + out.mean(axis=-1, keepdims=True)[:, :, :, :1] * 1e-3

    print('bench: 512^2 fwd...', file=sys.stderr)
    dt = _ondevice_time(fwd512_step, x512, iters=12)
    infer512_ips = big_bs / dt

    value = round(slide_ips, 1)
    print(json.dumps({
        "metric": "EMRT-r50 sliding-window inference tiles/sec/chip "
                  "(crop 256, stride 171, 1024^2 images)",
        "value": value,
        "unit": "tiles/sec/chip",
        "vs_baseline": round(value / BASELINE_TILES_PER_SEC_PER_CHIP, 3),
        "whole_tile_forward_tiles_per_sec_per_chip": round(infer_ips, 1),
        "train_tiles_per_sec_per_chip": round(train_ips, 1),
        "emrt512_forward_images_per_sec_per_chip": round(infer512_ips, 1),
        "infer_batch": infer_bs,
        "slide_batch": slide_bs,
        "train_batch": train_bs,
    }))


if __name__ == "__main__":
    main()
