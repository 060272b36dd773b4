#!/usr/bin/env python3
"""Training CLI (reference contract: semantic_segmentation/train.py).

Usage: python3 train.py --config configs/EMRT/EMRT_256x256_160k_potsdam.yaml [--seed 0]

TPU-native training loop: jitted+donated train step over a data-parallel
jax.sharding mesh, prefetching host pipeline, windowed loss/ips logging,
periodic in-training eval with best-mIoU tracking, keep-K checkpoint
rotation, and real resume (--resume).
"""
from __future__ import annotations

import argparse
import random

import jax
import jax.numpy as jnp
import numpy as np

from emrt_tpu.config import get_config, update_config
from emrt_tpu.data import DataLoader, get_dataset, get_transforms
from emrt_tpu.inference import build_val_transforms, evaluate
from emrt_tpu.losses import get_loss_function
from emrt_tpu.models import get_model
from emrt_tpu.parallel import batch_sharding, create_mesh
from emrt_tpu.solver import get_optimizer, get_scheduler
from emrt_tpu.train import create_train_state, make_forward, make_train_step, num_params
from emrt_tpu.utils import TimeAverager, Timer, calculate_eta, logger
from emrt_tpu.utils.checkpoint import CheckpointManager


def parse_args():
    parser = argparse.ArgumentParser("EMRT-TPU training")
    parser.add_argument("--config", dest="cfg", type=str, required=True)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--resume", action="store_true",
                        help="resume from the latest checkpoint in SAVE_DIR")
    parser.add_argument("--iters", type=int, default=None,
                        help="override TRAIN.ITERS (smoke runs)")
    parser.add_argument("opts", nargs="*", help="KEY VALUE config overrides")
    return parser.parse_args()


def main():
    args = parse_args()
    config = update_config(get_config(), args)
    if args.seed is not None:
        config.SEED = args.seed
    if args.iters is not None:
        config.TRAIN.ITERS = args.iters

    random.seed(config.SEED)
    np.random.seed(config.SEED)

    mesh = create_mesh(config.PARALLEL.DATA, config.PARALLEL.MODEL,
                       config.PARALLEL.SPATIAL)
    n_data = mesh.shape["data"]
    logger.info(f"devices: {jax.device_count()} mesh: data={n_data} "
                f"model={mesh.shape['model']} "
                f"spatial={mesh.shape['spatial']}")

    # model + solver
    model = get_model(config)
    schedule = get_scheduler(config)
    loss_fn = get_loss_function(config)

    # data
    transforms = get_transforms(config)
    train_dataset = get_dataset(config, transforms, mode="train")
    val_dataset = get_dataset(config, build_val_transforms(config), mode="val")
    global_batch = config.DATA.BATCH_SIZE * n_data
    if mesh.shape["spatial"] > 1:
        # PARALLEL.SPATIAL > 1: image H additionally shards over 'spatial' —
        # GSPMD partitions the convs with halo exchanges (big-crop training)
        from emrt_tpu.parallel import spatial_batch_sharding
        sharding = spatial_batch_sharding(mesh)
    else:
        sharding = batch_sharding(mesh)
    # each process loads only its 1/process_count slice of the global batch
    # (the sampler already shards indices per host; the loader assembles the
    # global array from process-local shards)
    assert global_batch % jax.process_count() == 0, \
        f"global batch {global_batch} not divisible by " \
        f"{jax.process_count()} processes"
    host_batch = global_batch // jax.process_count()
    loader = DataLoader(train_dataset, host_batch,
                        iterations=config.TRAIN.ITERS, seed=config.SEED,
                        num_workers=config.DATA.NUM_WORKERS,
                        sharding=sharding)
    logger.info(f"train samples: {len(train_dataset)} "
                f"val samples: {len(val_dataset)} "
                f"global batch: {global_batch}")

    # init state (replicated over mesh)
    ch, cw = config.DATA.CROP_SIZE
    sample = {"image": jnp.zeros((global_batch, ch, cw, 3), jnp.float32)}
    # 'rbg' keys (the TRAIN.RNG_IMPL default) route dropout-mask generation
    # through the TPU's hardware RngBitGenerator: the threefry masks cost
    # ~20 ms/step at bs32 (8 dropout sites over up-to-44M-element
    # activations); rbg recovers ~15 ms with identical dropout semantics
    # (measured 237.4 -> 221.9 ms/step, scripts/profile_train_tail.py round
    # 4). Set TRAIN.RNG_IMPL threefry2x32 for bitwise-reproducible runs.
    init_rng, rng = jax.random.split(
        jax.random.key(config.SEED, impl=config.TRAIN.RNG_IMPL))
    from emrt_tpu.train.state import init_variables
    variables = init_variables(model, init_rng, sample["image"])
    params = variables["params"]
    batch_stats0 = variables.get("batch_stats", {})
    if config.MODEL.PRETRAINED:
        # reference loads pretrained weights at model build
        # (src/models/__init__.py:29, checkpoint.py:38-93); orbax dirs do a
        # shape-checked partial load, .pdparams convert through the key map
        from emrt_tpu.utils.checkpoint import load_weights_auto
        params, batch_stats0 = load_weights_auto(
            config.MODEL.PRETRAINED, params, batch_stats0,
            config.MODEL.NAME, config.MODEL.ENCODER.TYPE, partial=True)
        logger.info(f"initialized from MODEL.PRETRAINED: "
                    f"{config.MODEL.PRETRAINED}")
    if mesh.shape["model"] > 1:
        # PARALLEL.MODEL > 1: Megatron-style tensor parallelism — the
        # transformer projections shard over the 'model' axis and GSPMD
        # inserts the collectives; optimizer state follows the params
        from emrt_tpu.parallel import tp_shard_params
        params = tp_shard_params(params, mesh)
        logger.info(f"tensor parallelism: model axis = {mesh.shape['model']}")
    tx = get_optimizer(config, schedule, params=params,
                       decoder_lr_coef=config.TRAIN.DECODER_LR_COEF,
                       decoder_prefixes=getattr(model, "decoder_lr_prefixes", ()))
    from emrt_tpu.train.state import TrainState
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=params,
                       batch_stats=batch_stats0,
                       opt_state=tx.init(params), tx=tx)
    logger.info(f"model params: {num_params(state.params) / 1e6:.2f}M")

    ckpt = CheckpointManager(config.SAVE_DIR, config.KEEP_CHECKPOINT_MAX)
    start_iter = 0
    if args.resume:
        state, start_iter = ckpt.restore(state)
        loader.start_iter = start_iter

    if jax.process_count() > 1:
        # multi-host: state must be an explicit global (replicated) array —
        # jit cannot auto-replicate process-local arrays across hosts
        from emrt_tpu.parallel import replicated
        state = jax.device_put(state, replicated(mesh))

    train_step = make_train_step(model, loss_fn, donate=config.TRAIN.DONATE)
    # multi-host eval runs replicated per host (every process computes the
    # identical full confusion matrix on its local device); the sharded
    # in-graph psum path is single-process-per-mesh only
    eval_mesh = mesh if (n_data > 1 and jax.process_count() == 1) else None
    forward = make_forward(model, eval_mesh)

    def eval_forward(images, params, batch_stats):
        # params/batch_stats flow as fwd_args so the cached big-raster
        # slide program never bakes them in as constants
        return forward(params, batch_stats, images)

    batch_cost = TimeAverager()
    reader_cost = TimeAverager()
    timer = Timer()
    it = start_iter
    window_losses = []   # device scalars; averaged lazily at log time
    for batch in loader:
        reader_cost.record(timer.restart())
        it += 1
        state, metrics = train_step(state, batch, rng)
        window_losses.append(metrics["loss"])
        if it % config.LOGGING_INFO_FREQ == 0 or it == config.TRAIN.ITERS:
            jax.block_until_ready(metrics["loss"])
        batch_cost.record(timer.restart(), num_samples=global_batch)

        if it % config.LOGGING_INFO_FREQ == 0:
            lr = float(schedule(jnp.asarray(it)))
            ips = batch_cost.get_ips_average()
            eta = calculate_eta(config.TRAIN.ITERS - it, batch_cost.get_average())
            # windowed-average loss, like the reference (train.py:170-185)
            avg_loss = float(jnp.mean(jnp.stack(window_losses)))
            window_losses = []
            logger.info(
                f"[TRAIN] iter {it}/{config.TRAIN.ITERS} "
                f"loss: {avg_loss:.4f} lr: {lr:.6f} "
                f"batch_cost: {batch_cost.get_average():.4f}s "
                f"reader_cost: {reader_cost.get_average():.4f}s "
                f"ips: {ips:.1f} ETA {eta}")
            batch_cost.reset()
            reader_cost.reset()

        if it % config.SAVE_FREQ_CHECKPOINT == 0 or it == config.TRAIN.ITERS:
            ckpt.save(it, state)
        if it % config.VALIDATE_FREQ == 0 or it == config.TRAIN.ITERS:
            result = evaluate(eval_forward, val_dataset, config,
                              mesh=eval_mesh,
                              fwd_args=(state.params, state.batch_stats))
            ckpt.save_best(state, result["miou"])

    # final FLOPs/params report (reference train.py:239-260)
    from emrt_tpu.utils.flops import format_cost, forward_cost
    cost = forward_cost(model, {"params": state.params,
                                "batch_stats": state.batch_stats},
                        (1, ch, cw, 3))
    logger.info(f"model cost: {format_cost(cost)}")
    logger.info(f"training done; best mIoU {ckpt.best_miou:.4f}")


if __name__ == "__main__":
    main()
