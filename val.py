#!/usr/bin/env python3
"""Standalone evaluation CLI (reference contract: semantic_segmentation/val.py).

Usage: python3 val.py --config <yaml> --model_path <best_model dir>
       [--multi_scales] [KEY VALUE ...]
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from emrt_tpu.config import get_config, update_config
from emrt_tpu.data import get_dataset
from emrt_tpu.inference import build_val_transforms, evaluate
from emrt_tpu.models import get_model
from emrt_tpu.train import make_forward, num_params
from emrt_tpu.utils import logger
from emrt_tpu.utils.checkpoint import load_weights_auto


def parse_args():
    parser = argparse.ArgumentParser("EMRT-TPU evaluation")
    parser.add_argument("--config", dest="cfg", type=str, required=True)
    parser.add_argument("--model_path", type=str, default=None,
                        help="best_model-style checkpoint dir")
    parser.add_argument("--multi_scales", action="store_true")
    parser.add_argument("opts", nargs="*")
    return parser.parse_args()


def main():
    args = parse_args()
    config = update_config(get_config(), args)

    model = get_model(config)
    size = config.VAL.IMAGE_BASE_SIZE or config.DATA.CROP_SIZE[0]
    if isinstance(size, int):
        size = (size, size)
    sample = jnp.zeros((1,) + tuple(size) + (3,), jnp.float32)
    from emrt_tpu.train.state import init_variables
    variables = init_variables(model, jax.random.key(0), sample)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    if args.model_path:
        # orbax dir or a reference .pdparams (auto-converted) — the
        # parity-eval path for the released EMRT checkpoints
        params, batch_stats = load_weights_auto(
            args.model_path, params, batch_stats,
            config.MODEL.NAME, config.MODEL.ENCODER.TYPE)
        logger.info(f"loaded weights from {args.model_path}")
    logger.info(f"model params: {num_params(params) / 1e6:.2f}M")

    mesh = None
    if jax.device_count() > 1:
        from emrt_tpu.parallel import create_mesh
        mesh = create_mesh(config.PARALLEL.DATA, config.PARALLEL.MODEL,
                           config.PARALLEL.SPATIAL)
        logger.info(f"eval mesh: data={mesh.shape['data']} "
                    f"model={mesh.shape['model']} "
                    f"spatial={mesh.shape['spatial']}")
    forward_fn = make_forward(model, mesh)

    def forward(images, p, bs):
        return forward_fn(p, bs, images)

    dataset = get_dataset(config, build_val_transforms(config), mode="val")
    result = evaluate(forward, dataset, config,
                      multi_scales=args.multi_scales or config.VAL.MULTI_SCALES_VAL,
                      mesh=mesh, fwd_args=(params, batch_stats))
    # paper-style per-class table (the accuracy-gate artifact: per-class
    # IoU / Precision / Recall / F1 + OA / mIoU / Kappa / mF1, matching the
    # reference's reported quantities, val.py:197-209)
    header = f"{'class':>8} {'IoU':>8} {'Prec':>8} {'Recall':>8} {'F1':>8}"
    logger.info(header)
    for c in range(config.DATA.NUM_CLASSES):
        logger.info(f"{c:>8d} {result['class_iou'][c]:>8.4f} "
                    f"{result['class_precision'][c]:>8.4f} "
                    f"{result['class_recall'][c]:>8.4f} "
                    f"{result['class_f1'][c]:>8.4f}")
    logger.info(f"final mIoU: {result['miou']:.4f} Acc: {result['acc']:.4f} "
                f"Kappa: {result['kappa']:.4f} mF1: {result['mf1']:.4f}")
    # FLOPs / params (reference val.py:211-230, via XLA cost analysis)
    from emrt_tpu.utils.flops import format_cost, forward_cost
    cost = forward_cost(model, {"params": params, "batch_stats": batch_stats},
                        (1,) + tuple(size) + (3,))
    logger.info(f"model cost: {format_cost(cost)}")
    return result


if __name__ == "__main__":
    main()
