#!/usr/bin/env python3
"""Prediction CLI (reference contract: semantic_segmentation/predict.py).

Whole-image direct forward (no sliding window — the model is fully
convolutional, reference predict.py:159-166), softmax+argmax, palette
colorization, PNG dump.

Usage: python3 predict.py --config <yaml> --model_path <ckpt dir>
       [--out_dir preds] [--overlay]
"""
from __future__ import annotations

import argparse
import os

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from emrt_tpu.config import get_config, update_config
from emrt_tpu.data import get_dataset
from emrt_tpu.inference import build_val_transforms
from emrt_tpu.models import get_model
from emrt_tpu.train.step import make_predict_step
from emrt_tpu.utils import logger
from emrt_tpu.utils.checkpoint import load_weights_auto
from emrt_tpu.utils.vis import colorize, get_palette, overlay


def parse_args():
    parser = argparse.ArgumentParser("EMRT-TPU prediction")
    parser.add_argument("--config", dest="cfg", type=str, required=True)
    parser.add_argument("--model_path", type=str, default=None)
    parser.add_argument("--out_dir", type=str, default="./preds")
    parser.add_argument("--overlay", action="store_true")
    parser.add_argument("opts", nargs="*")
    return parser.parse_args()


def main():
    args = parse_args()
    config = update_config(get_config(), args)
    os.makedirs(args.out_dir, exist_ok=True)

    model = get_model(config)
    size = config.VAL.IMAGE_BASE_SIZE or config.DATA.CROP_SIZE[0]
    if isinstance(size, int):
        size = (size, size)
    sample = jnp.zeros((1,) + tuple(size) + (3,), jnp.float32)
    from emrt_tpu.train.state import init_variables
    variables = init_variables(model, jax.random.key(0), sample)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    if args.model_path:
        params, batch_stats = load_weights_auto(
            args.model_path, params, batch_stats,
            config.MODEL.NAME, config.MODEL.ENCODER.TYPE)

    predict_step = make_predict_step(model)
    palette = get_palette(config.DATA.DATASET)
    dataset = get_dataset(config, build_val_transforms(config), mode="test")

    bs = max(1, config.DATA.BATCH_SIZE_VAL)
    items = [dataset.get(i) for i in range(len(dataset))]
    for start in range(0, len(items), bs):
        chunk = items[start:start + bs]
        imgs = [it[0] for it in chunk]
        batch = np.stack(imgs + [imgs[-1]] * (bs - len(imgs)))  # pad tail
        preds = np.asarray(predict_step(params, batch_stats,
                                        jnp.asarray(batch)))
        for j, item in enumerate(chunk):
            i = start + j
            name = (os.path.splitext(os.path.basename(item[1]))[0]
                    if isinstance(item[1], str) else f"{i:06d}")
            color = colorize(preds[j], palette)
            out = overlay(item[0], color) if args.overlay else color
            cv2.imwrite(os.path.join(args.out_dir, f"{name}.png"),
                        cv2.cvtColor(out, cv2.COLOR_RGB2BGR))
        if (start + bs) % 64 < bs:
            logger.info(f"predicted {min(start + bs, len(items))}/{len(items)}")
    logger.info(f"wrote {len(items)} predictions to {args.out_dir}")


if __name__ == "__main__":
    main()
