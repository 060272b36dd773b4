"""Validation loop: sliding-window eval + streaming confusion metrics.

Equivalent of the reference's evaluate() (val_in_train.py:19-125) and the
val.py body: per-batch ss/ms inference, per-image confusion areas, final
mIoU/Acc/Kappa/F1. TPU-first: batches are padded to a fixed shape (padded
images get all-ignore labels so they contribute nothing), predictions and
confusion areas stay on device, and only int64 area counts cross to host.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import val_batches
from ..utils.logger import logger
from ..utils.metrics import MetricAccumulator, confusion_matrix
from .slide import ms_inference, ss_inference


def build_val_transforms(config):
    from ..data.transforms import Normalize, Resize
    tfms = []
    if config.VAL.IMAGE_BASE_SIZE:
        size = config.VAL.IMAGE_BASE_SIZE
        if isinstance(size, int):
            size = (size, size)
        tfms.append(Resize(target_size=tuple(size),
                           keep_ori_size=config.VAL.KEEP_ORI_SIZE))
    tfms.append(Normalize(mean=config.VAL.MEAN, std=config.VAL.STD))
    return tfms


def evaluate(forward, dataset, config, multi_scales: bool = False,
             window_batch: int | None = None):
    """forward: images [n,h,w,3] -> main logits [n,h,w,C] (jitted)."""
    num_classes = config.DATA.NUM_CLASSES
    ignore_index = config.TRAIN.IGNORE_INDEX
    batch_size = config.DATA.BATCH_SIZE_VAL
    crop_size = tuple(config.VAL.CROP_SIZE)
    stride_size = tuple(config.VAL.STRIDE_SIZE)
    acc = MetricAccumulator(num_classes, ignore_index)

    cm_fn = jax.jit(lambda p, l: confusion_matrix(p, l, num_classes, ignore_index))

    start = time.time()
    n_img = 0
    for batch in val_batches(dataset, batch_size):
        imgs = [b[0] for b in batch]
        labels = [b[1] for b in batch]
        n_real = len(imgs)
        # pad to the fixed batch size with copies (all-ignore labels)
        while len(imgs) < batch_size:
            imgs.append(imgs[-1])
            labels.append(np.full_like(labels[-1], ignore_index))
        img_batch = jnp.asarray(np.stack(imgs))
        ori_shape = labels[0].shape[-2:]
        if multi_scales:
            pred = ms_inference(forward, img_batch, ori_shape, True,
                                config.VAL.IMAGE_BASE_SIZE, stride_size,
                                crop_size, num_classes,
                                scales=config.VAL.SCALE_RATIOS,
                                flip_horizontal=True,
                                window_batch=window_batch)
        else:
            pred = ss_inference(forward, img_batch, ori_shape, True,
                                config.VAL.IMAGE_BASE_SIZE, stride_size,
                                crop_size, num_classes,
                                rescale_from_ori=config.VAL.RESCALE_FROM_ORI,
                                window_batch=window_batch)
        label_batch = jnp.asarray(np.stack(labels).reshape(pred.shape))
        cm = cm_fn(pred, label_batch)
        acc.update_areas(jnp.diagonal(cm), cm.sum(axis=0), cm.sum(axis=1))
        n_img += n_real

    val_time = time.time() - start
    result = acc.summarize()
    result["val_time"] = val_time
    result["images"] = n_img
    logger.info(
        f"[EVAL] #images: {n_img} mIoU: {result['miou']:.4f} "
        f"Acc: {result['acc']:.4f} Kappa: {result['kappa']:.4f} "
        f"mF1: {result['mf1']:.4f} ({val_time:.1f}s)")
    logger.info(f"[EVAL] class IoU: {np.round(result['class_iou'], 4)}")
    return result
