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
from .slide import ms_inference, slide_inference, ss_inference


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


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _variable_shape_predict(forward, imgs, labels, config, multi_scales,
                            crop_size, stride_size, num_classes,
                            ignore_index, window_batch, fwd_args=()):
    """Shape-diverse batches (ADE20K / PascalContext / Cityscapes val):
    pad images into a 128-aligned bucket canvas (top-left), slide over the
    canvas, then resize each image's logits region back to ITS OWN label
    size with per-image interpolation matrices at a fixed padded output
    shape (ops.resize.batched_resize_bilinear_padded) — bounded compiles
    instead of one per unique image shape. Labels pad with ignore_index,
    so canvas regions outside each image contribute nothing.

    Reference equivalent: variable-shape list collation + per-image
    resize (src/utils/multi_batch_collate.py:17-29, src/api/infer.py:82-157).
    """
    from ..ops.resize import batched_resize_bilinear_padded, resize_bilinear

    hb = max(crop_size[1], _round_up(max(im.shape[0] for im in imgs), 128))
    wb = max(crop_size[0], _round_up(max(im.shape[1] for im in imgs), 128))
    lab2 = [np.asarray(lb).reshape(lb.shape[-2:]) for lb in labels]
    hlb = _round_up(max(lb.shape[0] for lb in lab2), 128)
    wlb = _round_up(max(lb.shape[1] for lb in lab2), 128)

    img_canvas = np.zeros((len(imgs), hb, wb, imgs[0].shape[-1]), np.float32)
    lab_canvas = np.full((len(imgs), hlb, wlb), ignore_index, np.int32)
    for i, (im, lb) in enumerate(zip(imgs, lab2)):
        img_canvas[i, :im.shape[0], :im.shape[1]] = im
        lab_canvas[i, :lb.shape[0], :lb.shape[1]] = lb
    img_batch = jnp.asarray(img_canvas)
    src_hw = jnp.asarray([im.shape[:2] for im in imgs], jnp.int32)
    dst_hw = jnp.asarray([lb.shape for lb in lab2], jnp.int32)

    scales = tuple(config.VAL.SCALE_RATIOS) if multi_scales else (1.0,)
    flips = ([False, True] if multi_scales else [False])
    final = jnp.zeros((len(imgs), hlb, wlb, num_classes), jnp.float32)
    for scale in scales:
        if scale != 1.0:
            sh, sw = int(hb * scale + 0.5), int(wb * scale + 0.5)
            scaled = resize_bilinear(img_batch, (sh, sw))
            s_src = jnp.round(src_hw.astype(jnp.float32) * scale
                              ).astype(jnp.int32)
        else:
            scaled, s_src = img_batch, src_hw
        for flip in flips:
            x = scaled[:, :, ::-1] if flip else scaled
            logits = slide_inference(forward, x, crop_size, stride_size,
                                     num_classes, window_batch, fwd_args)
            if flip:
                logits = logits[:, :, ::-1]
            resized = batched_resize_bilinear_padded(logits, s_src, dst_hw,
                                                     (hlb, wlb))
            final = final + (jax.nn.softmax(resized, axis=-1)
                             if multi_scales else resized)
    pred = jnp.argmax(final, axis=-1).astype(jnp.int32)
    return pred, jnp.asarray(lab_canvas)


def evaluate(forward, dataset, config, multi_scales: bool = False,
             window_batch: int | None = None, mesh=None, fwd_args=(),
             progbar: bool = True):
    """forward: (images [n,h,w,3], *fwd_args) -> main logits [n,h,w,C]
    (jitted). Pass per-call state (params, batch_stats) via fwd_args — the
    big-raster slide program is cached per (forward, geometry) and bakes
    closed-over arrays in as constants.

    With a mesh (build forward via make_forward(model, mesh)), the
    confusion-area reduction also runs sharded over the 'data' axis: the
    per-shard bincounts psum in-graph and only the [C, C] matrix leaves
    the mesh (reference: rank-sharded val + all_gather, val.py:164-180)."""
    num_classes = config.DATA.NUM_CLASSES
    ignore_index = config.TRAIN.IGNORE_INDEX
    batch_size = config.DATA.BATCH_SIZE_VAL
    crop_size = tuple(config.VAL.CROP_SIZE)
    stride_size = tuple(config.VAL.STRIDE_SIZE)
    acc = MetricAccumulator(num_classes, ignore_index)

    # The [C, C] confusion matrix ACCUMULATES ON DEVICE (async dispatch, no
    # per-batch host sync) and crosses to the host once per spill. Counts
    # are exact int32; spills are scheduled so no cell can reach 2^31.
    if mesh is None:
        @jax.jit
        def cm_fn(total, p, l):
            return total + confusion_matrix(p, l, num_classes, ignore_index)
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P
        data_s = NamedSharding(mesh, P("data"))
        n_data = mesh.shape["data"]

        @jax.jit
        def cm_fn(total, p, l):
            pad = (-p.shape[0]) % n_data
            if pad:
                # padded rows predict 0 against all-ignore labels: no-ops
                p = jnp.concatenate(
                    [p, jnp.zeros((pad,) + p.shape[1:], p.dtype)])
                l = jnp.concatenate(
                    [l, jnp.full((pad,) + l.shape[1:], ignore_index, l.dtype)])
            p = jax.lax.with_sharding_constraint(p, data_s)
            l = jax.lax.with_sharding_constraint(l, data_s)
            return total + confusion_matrix(p, l, num_classes, ignore_index)

    cm_total = jnp.zeros((num_classes, num_classes), jnp.int32)
    pixels_accumulated = 0

    def _spill(cm_dev):
        cm = np.asarray(cm_dev, dtype=np.int64)
        acc.update_areas(np.diagonal(cm), cm.sum(axis=0), cm.sum(axis=1))

    start = time.time()
    n_img = 0
    # reference shows a progress bar during validation (val.py:190-191)
    bar = None
    if progbar:
        from ..utils.progbar import Progbar
        bar = Progbar(target=len(dataset), unit_name="img")
    for batch in val_batches(dataset, batch_size):
        imgs = [b[0] for b in batch]
        labels = [b[1] for b in batch]
        n_real = len(imgs)
        # pad to the fixed batch size with copies (all-ignore labels)
        while len(imgs) < batch_size:
            imgs.append(imgs[-1])
            labels.append(np.full_like(labels[-1], ignore_index))
        img_shapes = [im.shape[:2] for im in imgs]
        lab_shapes = [np.asarray(lb).reshape(lb.shape[-2:]).shape
                      for lb in labels]
        uniform = len(set(img_shapes)) == 1 and len(set(lab_shapes)) == 1
        if uniform:
            img_batch = jnp.asarray(np.stack(imgs))
            ori_shape = labels[0].shape[-2:]
            if multi_scales:
                pred = ms_inference(forward, img_batch, ori_shape, True,
                                    config.VAL.IMAGE_BASE_SIZE, stride_size,
                                    crop_size, num_classes,
                                    scales=config.VAL.SCALE_RATIOS,
                                    flip_horizontal=True,
                                    window_batch=window_batch,
                                    fwd_args=fwd_args)
            else:
                pred = ss_inference(forward, img_batch, ori_shape, True,
                                    config.VAL.IMAGE_BASE_SIZE, stride_size,
                                    crop_size, num_classes,
                                    rescale_from_ori=config.VAL.RESCALE_FROM_ORI,
                                    window_batch=window_batch,
                                    fwd_args=fwd_args)
            label_batch = jnp.asarray(np.stack(labels).reshape(pred.shape))
        else:
            pred, label_batch = _variable_shape_predict(
                forward, imgs, labels, config, multi_scales, crop_size,
                stride_size, num_classes, ignore_index, window_batch,
                fwd_args)
        batch_pixels = int(np.prod(label_batch.shape))
        # spill BEFORE accumulating so the device cm never exceeds the
        # headroom: after a spill-or-skip, cm holds <= 1.5e9 counted pixels
        # and 2^31 - 1.5e9 ≈ 647M bounds the single-batch contribution
        assert batch_pixels < 600_000_000, (
            f"val batch of {batch_pixels} pixels exceeds the int32 "
            f"confusion-matrix headroom; lower DATA.BATCH_SIZE_VAL")
        if pixels_accumulated + batch_pixels > 1_500_000_000:
            _spill(cm_total)
            cm_total = jnp.zeros((num_classes, num_classes), jnp.int32)
            pixels_accumulated = 0
        cm_total = cm_fn(cm_total, pred, label_batch)
        pixels_accumulated += batch_pixels
        n_img += n_real
        if bar is not None:
            bar.update(n_img)

    _spill(cm_total)
    if bar is not None and (bar.target is None or n_img < bar.target):
        # the loop's last update auto-finalizes when n_img hits the target;
        # only force-finalize short runs to avoid a duplicate final line
        bar.update(n_img, finalize=True)
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
