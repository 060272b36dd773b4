"""Segmentation metrics as pure JAX functions.

Behavior-equivalent to the reference's confusion-area metrics
(reference: ``semantic_segmentation/src/utils/metrics.py:20-161``) but
TPU-first: instead of a per-class one-hot loop, ``calculate_area`` computes
the full confusion matrix in one ``bincount`` over ``label * C + pred`` —
one fused pass, jit-friendly, and the per-image areas are exact integer
counts so they can be summed across batches and psum-reduced across devices.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def confusion_matrix(pred: jnp.ndarray, label: jnp.ndarray, num_classes: int,
                     ignore_index: int = 255) -> jnp.ndarray:
    """Dense confusion matrix [C, C]: rows = label (truth), cols = pred."""
    pred = pred.reshape(-1).astype(jnp.int32)
    label = label.reshape(-1).astype(jnp.int32)
    # Any out-of-range label or pred (negative, >= C, or ignore_index) is
    # dropped rather than mis-binned via bincount's clip behavior.
    valid = ((label >= 0) & (label < num_classes) & (label != ignore_index)
             & (pred >= 0) & (pred < num_classes))
    # Funnel invalid pixels into an extra bin that we drop afterwards.
    idx = jnp.where(valid, label * num_classes + pred, num_classes * num_classes)
    cm = jnp.bincount(idx, length=num_classes * num_classes + 1)[:-1]
    return cm.reshape(num_classes, num_classes)


def calculate_area(pred, label, num_classes: int, ignore_index: int = 255):
    """Per-class (intersect_area, pred_area, label_area), ignore-masked.

    Matches reference ``metrics.py:20-69`` (equal shapes required; a leading
    channel dim of 1 is squeezed).
    """
    if pred.ndim == 4:
        pred = jnp.squeeze(pred, axis=1)
    if label.ndim == 4:
        label = jnp.squeeze(label, axis=1)
    if pred.shape != label.shape:
        raise ValueError(f"pred{pred.shape} and label{label.shape} shapes differ")
    cm = confusion_matrix(pred, label, num_classes, ignore_index)
    intersect_area = jnp.diagonal(cm)
    pred_area = cm.sum(axis=0)
    label_area = cm.sum(axis=1)
    return intersect_area, pred_area, label_area


def mean_iou(intersect_area, pred_area, label_area):
    """Per-class IoU and mIoU (reference metrics.py:71-98; IoU=0 for empty union)."""
    intersect_area = np.asarray(intersect_area, dtype=np.float64)
    pred_area = np.asarray(pred_area, dtype=np.float64)
    label_area = np.asarray(label_area, dtype=np.float64)
    union = pred_area + label_area - intersect_area
    class_iou = np.where(union == 0, 0.0, intersect_area / np.maximum(union, 1))
    return class_iou, float(np.mean(class_iou))


def accuracy(intersect_area, pred_area, label_area):
    """(mean_acc, class_precision, class_recall) — reference metrics.py:100-136."""
    intersect_area = np.asarray(intersect_area, dtype=np.float64)
    pred_area = np.asarray(pred_area, dtype=np.float64)
    label_area = np.asarray(label_area, dtype=np.float64)
    mean_acc = float(np.sum(intersect_area) / np.sum(pred_area))
    class_precision = np.where(pred_area == 0, 0.0, intersect_area / np.maximum(pred_area, 1))
    class_recall = np.where(label_area == 0, 0.0, intersect_area / np.maximum(label_area, 1))
    return mean_acc, class_precision, class_recall


def kappa(intersect_area, pred_area, label_area) -> float:
    """Cohen's kappa from confusion areas (reference metrics.py:140-161)."""
    intersect_area = np.asarray(intersect_area, dtype=np.float64)
    pred_area = np.asarray(pred_area, dtype=np.float64)
    label_area = np.asarray(label_area, dtype=np.float64)
    total = np.sum(label_area)
    po = np.sum(intersect_area) / total
    pe = np.sum(pred_area * label_area) / (total * total)
    return float((po - pe) / (1 - pe))


def f1_scores(class_precision, class_recall):
    """Per-class F1 and mean F1 (computed at call sites in reference val.py:199-200)."""
    p = np.asarray(class_precision, dtype=np.float64)
    r = np.asarray(class_recall, dtype=np.float64)
    denom = p + r
    f1 = np.where(denom == 0, 0.0, 2 * p * r / np.maximum(denom, 1e-12))
    return f1, float(np.mean(f1))


class MetricAccumulator:
    """Streaming confusion-area accumulator (host-side, integer exact)."""

    def __init__(self, num_classes: int, ignore_index: int = 255):
        self.num_classes = num_classes
        self.ignore_index = ignore_index
        self.intersect = np.zeros(num_classes, dtype=np.int64)
        self.pred = np.zeros(num_classes, dtype=np.int64)
        self.label = np.zeros(num_classes, dtype=np.int64)

    def update(self, pred, label):
        i, p, l = calculate_area(jnp.asarray(pred), jnp.asarray(label),
                                 self.num_classes, self.ignore_index)
        self.update_areas(i, p, l)

    def update_areas(self, intersect, pred, label):
        self.intersect += np.asarray(intersect, dtype=np.int64)
        self.pred += np.asarray(pred, dtype=np.int64)
        self.label += np.asarray(label, dtype=np.int64)

    def summarize(self):
        class_iou, miou = mean_iou(self.intersect, self.pred, self.label)
        acc, class_precision, class_recall = accuracy(self.intersect, self.pred, self.label)
        kap = kappa(self.intersect, self.pred, self.label)
        class_f1, mf1 = f1_scores(class_precision, class_recall)
        return {
            "class_iou": class_iou,
            "miou": miou,
            "acc": acc,
            "class_precision": class_precision,
            "class_recall": class_recall,
            "kappa": kap,
            "class_f1": class_f1,
            "mf1": mf1,
        }
