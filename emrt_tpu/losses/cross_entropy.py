"""Segmentation losses as pure functions over logits lists.

Behavior-equivalent to the reference loss zoo
(src/models/losses/{cross_entropy_loss,mix_softmax_cross_entropy_loss,
multi_cross_entropy_loss,ohem_cross_entropy_loss}.py): masked-mean CE with
ignore_index, main+aux mixing (0.4 default), weighted multi-output CE, and
online hard-example mining. Logits are NHWC [bs, H, W, C]; labels [bs, H, W].
All reductions in f32.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _masked_ce(logits, label, ignore_index: int, class_weight=None):
    """Mean cross-entropy over non-ignored pixels."""
    logits = logits.astype(jnp.float32)
    valid = (label != ignore_index)
    safe_label = jnp.where(valid, label, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_label[..., None], axis=-1)[..., 0]
    if class_weight is not None:
        w = jnp.asarray(class_weight, dtype=jnp.float32)[safe_label]
        nll = nll * w
        denom = jnp.sum(w * valid)
    else:
        denom = jnp.sum(valid)
    return jnp.sum(nll * valid) / jnp.maximum(denom, 1.0)


class CrossEntropyLoss:
    """Masked-mean CE (reference cross_entropy_loss.py:20-73)."""

    def __init__(self, ignore_index: int = 255, class_weight=None):
        self.ignore_index = ignore_index
        self.class_weight = class_weight

    def __call__(self, logits_list, label):
        logits = logits_list[0] if isinstance(logits_list, (list, tuple)) else logits_list
        return _masked_ce(logits, label, self.ignore_index, self.class_weight)


class MixSoftmaxCrossEntropyLoss:
    """CE(main) + aux_weight * sum CE(aux_i)
    (reference mix_softmax_cross_entropy_loss.py:20-51)."""

    def __init__(self, ignore_index: int = 255, aux: bool = True,
                 aux_weight: float = 0.4):
        self.ignore_index = ignore_index
        self.aux = aux
        self.aux_weight = aux_weight

    def __call__(self, logits_list, label):
        if not isinstance(logits_list, (list, tuple)):
            logits_list = [logits_list]
        loss = _masked_ce(logits_list[0], label, self.ignore_index)
        if self.aux:
            for aux_logits in logits_list[1:]:
                loss = loss + self.aux_weight * _masked_ce(
                    aux_logits, label, self.ignore_index)
        return loss


class MultiCrossEntropyLoss:
    """Weighted sum over a prediction list (reference multi_cross_entropy_loss.py)."""

    def __init__(self, ignore_index: int = 255,
                 weights=(1, 0.4, 0.4, 0.4, 0.4)):
        self.ignore_index = ignore_index
        self.weights = weights

    def __call__(self, logits_list, label):
        if not isinstance(logits_list, (list, tuple)):
            logits_list = [logits_list]
        loss = 0.0
        for w, logits in zip(self.weights, logits_list):
            loss = loss + w * _masked_ce(logits, label, self.ignore_index)
        return loss


class OhemCrossEntropyLoss:
    """Online hard example mining CE (reference ohem_cross_entropy_loss.py:7-83).

    Keeps pixels whose prob of the true class < thresh; at least min_kept
    hardest pixels. Static-shape version: uses top-k over the flattened
    per-pixel losses instead of boolean filtering.
    """

    def __init__(self, ignore_index: int = 255, thresh: float = 0.7,
                 min_kept: int = 10000):
        self.ignore_index = ignore_index
        self.thresh = thresh
        self.min_kept = min_kept

    def __call__(self, logits_list, label):
        logits = logits_list[0] if isinstance(logits_list, (list, tuple)) else logits_list
        logits = logits.astype(jnp.float32)
        valid = (label != self.ignore_index)
        safe_label = jnp.where(valid, label, 0).astype(jnp.int32)
        prob = jax.nn.softmax(logits, axis=-1)
        true_prob = jnp.take_along_axis(prob, safe_label[..., None], axis=-1)[..., 0]
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, safe_label[..., None], axis=-1)[..., 0]

        flat_nll = (nll * valid).reshape(-1)
        flat_true_prob = jnp.where(valid, true_prob, 1.0).reshape(-1)
        k = min(self.min_kept, flat_nll.size)
        # threshold that keeps at least min_kept pixels
        kth_prob = jnp.sort(flat_true_prob)[k - 1]
        thresh = jnp.maximum(kth_prob, self.thresh)
        keep = (flat_true_prob <= thresh) & valid.reshape(-1)
        keep_f = keep.astype(jnp.float32)
        return jnp.sum(flat_nll * keep_f) / jnp.maximum(jnp.sum(keep_f), 1.0)


def get_loss_function(config):
    """(reference src/models/losses/__init__.py:6)."""
    name = config.TRAIN.LOSS
    ignore_index = config.TRAIN.IGNORE_INDEX
    if name == "MixSoftmaxCrossEntropyLoss":
        return MixSoftmaxCrossEntropyLoss(
            ignore_index=ignore_index,
            aux=config.MODEL.AUX.LOSS,
            aux_weight=config.MODEL.AUX.AUX_WEIGHT)
    if name == "CrossEntropyLoss":
        return CrossEntropyLoss(ignore_index=ignore_index)
    if name == "MultiCrossEntropyLoss":
        return MultiCrossEntropyLoss(ignore_index=ignore_index,
                                     weights=config.TRAIN.WEIGHTS)
    if name == "OhemCrossEntropyLoss":
        return OhemCrossEntropyLoss(ignore_index=ignore_index)
    raise NotImplementedError(f"loss {name} is not supported")
