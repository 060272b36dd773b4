"""Optimizers as optax chains with per-parameter LR multipliers.

Behavior-equivalent to the reference solver
(src/models/solver/optimizer.py:21-75): SGD-momentum (+nesterov), Adam,
AdamW, Adadelta, RMSProp, global-norm grad clip, L2 weight decay — plus the
reference's per-parameter learning-rate attributes (deformable
sampling_offsets / reference_points x0.1, transformer_encoder_decoder.py:
36-38,371; SETR/Segmenter decoder x DECODER_LR_COEF, setr.py:121-151)
implemented as an optax update scaling keyed on parameter paths.
"""
from __future__ import annotations

from typing import Callable

import jax
import optax


LR_MULT_RULES = (
    # (substring of '/'-joined param path, multiplier key)
    ("sampling_offsets", "lr01"),
    ("reference_points", "lr01"),
)


def _path_label(path) -> str:
    keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
    return "/".join(str(k) for k in keys)


def param_labels(params, decoder_prefixes=()) -> dict:
    """Label tree: 'lr01' for deformable offsets, 'decoder' for decoder
    lr-coef params, 'base' otherwise."""
    def label(path, _):
        p = _path_label(path)
        for sub, lab in LR_MULT_RULES:
            if sub in p:
                return lab
        for pref in decoder_prefixes:
            if p.startswith(pref):
                return "decoder"
        return "base"
    return jax.tree_util.tree_map_with_path(label, params)


def scale_by_label(labels, mults: dict):
    """Multiply updates per label (equivalent to per-param LR attrs)."""
    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        updates = jax.tree.map(
            lambda u, l: u * mults.get(l, 1.0), updates, labels)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def get_optimizer(config, schedule: Callable, params=None,
                  decoder_lr_coef: float | None = None,
                  decoder_prefixes=()) -> optax.GradientTransformation:
    """Build the optax chain for config.TRAIN.OPTIMIZER."""
    opt_cfg = config.TRAIN.OPTIMIZER
    name = opt_cfg.NAME.lower()
    wd = float(opt_cfg.WEIGHT_DECAY or 0.0)

    chain = []
    if opt_cfg.GRAD_CLIP:
        chain.append(optax.clip_by_global_norm(float(opt_cfg.GRAD_CLIP)))

    if name == "sgd":
        # paddle Momentum: L2 regularization folded into the gradient
        if wd:
            chain.append(optax.add_decayed_weights(wd))
        chain.append(optax.trace(decay=opt_cfg.MOMENTUM,
                                 nesterov=opt_cfg.NESTEROV))
    elif name == "adam":
        if wd:
            chain.append(optax.add_decayed_weights(wd))
        chain.append(optax.scale_by_adam(b1=opt_cfg.BETAS[0],
                                         b2=opt_cfg.BETAS[1],
                                         eps=opt_cfg.EPS))
    elif name == "adamw":
        chain.append(optax.scale_by_adam(b1=opt_cfg.BETAS[0],
                                         b2=opt_cfg.BETAS[1],
                                         eps=opt_cfg.EPS))
        if wd:
            chain.append(optax.add_decayed_weights(wd))
    elif name == "adadelta":
        chain.append(optax.scale_by_adadelta(rho=opt_cfg.RHO, eps=opt_cfg.EPS))
        if wd:
            chain.append(optax.add_decayed_weights(wd))
    elif name == "rmsprop":
        chain.append(optax.scale_by_rms(decay=opt_cfg.RHO, eps=opt_cfg.EPS))
        if wd:
            chain.append(optax.add_decayed_weights(wd))
    else:
        raise NotImplementedError(f"optimizer {opt_cfg.NAME} is not supported")

    chain.append(optax.scale_by_learning_rate(schedule))

    # per-parameter LR multipliers applied to the final updates
    if params is not None:
        mults = {"base": 1.0, "lr01": 0.1}
        if decoder_lr_coef and decoder_lr_coef != 1.0:
            mults["decoder"] = float(decoder_lr_coef)
        labels = param_labels(params, decoder_prefixes)
        chain.append(scale_by_label(labels, mults))

    return optax.chain(*chain)
