"""Checkpointing: orbax-backed save/restore with keep-K rotation, best-mIoU
tracking, and real resume.

Covers the reference's checkpoint layer (src/utils/checkpoint.py: save every
SAVE_FREQ_CHECKPOINT, deque rotation train.py:197-229, best_model save, and
the written-but-never-called resume() — implemented for real here, fixing
the reference's dangling TODO at train.py:103).
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from .logger import logger


class CheckpointManager:
    def __init__(self, save_dir: str, max_to_keep: int = 1):
        self.save_dir = os.path.abspath(save_dir)
        os.makedirs(self.save_dir, exist_ok=True)
        options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                               create=True)
        self._mgr = ocp.CheckpointManager(
            os.path.join(self.save_dir, "checkpoints"), options=options)
        self._best = ocp.StandardCheckpointer()
        # best_miou is persisted next to best_model so that --resume does not
        # let the first post-restart validation overwrite a better pre-restart
        # best (ADVICE r1).
        self._best_meta = os.path.join(self.save_dir, "best_model.json")
        self.best_miou = -1.0
        if os.path.exists(self._best_meta):
            import json
            try:
                with open(self._best_meta) as f:
                    self.best_miou = float(json.load(f)["best_miou"])
            except (ValueError, KeyError, OSError):
                pass

    def _state_tree(self, state) -> dict:
        return {"params": state.params, "batch_stats": state.batch_stats,
                "opt_state": state.opt_state, "step": state.step}

    def save(self, step: int, state) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(self._state_tree(state)))
        self._mgr.wait_until_finished()
        logger.info(f"checkpoint saved at iter {step}")

    def save_best(self, state, miou: float) -> bool:
        if miou <= self.best_miou:
            return False
        self.best_miou = miou
        path = os.path.join(self.save_dir, "best_model")
        if os.path.exists(path):
            import shutil
            shutil.rmtree(path)
        self._best.save(path, {"params": state.params,
                               "batch_stats": state.batch_stats})
        self._best.wait_until_finished()
        import json
        with open(self._best_meta, "w") as f:
            json.dump({"best_miou": miou}, f)
        logger.info(f"best model saved (mIoU {miou:.4f})")
        return True

    def latest_step(self):
        return self._mgr.latest_step()

    def restore(self, state, step: int | None = None):
        """Restore a full TrainState (resume)."""
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            return state, 0
        target = jax.tree.map(np.asarray, self._state_tree(state))
        restored = self._mgr.restore(step,
                                     args=ocp.args.StandardRestore(target))
        state = state.replace(params=restored["params"],
                              batch_stats=restored["batch_stats"],
                              opt_state=restored["opt_state"],
                              step=restored["step"])
        logger.info(f"resumed from checkpoint at iter {step}")
        return state, int(step)


def load_model_weights(path: str, params, batch_stats):
    """Load params/batch_stats from a best_model-style directory."""
    ckptr = ocp.StandardCheckpointer()
    target = jax.tree.map(np.asarray,
                          {"params": params, "batch_stats": batch_stats})
    restored = ckptr.restore(os.path.abspath(path), target=target)
    return restored["params"], restored["batch_stats"]


def _interp_pos_embed(value: np.ndarray, target_shape, n_prefix: int = 1):
    """Bilinearly re-interpolate a [1, N(+prefix), D] ViT position embedding
    to a new token-grid size (reference checkpoint.py:55-71)."""
    import math

    from ..ops.resize import resize_bilinear

    src_tokens = value.shape[1]
    dst_tokens = target_shape[1]
    prefix = n_prefix if src_tokens != dst_tokens and (
        int(math.isqrt(src_tokens)) ** 2 != src_tokens) else 0
    if int(math.isqrt(src_tokens - n_prefix)) ** 2 == src_tokens - n_prefix \
            and int(math.isqrt(dst_tokens - n_prefix)) ** 2 == dst_tokens - n_prefix:
        prefix = n_prefix
    head = value[:, :prefix]
    grid = value[:, prefix:]
    gs = int(math.isqrt(grid.shape[1]))
    ts = int(math.isqrt(dst_tokens - prefix))
    if gs * gs != grid.shape[1] or ts * ts != dst_tokens - prefix:
        raise ValueError(f"cannot interpolate pos_embed {value.shape} "
                         f"-> {tuple(target_shape)}")
    import jax.numpy as jnp
    grid2d = jnp.asarray(grid.reshape(1, gs, gs, -1))
    resized = np.asarray(resize_bilinear(grid2d, (ts, ts)))
    return np.concatenate([head, resized.reshape(1, ts * ts, -1)], axis=1)


def load_pretrained_model(path: str, params, batch_stats=None):
    """Shape-checked partial weight loading with ViT pos-embed interpolation
    (reference checkpoint.py:38-93): keys present in both trees are copied;
    'pos_embed' params with mismatched token counts are bilinearly
    re-interpolated; everything else mismatched is skipped with a warning."""
    import flax.traverse_util as tu

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path))
    loaded = tu.flatten_dict(restored.get("params", restored))
    target = tu.flatten_dict(jax.tree.map(np.asarray, params))
    matched = skipped = 0
    for key, tgt in target.items():
        if key not in loaded:
            continue
        src = np.asarray(loaded[key])
        if src.shape == tgt.shape:
            target[key] = src
            matched += 1
        elif "pos_embed" in key[-1]:
            try:
                target[key] = _interp_pos_embed(src, tgt.shape)
                matched += 1
                logger.info(f"pos_embed {'/'.join(key)} re-interpolated "
                            f"{src.shape} -> {tgt.shape}")
            except ValueError:
                skipped += 1
        else:
            skipped += 1
            logger.warning(f"skip {'/'.join(key)}: shape {src.shape} "
                           f"!= {tgt.shape}")
    logger.info(f"pretrained load: {matched} matched, {skipped} skipped")
    new_params = tu.unflatten_dict(target)
    if batch_stats is not None and "batch_stats" in restored:
        bs_target = tu.flatten_dict(jax.tree.map(np.asarray, batch_stats))
        bs_loaded = tu.flatten_dict(restored["batch_stats"])
        for key, tgt in bs_target.items():
            if key in bs_loaded and np.asarray(bs_loaded[key]).shape == tgt.shape:
                bs_target[key] = np.asarray(bs_loaded[key])
        batch_stats = tu.unflatten_dict(bs_target)
    return new_params, batch_stats


def load_weights_auto(path: str, params, batch_stats, model_name: str = "",
                      encoder_type: str = "", partial: bool = False):
    """Load weights from an orbax dir OR a Paddle ``.pdparams`` file.

    ``.pdparams`` files go through the key-map converter
    (utils/pdparams.py); orbax directories restore exactly (partial=False)
    or with shape-checked partial matching + pos-embed interpolation
    (partial=True, the reference's load_pretrained_model semantics,
    checkpoint.py:38-93). MODEL.PRETRAINED and val.py --model_path both
    route through here.
    """
    if path.endswith(".pdparams"):
        from .pdparams import convert_pdparams, read_pdparams
        pd = read_pdparams(path)
        params, batch_stats, report = convert_pdparams(
            pd, params, batch_stats, model_name, encoder_type)
        skipped = len(report["missing"]) + len(report["unmatched_flax"])
        logger.info(f"pretrained load: {report['matched']} matched, "
                    f"{skipped} skipped")
        if skipped:
            # a partially-converted checkpoint means some module trains or
            # evaluates from random init — surface it loudly (the CLI
            # converter warns on exactly this condition, pdparams.main)
            logger.warning(
                f"pretrained load from {path}: "
                f"{len(report['missing'])} checkpoint keys had no flax "
                f"target, {len(report['unmatched_flax'])} flax params "
                f"stayed at init "
                f"(e.g. {(report['missing'] + report['unmatched_flax'])[:3]})")
        if report["matched"] == 0:
            raise ValueError(
                f"pretrained load from {path} matched 0 keys for model "
                f"{model_name!r} encoder {encoder_type!r} — wrong "
                f"checkpoint/model combination?")
        return params, batch_stats
    if partial:
        return load_pretrained_model(path, params, batch_stats)
    return load_model_weights(path, params, batch_stats)
