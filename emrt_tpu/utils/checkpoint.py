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
        self.best_miou = -1.0

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
