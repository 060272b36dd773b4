"""Rank-0 logger (reference: semantic_segmentation/src/utils/logger.py:19-44)."""
from __future__ import annotations

import logging
import sys

import jax

_LOGGER = None


def get_logger(name: str = "emrt_tpu", level: int = logging.INFO):
    global _LOGGER
    if _LOGGER is not None:
        return _LOGGER
    logger = logging.getLogger(name)
    logger.setLevel(level)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(logging.Formatter(
            "%(asctime)s %(levelname)s: %(message)s", datefmt="%Y-%m-%d %H:%M:%S"))
        logger.addHandler(handler)
    logger.propagate = False
    if jax.process_index() != 0:  # rank gating, replaces local_rank checks
        logger.setLevel(logging.ERROR)
    _LOGGER = logger
    return logger


class _Proxy:
    def _log(self, level, *args, **kwargs):
        getattr(get_logger(), level)(*args, **kwargs)

    def info(self, *a, **k):
        self._log("info", *a, **k)

    def warning(self, *a, **k):
        self._log("warning", *a, **k)

    def error(self, *a, **k):
        self._log("error", *a, **k)

    def debug(self, *a, **k):
        self._log("debug", *a, **k)


logger = _Proxy()
