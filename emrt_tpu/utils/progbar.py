"""Keras-style terminal progress bar (reference: src/utils/progbar.py)."""
from __future__ import annotations

import sys
import time


class Progbar:
    def __init__(self, target: int | None, width: int = 30, verbose: int = 1,
                 interval: float = 0.05, unit_name: str = "step"):
        self.target = target
        self.width = width
        self.verbose = verbose
        self.interval = interval
        self.unit_name = unit_name
        self._start = time.time()
        self._last_update = 0.0
        self._seen_so_far = 0
        self._values: dict[str, list[float]] = {}
        self._is_tty = getattr(sys.stdout, "isatty", lambda: False)()

    def update(self, current: int, values=None, finalize: bool | None = None):
        if finalize is None:
            finalize = self.target is not None and current >= self.target
        values = values or []
        for k, v in values:
            acc = self._values.setdefault(k, [0.0, 0])
            acc[0] += v * (current - self._seen_so_far or 1)
            acc[1] += (current - self._seen_so_far or 1)
        self._seen_so_far = current

        now = time.time()
        if not finalize and now - self._last_update < self.interval:
            return
        self._last_update = now
        if self.verbose != 1:
            return

        if self.target is not None:
            frac = current / self.target
            filled = int(self.width * frac)
            bar = ("=" * max(filled - 1, 0) +
                   (">" if filled < self.width else "=") +
                   "." * (self.width - filled))
            msg = f"\r{current}/{self.target} [{bar}]"
        else:
            msg = f"\r{current}/? "
        elapsed = now - self._start
        if current:
            per = elapsed / current
            msg += f" - {elapsed:.0f}s {per * 1000:.0f}ms/{self.unit_name}"
        for k, (total, count) in self._values.items():
            msg += f" - {k}: {total / max(count, 1):.4f}"
        end = "\n" if finalize else ""
        stream = sys.stdout
        stream.write(msg + end)
        stream.flush()

    def add(self, n: int, values=None):
        self.update(self._seen_so_far + n, values)
