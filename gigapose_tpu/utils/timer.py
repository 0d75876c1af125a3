"""Wall-clock stage timers feeding the BOP runtime columns (ref:
src/utils/time.py:20-54; times flow into the csv via src/utils/inout.py:217-270).

On-device work is asynchronous in JAX, so `toc(block_on=x)` blocks on the
given arrays before reading the clock — the TPU analog of cuda-event timing.
"""

from __future__ import annotations

import time as _time

import jax


class Timer:
    def __init__(self):
        self._t0 = None
        self.total = 0.0

    def tic(self):
        self._t0 = _time.perf_counter()
        return self

    def toc(self, block_on=None) -> float:
        if block_on is not None:
            jax.block_until_ready(block_on)
        dt = _time.perf_counter() - self._t0
        self.total += dt
        return dt

    def reset(self):
        self._t0 = None
        self.total = 0.0
