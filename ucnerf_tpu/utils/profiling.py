"""Tracing / profiling / numeric-safety hooks (SURVEY.md §5.1-5.2).

The reference has none of this (its only "sanitizer" is a global autograd
anomaly mode left on at import, ``network/models.py:3``).  Here:

- ``trace(logdir)``: jax.profiler trace context for TensorBoard/XProf.
- ``RateMeter``: running rays/sec/chip counter (the north-star metric).
- ``enable_debug_nans()``: jax debug_nans — the checked equivalent of the
  reference's anomaly mode, opt-in instead of always-on.
- ``checked(fn)``: checkify-wrapped version of a jitted fn that surfaces
  NaN/OOB errors with locations.
"""

from __future__ import annotations

import contextlib
import time

import jax
from jax.experimental import checkify


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class RateMeter:
    """Exponentially-smoothed rate counter (items/sec)."""

    def __init__(self, smoothing: float = 0.9):
        self._t = None
        self._rate = None
        self._smoothing = smoothing
        self.total = 0

    def update(self, n_items: int) -> float:
        now = time.perf_counter()
        self.total += n_items
        if self._t is not None:
            inst = n_items / max(now - self._t, 1e-9)
            self._rate = (inst if self._rate is None else
                          self._smoothing * self._rate
                          + (1 - self._smoothing) * inst)
        self._t = now
        return self._rate or 0.0

    @property
    def rate(self) -> float:
        return self._rate or 0.0


def enable_debug_nans(enable: bool = True):
    jax.config.update("jax_debug_nans", enable)


def checked(fn):
    """Wrap a function with checkify float + index checks; returns a callable
    that raises on NaN/inf/out-of-bounds with source locations."""
    cfn = checkify.checkify(fn, errors=checkify.float_checks
                            | checkify.index_checks)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper
