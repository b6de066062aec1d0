"""Tracing / profiling utilities (SURVEY.md §5: the reference has none).

- ``trace_context(name)``: jax.profiler trace annotation around a train step.
- ``profile_run(log_dir)``: capture a TensorBoard-viewable device profile.
- ``enable_nan_checks()``: turn on jax_debug_nans (config-gated; the
  trainers enable it when ``training.debug_nans`` is true).
- ``StepTimer``: host-side wall-clock EMA of step latency with a
  value-fetch synchronizer (block_until_ready can be a no-op on tunneled
  experimental backends).
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


def enable_nan_checks(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)


@contextlib.contextmanager
def trace_context(name: str):
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def profile_run(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def force_sync(out) -> None:
    """Synchronize on a computation by fetching one element to host."""
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.numpy.ravel(leaf)[0])


class StepTimer:
    def __init__(self, ema: float = 0.9):
        self._ema = ema
        self._avg = None
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_on=None) -> float:
        if sync_on is not None:
            force_sync(sync_on)
        dt = time.perf_counter() - self._t0
        self._avg = dt if self._avg is None else (
            self._ema * self._avg + (1 - self._ema) * dt
        )
        return dt

    @property
    def average(self) -> float | None:
        return self._avg
