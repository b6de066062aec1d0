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
    """Synchronize on a computation by fetching one element to host.

    ``jax.block_until_ready`` alone can be a NO-OP on tunneled experimental
    platforms (axon), so after the standard barrier we also pull one element
    of the first leaf's local shard — the device stream is FIFO, so that
    value landing means every queued computation ran. The shard indirection
    avoids tracing ops (ravel) over explicitly-sharded arrays, which the
    sharding-in-types checker rejects outside jit."""
    leaf = jax.tree.leaves(out)[0]
    jax.block_until_ready(leaf)
    shards = getattr(leaf, "addressable_shards", None)
    # a single shard is a plain single-device array: ravel is shard-free
    data = shards[0].data if shards else leaf
    try:
        np.asarray(data.ravel()[0] if hasattr(data, "ravel") else data)
    except Exception:
        # .ravel() traces a jnp op; under a trainer's ambient mesh whose
        # device set differs from the leaf's (e.g. multi-process meshes)
        # that trace is rejected — fall back to an untraced host fetch of
        # the local shard, which forces execution just the same
        np.asarray(data)


class StepTimer:
    """Windowed step timer: ``lap()`` counts steps WITHOUT synchronizing —
    a per-step device sync would serialize dispatch (the host can't enqueue
    step N+1 until step N's outputs land, leaving the TPU idle between
    steps; measured ~40-80 ms/step of dead time on the Muse train loop).
    ``stop(sync_on=...)`` syncs once at the logging cadence and returns the
    window's true per-step average (elapsed / laps); the EMA smooths across
    windows."""

    def __init__(self, ema: float = 0.9):
        self._ema = ema
        self._avg = None
        self._t0 = None
        self._laps = 0

    def start(self):
        """Open a timing window (call right after a step completes)."""
        self._t0 = time.perf_counter()
        self._laps = 0

    def lap(self):
        """Record one finished step without syncing the device."""
        self._laps += 1

    def stop(self, sync_on=None) -> float:
        """Close the window: sync, return the window's per-step average.
        The current step must have been counted with ``lap()`` already."""
        if sync_on is not None:
            force_sync(sync_on)
        dt = (time.perf_counter() - self._t0) / max(self._laps, 1)
        self._avg = dt if self._avg is None else (
            self._ema * self._avg + (1 - self._ema) * dt
        )
        return dt

    @property
    def average(self) -> float | None:
        return self._avg
