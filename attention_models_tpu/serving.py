"""Dynamic-batching inference engine — the production serving runtime.

The reference has no serving story at all: its deployment surface is four
single-image argparse scripts (/root/reference/inference/{vitvqgan,vqgan,
muse,maskgit}.py) that rebuild the model and load a pickled ``.pt`` per
invocation. A TPU serving path wants the opposite shape: one resident
compiled program, **static shapes** (XLA recompiles per batch size, so
batches must be padded to a small set of buckets), and **large batches**
(MXU utilization scales with rows). This module provides that runtime:

- :class:`BatchedInferenceEngine` — thread-safe ``submit() -> Future`` API;
  a dispatcher thread coalesces concurrent requests into bucket-padded
  batches, runs one jitted program per bucket (compile count bounded by
  ``len(bucket_sizes)``), and slices per-request results back out.
  Ahead-of-time ``warmup()`` compiles every bucket before traffic arrives;
  ``stats()`` reports occupancy and latency percentiles; ``close()`` drains.

- Service adapters (``muse_service`` / ``maskgit_service`` /
  ``parti_service`` / ``vq_encode_service`` / ``vq_recon_service``) that
  wrap the model zoo's generate/encode paths as batch programs. The
  generator services draw **per-request** sampling noise — each row's
  PRNG key is derived from that request's seed and consumed under
  ``jax.vmap`` — so a request's output is a pure function of
  ``(inputs, seed)`` and does NOT depend on what other traffic it was
  co-batched with (batch-invariant serving; tested by generating the same
  request alone and inside a padded batch).
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from collections import deque
from concurrent.futures import Future
from functools import partial
from typing import Any, Callable, Sequence

import numpy as np


class ServingError(RuntimeError):
    """Engine-level failure: queue overflow or submit after close."""


@dataclasses.dataclass
class _Pending:
    inputs: Any           # pytree of per-example (unbatched) np arrays
    seed: int
    future: Future
    t_submit: float


def _tree_stack(trees):
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs), *trees)


def _tree_pad_rows(tree, pad: int):
    """Pad every leaf's leading axis by repeating the last row ``pad``
    times. Repeated real rows (instead of zeros) keep the padded compute on
    the same numerical path as live traffic — no NaN/inf surprises from
    all-zero inputs, and the rows are sliced off before results are set."""
    import jax

    if pad == 0:
        return tree
    return jax.tree.map(
        lambda x: np.concatenate([x, np.repeat(x[-1:], pad, axis=0)]), tree
    )


class BatchedInferenceEngine:
    """Coalesces concurrent single-example requests into padded batches.

    Parameters
    ----------
    run_batch:
        ``run_batch(batched_inputs, seeds) -> batched_outputs``. Leaves of
        ``batched_inputs`` carry a leading batch axis; ``seeds`` is an
        ``(b,)`` int32 array (one seed per row, padding rows repeat the
        last). Must accept every batch size in ``bucket_sizes``.
    bucket_sizes:
        Allowed batch sizes. A group of ``n`` requests runs at the smallest
        bucket ``>= n`` (padded by repeating the last row); at most
        ``max(bucket_sizes)`` requests run per dispatch.
    max_wait_ms:
        How long the dispatcher holds the first request of a batch open for
        more arrivals before launching under-full. Latency/occupancy knob.
    max_queue:
        Backpressure bound: ``submit`` raises :class:`ServingError` when
        this many requests are already waiting.
    autostart:
        ``False`` leaves the dispatcher stopped until :meth:`start` — lets
        callers (and tests) enqueue a burst that is then coalesced
        deterministically.
    """

    def __init__(
        self,
        run_batch: Callable[[Any, np.ndarray], Any],
        *,
        bucket_sizes: Sequence[int] = (1, 2, 4, 8),
        max_wait_ms: float = 2.0,
        max_queue: int = 1024,
        autostart: bool = True,
        name: str = "engine",
    ):
        if not bucket_sizes or any(b <= 0 for b in bucket_sizes):
            raise ValueError(f"bad bucket_sizes: {bucket_sizes}")
        self._run_batch = run_batch
        self.bucket_sizes = tuple(sorted(set(int(b) for b in bucket_sizes)))
        self.max_wait_s = float(max_wait_ms) / 1e3
        self.name = name
        self._q: "queue.Queue[_Pending]" = queue.Queue(maxsize=int(max_queue))
        self._closed = False
        self._thread: threading.Thread | None = None
        self._lock = threading.Lock()
        self._stats = {
            "requests": 0, "batches": 0, "rows_padded": 0, "errors": 0,
            "batch_sizes": {b: 0 for b in self.bucket_sizes},
        }
        self._latencies: deque = deque(maxlen=2048)
        if autostart:
            self.start()

    # ------------------------------------------------------------- lifecycle
    def start(self):
        if self._thread is not None:
            return
        self._thread = threading.Thread(
            target=self._dispatch_loop, name=f"{self.name}-dispatch",
            daemon=True,
        )
        self._thread.start()

    def close(self, drain: bool = True, timeout: float | None = 60.0):
        """Stop accepting work; by default wait for queued requests to
        finish. With ``drain=False`` queued requests fail with
        :class:`ServingError`."""
        self._closed = True
        if not drain:
            while True:
                try:
                    p = self._q.get_nowait()
                except queue.Empty:
                    break
                p.future.set_exception(ServingError("engine closed"))
        if self._thread is not None:
            self._thread.join(timeout=timeout)
            self._thread = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # --------------------------------------------------------------- submit
    def submit(self, inputs: Any, seed: int = 0) -> Future:
        """Enqueue one example (pytree of unbatched arrays; ``{}`` for
        services that need only a seed). Returns a Future resolving to the
        per-example output pytree (host numpy)."""
        if self._closed:
            raise ServingError("submit() after close()")
        fut: Future = Future()
        try:
            self._q.put_nowait(
                _Pending(inputs, int(seed), fut, time.perf_counter())
            )
        except queue.Full:
            raise ServingError(
                f"queue full ({self._q.maxsize} requests waiting)"
            ) from None
        return fut

    def __call__(self, inputs: Any, seed: int = 0, timeout: float = 600.0):
        """Blocking convenience wrapper around :meth:`submit`."""
        return self.submit(inputs, seed).result(timeout=timeout)

    # --------------------------------------------------------------- warmup
    def warmup(self, example_inputs: Any, seed: int = 0) -> None:
        """Compile every bucket ahead of traffic by running ``run_batch``
        on the example tiled to each bucket size (results discarded)."""
        import jax

        for b in self.bucket_sizes:
            batched = jax.tree.map(
                lambda x: np.stack([np.asarray(x)] * b), example_inputs
            )
            seeds = np.full((b,), seed, np.int32)
            out = self._run_batch(batched, seeds)
            jax.tree.map(np.asarray, out)

    # ---------------------------------------------------------------- stats
    def stats(self) -> dict:
        with self._lock:
            s = {k: (dict(v) if isinstance(v, dict) else v)
                 for k, v in self._stats.items()}
            lat = sorted(self._latencies)
        if lat:
            s["latency_p50_ms"] = 1e3 * lat[len(lat) // 2]
            s["latency_p95_ms"] = 1e3 * lat[min(len(lat) - 1,
                                                int(0.95 * len(lat)))]
        rows = sum(b * n for b, n in s["batch_sizes"].items())
        s["occupancy"] = (s["requests"] / rows) if rows else 0.0
        return s

    # ------------------------------------------------------------ dispatcher
    def _dispatch_loop(self):
        max_b = self.bucket_sizes[-1]
        while True:
            try:
                first = self._q.get(timeout=0.05)
            except queue.Empty:
                if self._closed:
                    return
                continue
            batch = [first]
            deadline = time.perf_counter() + self.max_wait_s
            while len(batch) < max_b:
                rem = deadline - time.perf_counter()
                try:
                    batch.append(
                        self._q.get(timeout=max(rem, 0) if rem > 0 else None)
                        if rem > 0 else self._q.get_nowait()
                    )
                except queue.Empty:
                    break
            self._execute(batch)

    def _execute(self, batch):
        import jax

        n = len(batch)
        bucket = next(b for b in self.bucket_sizes if b >= n)
        try:
            inputs = _tree_pad_rows(
                _tree_stack([p.inputs for p in batch]), bucket - n
            )
            seeds = np.asarray(
                [p.seed for p in batch]
                + [batch[-1].seed] * (bucket - n), np.int32
            )
            out = self._run_batch(inputs, seeds)
            host = jax.tree.map(np.asarray, out)  # block + fetch once
        except Exception as e:  # noqa: BLE001 — propagate to callers
            with self._lock:
                self._stats["errors"] += n
            for p in batch:
                if not p.future.cancelled():
                    p.future.set_exception(e)
            return
        t_done = time.perf_counter()
        for i, p in enumerate(batch):
            row = jax.tree.map(lambda x: x[i], host)
            if not p.future.cancelled():
                p.future.set_result(row)
        with self._lock:
            self._stats["requests"] += n
            self._stats["batches"] += 1
            self._stats["rows_padded"] += bucket - n
            self._stats["batch_sizes"][bucket] += 1
            for p in batch:
                self._latencies.append(t_done - p.t_submit)


# ====================================================================== #
# Service adapters: model zoo -> run_batch(batched_inputs, seeds)        #
# ====================================================================== #

def _row_keys(seeds):
    """Per-request PRNG keys: fold each row's seed into a fixed base key.
    Consumed under vmap so row i's noise is independent of the batch."""
    import jax

    base = jax.random.key(0)
    return jax.vmap(lambda s: jax.random.fold_in(base, s))(seeds)


def muse_service(model, variables, *, timesteps: int = 18,
                 filter_p: float = 0.9, guidance_scale: float | None = None,
                 approx_topk: bool = False):
    """Text-to-image service over :meth:`MUSE.generate`. Request inputs:
    ``text_ids`` of shape (max_length,) int32 (see text_encoder.tokenize).
    Output: one image (3, H, W). Batch-invariant: per-row keys + vmap."""
    import jax

    def _one(vars_, ids_row, key):
        img = model.apply(
            vars_, ids_row[None], key, timesteps=timesteps,
            filter_p=filter_p, guidance_scale=guidance_scale,
            approx_topk=approx_topk, method=type(model).generate,
        )
        return img[0]

    fn = jax.jit(jax.vmap(_one, in_axes=(None, 0, 0)), static_argnums=())

    def run_batch(text_ids, seeds):
        return fn(variables, np.asarray(text_ids, np.int32),
                  _row_keys(np.asarray(seeds, np.int32)))

    return run_batch


def maskgit_service(model, variables, *, timesteps: int = 18,
                    num_masked: int = 200, filter_p: float = 0.9,
                    approx_topk: bool = False, inpaint: bool = False):
    """Unconditional generation (request inputs: ``{}``) or inpainting
    (request inputs: one image (3, H, W)) via MaskGIT's iterative decode."""
    import jax

    def _one(vars_, imgs_row, key):
        kw = dict(timesteps=timesteps, filter_p=filter_p,
                  approx_topk=approx_topk, num_masked=num_masked,
                  method=type(model).generate)
        if inpaint:
            out = model.apply(vars_, key, imgs=imgs_row[None], **kw)
        else:
            out = model.apply(vars_, key, batch=1, **kw)
        return out[0]

    in_axes = (None, 0 if inpaint else None, 0)
    fn = jax.jit(jax.vmap(_one, in_axes=in_axes))

    def run_batch(inputs, seeds):
        seeds = np.asarray(seeds, np.int32)
        imgs = (np.asarray(inputs, np.float32) if inpaint else None)
        return fn(variables, imgs, _row_keys(seeds))

    return run_batch


def parti_service(model, variables, *, filter_p: float = 0.9,
                  approx_topk: bool = False, guidance_scale: float = 0.0):
    """AR text-to-image service over the KV-cached Parti decode. Request
    inputs: ``text_ids`` (max_length,) int32; output (3, H, W)."""
    import jax

    from attention_models_tpu.models.parti import parti_generate

    def _one(vars_, ids_row, key):
        img = parti_generate(
            model, vars_, ids_row[None], key, filter_p=filter_p,
            approx_topk=approx_topk, guidance_scale=guidance_scale,
        )
        return img[0]

    fn = jax.jit(jax.vmap(_one, in_axes=(None, 0, 0)))

    def run_batch(text_ids, seeds):
        return fn(variables, np.asarray(text_ids, np.int32),
                  _row_keys(np.asarray(seeds, np.int32)))

    return run_batch


def vq_encode_service(model, variables):
    """Deterministic tokenize service: image (3, H, W) -> codebook indices
    (num_patches,). Seeds ignored."""
    import jax

    fn = jax.jit(
        lambda v, imgs: model.apply(v, imgs,
                                    method=type(model).encode_imgs)
    )

    def run_batch(imgs, seeds):  # noqa: ARG001 — deterministic service
        return fn(variables, np.asarray(imgs, np.float32))

    return run_batch


def vq_recon_service(model, variables):
    """Deterministic reconstruction service: image -> (recon image)."""
    import jax

    def _recon(v, imgs):
        rec, _ = model.apply(v, imgs)
        return rec

    fn = jax.jit(_recon)

    def run_batch(imgs, seeds):  # noqa: ARG001
        return fn(variables, np.asarray(imgs, np.float32))

    return run_batch
