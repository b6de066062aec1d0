"""Ahead-of-time model export for serving (StableHLO via ``jax.export``).

The reference has no deployment story beyond pickled ``.pt`` checkpoints
(/root/reference/trainers/utils/base_trainer.py:92-107) — serving it means
shipping the whole Python model zoo. The TPU-native equivalent is an
ahead-of-time compiled artifact: we trace the jitted function (with the
trained params closed over as constants), lower it to StableHLO, and
serialize it. The artifact is self-contained — it reloads and executes
WITHOUT the model code, on any runtime with the same platform (TPU serving
binaries, other JAX processes, IFRT proxies), and is versioned/stable
across JAX releases per the jax.export compatibility contract.

Notes:
  - Export happens for the platform you trace on (Pallas kernels lower to
    platform-specific custom calls, so a TPU export bakes the fused
    codebook/flash/LN kernels; a CPU export bakes the XLA fallback paths).
  - Weights are baked in as constants: one file == one deployable model.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Sequence

import jax
from jax import export as jax_export

_MAGIC = b"AMTPU_EXPORT\x00"
_VERSION = 1


def export_fn(
    fn: Callable,
    example_args: Sequence[Any],
    path: str,
    *,
    meta: dict | None = None,
) -> None:
    """Trace ``fn`` at ``example_args`` (shapes+dtypes only) and write a
    self-contained serialized artifact to ``path``.

    ``fn`` should already close over its params (use ``functools.partial``
    or a lambda) so the artifact is standalone.
    """
    shapes = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tuple(example_args)
    )
    exp = jax_export.export(jax.jit(fn))(*shapes)
    blob = exp.serialize()
    header = json.dumps({
        "version": _VERSION,
        "platforms": list(exp.platforms),
        "jax_version": jax.__version__,
        "meta": meta or {},
    }).encode()
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(len(header).to_bytes(8, "little"))
        f.write(header)
        f.write(blob)
    os.replace(tmp, path)  # atomic: no torn artifacts on preemption


class LoadedModel:
    """A deserialized export: ``call(*args)`` executes the compiled graph."""

    def __init__(self, exported, header: dict):
        self._exported = exported
        self.header = header

    @property
    def platforms(self):
        return tuple(self._exported.platforms)

    def call(self, *args):
        return self._exported.call(*args)

    __call__ = call


def load_fn(path: str) -> LoadedModel:
    """Load an artifact written by :func:`export_fn`."""
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path} is not an attention-models-tpu export")
        hlen = int.from_bytes(f.read(8), "little")
        header = json.loads(f.read(hlen).decode())
        if header["version"] > _VERSION:
            raise ValueError(
                f"artifact version {header['version']} is newer than this "
                f"framework's supported version {_VERSION}"
            )
        blob = f.read()
    return LoadedModel(jax_export.deserialize(blob), header)
