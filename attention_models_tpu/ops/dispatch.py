"""Shared kernel-dispatch gates.

Every Pallas kernel in ops/ has a ``*_supported`` predicate that decides
between the fused kernel and the XLA fallback. Two checks recur in all of
them and live here so a new TPU-like backend alias or a tiling-rule change
is one edit, not seven:

- ``on_tpu``: the backend check (the tunneled ``axon`` platform IS a TPU —
  it compiles through libtpu, so every kernel gate must accept it).
- ``rows_lane_tileable``: the row/lane shape rule for row-tiled kernels —
  last dim fills 128-lane registers, leading dims flatten to a multiple of
  the 8-row sublane tile.
"""

from __future__ import annotations

import math

import jax

TPU_PLATFORMS = ("tpu", "axon")


def on_tpu(platform: str | None = None) -> bool:
    """True when running (or asked about) a TPU-like backend."""
    if platform is None:
        platform = jax.default_backend()
    return platform in TPU_PLATFORMS


def rows_lane_tileable(shape: tuple, d: int) -> bool:
    """Row-tiled kernel shape rule: d % 128 == 0 and flattened leading rows
    a nonzero multiple of the 8-row sublane tile."""
    n = math.prod(shape[:-1]) if len(shape) > 1 else 1
    return d % 128 == 0 and n % 8 == 0 and n >= 8
