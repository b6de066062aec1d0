"""Explicit PRNG threading utilities.

The reference relies on torch global RNG; the TPU-native build threads
``jax.random`` keys explicitly. ``RngStream`` is a tiny host-side convenience
for trainers (inside jitted steps, keys are split functionally)."""

from __future__ import annotations

import jax


class RngStream:
    """Host-side RNG key dispenser: ``stream()`` returns a fresh key."""

    def __init__(self, seed: int | jax.Array):
        self._key = jax.random.key(seed) if isinstance(seed, int) else seed

    def __call__(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def fold_in(self, data: int) -> jax.Array:
        return jax.random.fold_in(self._key, data)

    def key_data(self) -> jax.Array:
        """Raw key data of the CURRENT stream position — checkpointing this
        and restoring via ``wrap_key_data`` makes a resumed run's rng() calls
        continue exactly where the uninterrupted run's would."""
        return jax.random.key_data(self._key)
