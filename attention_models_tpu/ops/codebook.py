"""Fused L2 nearest-neighbor codebook lookup (Pallas) + VQ helpers.

TPU-native replacement for the reference quantizer hot loop
(/root/reference/models/vitvqgan.py:151-171 and vqgan.py:151-182): instead of
materializing the (B·N × K) distance matrix in HBM and arg-minning it, the
Pallas kernel streams codebook chunks through VMEM keeping a running
(min, argmin) per token.

Numerical contract for checkpoint fidelity (SURVEY.md §3.4):
  - distances d = |z|² + |e|² − 2 z·e accumulated in float32
  - argmin ties resolve to the first (lowest) index, matching torch.argmin
  - the |z|² term is constant per row, so the kernel drops it (argmin
    invariant) — documented deviation from the literal formula, not from the
    result.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """torch.nn.functional.normalize semantics: x / max(|x|, eps)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


def _nn_kernel(z_ref, codes_ref, idx_ref, *, block_codes: int, num_codes: int):
    # z_ref: (block_n, d); codes_ref: (K, d); idx_ref: (1, block_n) int32
    z = z_ref[:].astype(jnp.float32)
    block_n = z.shape[0]

    num_chunks = num_codes // block_codes

    def body(cb, carry):
        best_d, best_i = carry
        chunk = codes_ref[pl.ds(cb * block_codes, block_codes), :].astype(
            jnp.float32
        )  # (bk, d)
        e_sq = jnp.sum(chunk * chunk, axis=-1)[None, :]  # (1, bk)
        dots = jax.lax.dot_general(
            z, chunk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bn, bk)
        d = e_sq - 2.0 * dots
        local_min = jnp.min(d, axis=-1)  # (bn,)
        local_arg = jnp.argmin(d, axis=-1).astype(jnp.int32) + cb * block_codes
        upd = local_min < best_d  # strict: earlier chunk wins ties
        return jnp.where(upd, local_min, best_d), jnp.where(upd, local_arg, best_i)

    init = (
        jnp.full((block_n,), jnp.inf, jnp.float32),
        jnp.zeros((block_n,), jnp.int32),
    )
    _, best_i = jax.lax.fori_loop(0, num_chunks, body, init)
    idx_ref[0, :] = best_i


def _nearest_codes_pallas(
    z: jnp.ndarray, codes: jnp.ndarray, *, block_n: int, block_codes: int
) -> jnp.ndarray:
    n, d = z.shape
    k = codes.shape[0]
    bn = min(block_n, n)
    if n % bn:
        raise ValueError(f"token count {n} not divisible by block {bn}")
    bk = min(block_codes, k)
    if k % bk:
        raise ValueError(f"codebook size {k} not divisible by block {bk}")

    kernel = functools.partial(_nn_kernel, block_codes=bk, num_codes=k)
    out = pl.pallas_call(
        kernel,
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((bn, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bn), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n // bn, bn), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * k * d,
            bytes_accessed=(n * d + k * d + n) * 4,
            transcendentals=0,
        ),
    )(z, codes)
    return out.reshape(n)


def _nearest_codes_xla(z: jnp.ndarray, codes: jnp.ndarray) -> jnp.ndarray:
    zf = z.astype(jnp.float32)
    cf = codes.astype(jnp.float32)
    d = (
        jnp.sum(cf * cf, axis=-1)[None, :]
        - 2.0 * jnp.einsum("nd,kd->nk", zf, cf, preferred_element_type=jnp.float32)
    )
    return jnp.argmin(d, axis=-1).astype(jnp.int32)


def nearest_codes(
    z: jnp.ndarray,
    codes: jnp.ndarray,
    *,
    block_n: int = 1024,
    block_codes: int = 2048,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """argmin_j ||z_i - e_j||² over a flattened (N, d) latent batch.

    ``use_pallas=None`` auto-dispatches: the fused kernel on TPU backends
    (when shapes tile), XLA everywhere else."""
    n = z.shape[0]
    if use_pallas is None:
        use_pallas = (
            jax.default_backend() in ("tpu", "axon")
            and n % min(block_n, n) == 0
            and codes.shape[0] % min(block_codes, codes.shape[0]) == 0
        )
    if use_pallas:
        return _nearest_codes_pallas(
            z, codes, block_n=block_n, block_codes=block_codes
        )
    return _nearest_codes_xla(z, codes)
