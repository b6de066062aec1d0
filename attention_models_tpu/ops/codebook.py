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


def _nn_kernel(zt_ref, codes_t_ref, idx_ref, best_d_ref, *, block_codes: int):
    # grid (n/bn, k/bk); the code-chunk axis is the minor (sequential) grid
    # dim, so per-token running (min, argmin) accumulates in VMEM scratch.
    # Inputs come in transposed (d, ·) layout: with codebook_dim ~32 < the
    # 128-lane tile, a (·, d) layout would pad every buffer 4x in VMEM.
    # The score block is laid out (bk, bn) — CODES on sublanes, TOKENS on
    # lanes — so the min/argmin runs down the sublane axis as elementwise
    # vreg combines instead of a cross-lane shuffle tree (the lane-axis
    # argmin was ~2.4 ms of the 2.48 ms recon codebook slice on v5e).
    # zt_ref: (d, bn); codes_t_ref: (d, bk); idx_ref/best_d_ref: (1, bn)
    cb = pl.program_id(1)

    @pl.when(cb == 0)
    def _():
        best_d_ref[:] = jnp.full_like(best_d_ref, jnp.inf)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    # dots run on the input dtype with f32 accumulation (MXU native); the
    # fp32 fidelity path (golden bit-match) passes fp32 operands and gets
    # exact fp32 passes via HIGHEST precision.
    zt = zt_ref[:]  # (d, bn)
    ct = codes_t_ref[:]  # (d, bk)
    ctf = ct.astype(jnp.float32)
    e_sq = jnp.sum(ctf * ctf, axis=0)[:, None]  # (bk, 1) fp32
    dots = jax.lax.dot_general(
        ct, zt,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.HIGHEST
                   if zt.dtype == jnp.float32 else jax.lax.Precision.DEFAULT),
    )  # (bk, bn) fp32
    d = e_sq - 2.0 * dots
    local_min = jnp.min(d, axis=0, keepdims=True)  # (1, bn)
    local_arg = (
        jnp.argmin(d, axis=0, keepdims=True).astype(jnp.int32)  # first-lowest
        + cb * block_codes
    )
    upd = local_min < best_d_ref[:]  # strict: earlier chunk wins ties
    best_d_ref[:] = jnp.where(upd, local_min, best_d_ref[:])
    idx_ref[:] = jnp.where(upd, local_arg, idx_ref[:])


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

    zt = z.T  # (d, n)
    ct = codes.T  # (d, k)

    kernel = functools.partial(_nn_kernel, block_codes=bk)
    out = pl.pallas_call(
        kernel,
        grid=(n // bn, k // bk),
        in_specs=[
            pl.BlockSpec((d, bn), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, bk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bn), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * k * d,
            bytes_accessed=(n * d + k * d + n) * 4,
            transcendentals=0,
        ),
    )(zt, ct)
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
    block_n: int = 1024,  # swept on v5e: transposed layout ~8% over lane-axis
    block_codes: int = 2048,  # (bk, bn) fp32 scores must fit 16MB scoped VMEM
    use_pallas: bool | None = None,
    dot_dtype: jnp.dtype | None = None,
) -> jnp.ndarray:
    """argmin_j ||z_i - e_j||² over a flattened (N, d) latent batch.

    ``use_pallas=None`` auto-dispatches: the fused kernel on TPU backends
    (when shapes tile), XLA everywhere else.

    ``dot_dtype=jnp.bfloat16`` runs the distance dots on bf16 operands with
    f32 accumulation (one MXU pass instead of the six-pass exact-fp32
    decomposition HIGHEST precision costs — measured 5.75 -> 2.20 ms at the
    256px recon shape on v5e). The models enable this only when ``z`` was
    itself produced by a bf16 tower, where exact-fp32 dots add no fidelity;
    the golden bit-match contract (fp32 models) keeps ``dot_dtype=None``."""
    n = z.shape[0]
    # indices are integers — no gradient flows; cutting tangents here keeps
    # the Pallas call out of autodiff tracing (it has no JVP rule)
    z = jax.lax.stop_gradient(z)
    codes = jax.lax.stop_gradient(codes)
    if dot_dtype is not None:
        z = z.astype(dot_dtype)
        codes = codes.astype(dot_dtype)
    if use_pallas is None:
        from attention_models_tpu.ops.dispatch import on_tpu

        use_pallas = (
            on_tpu()
            and n % min(block_n, n) == 0
            and codes.shape[0] % min(block_codes, codes.shape[0]) == 0
        )
    if use_pallas:
        return _nearest_codes_pallas(
            z, codes, block_n=block_n, block_codes=block_codes
        )
    return _nearest_codes_xla(z, codes)
