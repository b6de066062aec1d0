"""Multi-head attention math with the reference's exact mask semantics.

Semantics mirror /root/reference/models/softmax_attention.py:48-82:
  - scores = (q * scale) @ k^T
  - ``context_mask`` is a *keep* mask of shape (b, tk): False positions are
    filled with -1e9 before softmax (broadcast as (b, 1, 1, tk)).
  - ``causal_mask`` is an *exclude* mask of shape (tq, tk): True positions
    (the strict upper triangle in the reference) are filled with -1e9.

This is the XLA path; ``flash_attention`` (Pallas, online softmax, no t²
materialization) is dispatched to by the model layer when masks allow.
"""

from __future__ import annotations

import jax.numpy as jnp

MASK_FILL = -1e9


def multihead_attention(
    q: jnp.ndarray,  # (b, h, tq, d)
    k: jnp.ndarray,  # (b, h, tk, d)
    v: jnp.ndarray,  # (b, h, tk, d)
    *,
    scale: float,
    causal_mask: jnp.ndarray | None = None,  # (tq, tk) bool, True = exclude
    context_mask: jnp.ndarray | None = None,  # (b, tk) bool, True = keep
) -> jnp.ndarray:
    orig_dtype = q.dtype
    scores = jnp.einsum(
        "bhid,bhjd->bhij", q * scale, k, preferred_element_type=jnp.float32
    )
    if context_mask is not None:
        keep = context_mask[:, None, None, :]
        scores = jnp.where(keep, scores, MASK_FILL)
    if causal_mask is not None:
        scores = jnp.where(causal_mask[None, None, :, :], MASK_FILL, scores)
    probs = _softmax(scores).astype(orig_dtype)
    return jnp.einsum("bhij,bhjd->bhid", probs, v)


def _softmax(scores: jnp.ndarray) -> jnp.ndarray:
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def make_causal_mask(tq: int, tk: int | None = None) -> jnp.ndarray:
    """Strict upper-triangular exclude mask, as built by the reference's
    ``get_decoder_mask`` (/root/reference/models/transformer.py:165-174)."""
    tk = tq if tk is None else tk
    i = jnp.arange(tq)[:, None]
    j = jnp.arange(tk)[None, :]
    return j > i + (tk - tq)
