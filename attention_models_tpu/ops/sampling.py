"""Sampling and masking ops for the token-space generators.

Matches the reference's semantics (with fixes noted):

- ``cosine_schedule``: cos(t·π/2) (/root/reference/models/muse.py:17-18).
- ``filter_logits``: despite the top-p name, the reference keeps the top
  ``ceil((1-p)·C)`` classes by *count* (/root/reference/models/muse.py:20-26)
  — i.e. top-k with k derived from p. Reproduced exactly.
- ``gumbel_argmax``: the reference samples via
  ``gumbel_softmax(logits, tau).argmax()``; argmax((x+g)/τ) is τ-invariant,
  so its temperature annealing is a no-op (and τ=0 at the final step divides
  by zero). We implement the *intent* (google-research/maskgit): noise scaled
  by temperature, ``argmax(logits + τ·gumbel)``, so τ→0 anneals to greedy.
  Documented deviation (SURVEY.md §2.9 resolution policy).
- ``random_mask``: Muse's vectorized cosine-schedule masking
  (/root/reference/models/muse.py:136-151), which also fixes MaskGIT's
  ``torch.random(b)`` crash (§2.9#2).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def cosine_schedule(t: jnp.ndarray) -> jnp.ndarray:
    return jnp.cos(t * (math.pi / 2))


def filter_logits(
    logits: jnp.ndarray, p: float = 0.9, approx: bool = False
) -> jnp.ndarray:
    """Keep the top ceil((1-p)·C) classes, fill the rest with -inf.

    ``approx=True`` finds the threshold by counting bisection
    (kth_value_bisect) instead of a TPU sort — full recall of the top-k
    set (a few borderline extras can survive value ties). Exact mode
    matches the reference's topk+scatter semantics: exactly k classes
    survive with exactly the reference's surviving values; when several
    classes tie at the k-th value, lax.top_k keeps the lowest-index ones
    (torch.topk's tie order is implementation-defined) — tied classes have
    equal logits, so the sampling distribution over values is unchanged."""
    n_classes = logits.shape[-1]
    k = math.ceil((1 - p) * n_classes)
    if approx:
        # compare in fp32 — the bisection threshold sits just BELOW the
        # true k-th value, and rounding it to bf16 could round it up past
        # that value, dropping real top-k members
        kth = kth_value_bisect(logits, k)[..., None]
        keep = logits.astype(jnp.float32) >= kth
        return jnp.where(keep, logits, -jnp.inf)
    vals, idx = jax.lax.top_k(logits, k)
    return jnp.put_along_axis(
        jnp.full_like(logits, -jnp.inf), idx, vals, axis=-1, inplace=False
    )


def gumbel_argmax(
    key: jax.Array, logits: jnp.ndarray, temperature: jnp.ndarray | float = 1.0
) -> jnp.ndarray:
    """argmax(logits + temperature · Gumbel noise) over the last axis."""
    g = jax.random.gumbel(key, logits.shape, dtype=jnp.float32)
    noised = logits.astype(jnp.float32) + jnp.asarray(temperature, jnp.float32) * g
    return jnp.argmax(noised, axis=-1).astype(jnp.int32)


def kth_value_bisect(
    logits: jnp.ndarray,  # (..., C)
    k: int,
    iters: int = 16,
) -> jnp.ndarray:
    """Per-row k-th-largest THRESHOLD by counting bisection — no sort.

    TPU sorts are the enemy: ``lax.approx_max_k`` at Muse's k=820 of C=8192
    measured 64 ms on (16k, 8192) bf16 logits (26% of a decode step; exact
    ``top_k`` is worse). Bisecting the value range with a rank-count per
    iteration is ``iters`` fused compare+sum passes instead — pure VPU
    streaming. Returns the largest threshold t with count(x >= t) >= k, so
    the kept set is a SUPERSET of the true top-k (full recall; a few extra
    borderline classes can survive when values tie within the final
    2^-iters bracket — the same order of slack as approx_max_k's ~0.95
    recall, in the safe direction)."""
    x = logits.astype(jnp.float32)
    hi = jnp.max(x, axis=-1)  # count(x >= hi) >= 1
    lo = jnp.min(x, axis=-1)  # count(x >= lo) == C >= k

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum((x >= mid[..., None]).astype(jnp.int32), axis=-1)
        keep_up = cnt >= k
        return jnp.where(keep_up, mid, lo), jnp.where(keep_up, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return lo


def sample_topk_filtered(
    key: jax.Array,
    logits: jnp.ndarray,  # (..., C)
    p: float = 0.9,
    temperature: jnp.ndarray | float = 1.0,
    approx: bool = False,
):
    """Fused ``gumbel_argmax(filter_logits(logits, p), temperature)``:
    sample among the top ``ceil((1-p)·C)`` classes without materializing a
    filtered copy of the logits. Returns (pred ids, chosen pre-softmax
    logit) — combine the logit with a full-width logsumexp for the chosen
    class's softmax probability instead of materializing softmax(logits).

    ``approx=False`` (the reference-exact default) extracts the exact
    top-k shortlist and runs the noise + argmax k-wide. ``approx=True``
    avoids the TPU sort entirely: a counting-bisection threshold
    (kth_value_bisect) masks the filtered classes to -inf and the gumbel
    argmax runs full-width — measured ~5x cheaper than approx_max_k at
    Muse's decode shape, with full recall of the top-k set."""
    n_classes = logits.shape[-1]
    k = math.ceil((1 - p) * n_classes)
    if approx:
        kth = kth_value_bisect(logits, k)[..., None]
        x = logits.astype(jnp.float32)
        g = jax.random.gumbel(key, logits.shape, dtype=jnp.float32)
        noised = jnp.where(
            x >= kth, x + jnp.asarray(temperature, jnp.float32) * g, -jnp.inf
        )
        pred = jnp.argmax(noised, axis=-1)
        chosen = jnp.take_along_axis(x, pred[..., None], axis=-1)[..., 0]
        return pred.astype(jnp.int32), chosen.astype(jnp.float32)
    vals, idx = jax.lax.top_k(logits, k)
    g = jax.random.gumbel(key, vals.shape, dtype=jnp.float32)
    noised = vals.astype(jnp.float32) + jnp.asarray(temperature, jnp.float32) * g
    choice = jnp.argmax(noised, axis=-1)
    pred = jnp.take_along_axis(idx, choice[..., None], axis=-1)[..., 0]
    chosen = jnp.take_along_axis(vals, choice[..., None], axis=-1)[..., 0]
    return pred.astype(jnp.int32), chosen.astype(jnp.float32)


def _sample_epilogue_kernel(
    temp_ref,  # SMEM (1, 1) f32 — gumbel temperature (varies per decode step)
    seed_ref,  # SMEM (1, 2) int32 — PRNG seed words from the step's key
    cond_ref,  # (bn, C) model dtype
    *rest,  # [null_ref (bn, C)] + [noise_ref (bn, C) int32] + pred, score
    guidance_scale,
    k: int,
    iters: int,
    has_null: bool,
    external_noise: bool,
):
    refs = list(rest)
    null_ref = refs.pop(0) if has_null else None
    noise_ref = refs.pop(0) if external_noise else None
    pred_ref, score_ref = refs

    x = cond_ref[...].astype(jnp.float32)  # (bn, C)
    if has_null:
        null = null_ref[...].astype(jnp.float32)
        x = null + guidance_scale * (x - null)

    # counting-bisection top-k threshold (see kth_value_bisect) — x stays
    # VMEM-resident, so the 16 count passes cost VPU only, no HBM re-reads
    rmax = jnp.max(x, axis=-1, keepdims=True)  # reused as the lse max
    lo = jnp.min(x, axis=-1, keepdims=True)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum((x >= mid).astype(jnp.int32), axis=-1, keepdims=True)
        up = cnt >= k
        return jnp.where(up, mid, lo), jnp.where(up, hi, mid)

    kth, _ = jax.lax.fori_loop(0, iters, body, (lo, rmax))

    if external_noise:  # test path: deterministic bits fed from outside
        bits = noise_ref[...]
    else:
        # Mosaic seeds take at most 2 words; fold the program id into one
        pltpu.prng_seed(seed_ref[0, 0], seed_ref[0, 1] + pl.program_id(0))
        bits = pltpu.prng_random_bits(x.shape)
    ubits = pltpu.bitcast(bits, jnp.uint32) >> jnp.uint32(8)  # 24 bits
    # Mosaic has no uint32->f32 cast; the top bit is 0 after the shift, so
    # the int32 view is non-negative and casts exactly
    u = (pltpu.bitcast(ubits, jnp.int32).astype(jnp.float32)
         * (2.0 ** -24) + 2.0 ** -25)  # (0, 1)
    g = -jnp.log(-jnp.log(u))

    noised = jnp.where(x >= kth, x + temp_ref[0, 0] * g, -jnp.inf)
    pred = jnp.argmax(noised, axis=-1).astype(jnp.int32)  # (bn,)
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) == pred[:, None]
    )
    chosen = jnp.sum(jnp.where(onehot, x, 0.0), axis=-1, keepdims=True)
    # softmax prob of the chosen class: exp(chosen - logsumexp(x))
    lse = rmax + jnp.log(
        jnp.sum(jnp.exp(x - rmax), axis=-1, keepdims=True)
    )
    pred_ref[...] = pred[:, None]
    score_ref[...] = jnp.exp(chosen - lse)


def _seed_words(rng) -> jnp.ndarray:
    """(1, 2) int32 view of a PRNG key (typed or raw uint32 pair)."""
    data = rng
    if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key):
        data = jax.random.key_data(rng)
    words = jax.lax.bitcast_convert_type(
        data.reshape(-1)[:2], jnp.int32
    )
    return words.reshape(1, 2)


def sample_epilogue_supported(shape, platform: str | None = None) -> bool:
    """(..., C) logits: rows must sublane-tile and C must lane-tile."""
    from attention_models_tpu.ops.dispatch import on_tpu, rows_lane_tileable

    return on_tpu(platform) and rows_lane_tileable(shape, shape[-1])


def sample_epilogue_fused(
    rng: jax.Array,
    logits: jnp.ndarray,  # (..., C) cond logits (or plain logits)
    null_logits: jnp.ndarray | None = None,  # (..., C) for CFG
    *,
    guidance_scale: float = 1.0,
    p: float = 0.9,
    temperature: jnp.ndarray | float = 1.0,
    iters: int = 16,
    interpret: bool = False,
    _noise_bits: jnp.ndarray | None = None,  # test hook: external gumbel bits
):
    """ONE Pallas kernel for the whole decode-step epilogue:
    CFG combine → counting-bisection top-k threshold → temperature-scaled
    gumbel argmax → softmax prob of the chosen class. Returns
    (pred ids (...,), probs (...,) fp32) over the leading dims.

    The unfused chain (XLA) re-reads the (b·n, C) logits from HBM for every
    bisection count, the noise add, the argmax, and the logsumexp — several
    GB per Muse step at C=8192. Here the fp32 combine stays VMEM-resident
    for all of it, and the gumbel noise is generated in-kernel
    (pltpu.prng_random_bits — a different stream than jax.random.gumbel, so
    sampling parity with the XLA path is distributional, like every RNG
    path; see the module docstring note on gumbel semantics)."""
    lead = logits.shape[:-1]
    C = logits.shape[-1]
    rows = math.prod(lead)
    k = math.ceil((1 - p) * C)

    x2 = logits.reshape(rows, C)
    operands = [
        jnp.asarray(temperature, jnp.float32).reshape(1, 1),
        _seed_words(rng),
        x2,
    ]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    for bn in (256, 128, 64, 32, 16, 8):
        if rows % bn == 0:
            break
    else:
        raise ValueError(f"row count {rows} does not sublane-tile")
    blk = pl.BlockSpec((bn, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    in_specs.append(blk)
    if null_logits is not None:
        operands.append(null_logits.reshape(rows, C))
        in_specs.append(blk)
    if _noise_bits is not None:
        operands.append(_noise_bits.reshape(rows, C))
        in_specs.append(
            pl.BlockSpec((bn, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        )

    out_blk = pl.BlockSpec((bn, 1), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _sample_epilogue_kernel,
        guidance_scale=guidance_scale, k=k, iters=iters,
        has_null=null_logits is not None,
        external_noise=_noise_bits is not None,
    )
    pred, score = pl.pallas_call(
        kernel,
        grid=(rows // bn,),
        in_specs=in_specs,
        out_specs=[out_blk, out_blk],
        out_shape=[
            jax.ShapeDtypeStruct((rows, 1), jnp.int32),
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    return pred.reshape(lead), score.reshape(lead)


def random_mask(
    key: jax.Array, batch: int, seq_len: int
) -> jnp.ndarray:
    """Training-time mask: per-sample uniform timestep -> cosine mask rate ->
    mask the ``round(rate·seq_len)`` (min 1) tokens of a random permutation.
    Returns bool (batch, seq_len), True = masked."""
    t_key, perm_key = jax.random.split(key)
    timesteps = jax.random.uniform(t_key, (batch,))
    mask_prob = jnp.clip(cosine_schedule(timesteps), 0.0, None)
    num_masked = jnp.clip(jnp.round(seq_len * mask_prob), 1, None)  # (b,)
    rand = jax.random.uniform(perm_key, (batch, seq_len))
    # rank of each position via one sort + iota scatter (same trick as
    # lowest_score_mask below — saves the second full sort per train step)
    return lowest_score_mask(rand, num_masked[:, None])


def mask_fill_inputs_and_targets(
    indices: jnp.ndarray,  # (b, n) int
    mask: jnp.ndarray,  # (b, n) bool
    mask_token_id: int,
    ignore_index: int = -1,
):
    """input = indices with masked positions -> mask token;
    target = indices with *unmasked* positions -> ignore_index
    (/root/reference/models/muse.py:147-150)."""
    inputs = jnp.where(mask, mask_token_id, indices)
    targets = jnp.where(mask, indices, ignore_index)
    return inputs, targets


def lowest_score_mask(
    scores: jnp.ndarray,  # (b, n) float; lower = less confident
    num_to_mask: jnp.ndarray,  # scalar int (traced ok)
) -> jnp.ndarray:
    """Mask the ``num_to_mask`` lowest-scoring positions per row — the
    confidence re-masking step of MaskGIT/Muse decode
    (/root/reference/models/muse.py:199-208). Ties break toward earlier
    positions, matching argsort-stable torch behavior. One sort + scatter
    instead of a double argsort."""
    n = scores.shape[-1]
    order = jnp.argsort(scores, axis=-1, stable=True)  # (b, n)
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), scores.shape)
    ranks = jnp.zeros(scores.shape, jnp.int32).at[
        jnp.arange(scores.shape[0])[:, None], order
    ].set(iota)
    return ranks < num_to_mask


def cross_entropy_ignore_index(
    logits: jnp.ndarray,  # (b, n, c)
    targets: jnp.ndarray,  # (b, n) int, ignore_index entries skipped
    ignore_index: int = -1,
) -> jnp.ndarray:
    """Mean CE over non-ignored positions (torch F.cross_entropy semantics)."""
    valid = targets != ignore_index
    safe_targets = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_targets[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    # broadcast the valid count to nll's shape: targets (1, n) against
    # logits (b, n, c) contribute b*n positions to the mean, not n (hit by
    # MUSE.init_all's text-batch > image-batch init shapes)
    n_valid = jnp.sum(jnp.broadcast_to(valid, nll.shape))
    return jnp.sum(nll) / jnp.maximum(n_valid, 1)
