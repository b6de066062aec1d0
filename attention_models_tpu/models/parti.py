"""Parti-style autoregressive text-to-image (API parity with
/root/reference/models/parti.py:49-155).

Teacher-forced training: start-token + shifted VQ indices, causal decoder
with cross-attention to frozen CLIP text embeds, CE over the full index
sequence. Generation is KV-cached single-token decode (the reference
re-forwards the whole growing prefix each step and discards its init/final
norm results — both fixed per SURVEY.md §2.9#9; norms are applied here).

Reference quirk FIXED (round 4): the reference applies ``context_norm`` in
the training forward but not in generate (parti.py:99 vs 131) — cross-
attention would see differently-scaled context at decode time than it was
trained on. Applied in ``prepare_context`` now, same resolution class as
SURVEY.md §2.9#9 (apply the computed norms). (Empirically the drift is
small because the CLIP tower's own final LN already normalizes, but a
train/decode mismatch is a latent bug either way.)

Decode-robustness note (r4 coco_mini experiment): the KV-cache path is
numerically faithful — first-step logits match the teacher-forced forward
to bf16 noise (0.09 absolute on the trained checkpoint) with identical
argmax — but free-running AR decode needs per-token accuracy far above
teacher-forced CE suggests: at 99% TF token accuracy (~CE 3e-3), greedy
decode compounds ~10 early errors over 1024 steps and can derail
off-manifold, which iterative bidirectional decoders (MaskGIT/Muse)
self-correct by design. Train AR overfits to ~99.9% token accuracy
(longer cosine decay) before expecting pixel-faithful free-running decode.
"""

from __future__ import annotations

from collections import OrderedDict

import jax
import jax.numpy as jnp
import flax.linen as nn

from attention_models_tpu.models.layers import (
    LayerNorm,
    SinusoidalPositionalEncoding,
)
from attention_models_tpu.models.text_encoder import TextEncoder
from attention_models_tpu.models.transformer import Decoder
from attention_models_tpu.models.vq_common import (
    build_vq,
    vq_codebook_size,
    vq_num_patches,
)
from attention_models_tpu.ops.sampling import filter_logits, gumbel_argmax


class _QuantDense(nn.Module):
    """nn.Dense twin (identical kernel/bias params and init) whose matmul
    runs W8A8 via ops/quant.py::quant_dot — used for Parti's to_logits head
    (dim → codebook_size, the largest per-step matmul in cached decode)
    when ``quant="int8"``, mirroring the quantized logit heads of
    BiDirectionalTransformer / BidirectionalDecoder."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from attention_models_tpu.ops.quant import quant_dot

        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (x.shape[-1], self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return quant_dot(x, kernel, out_dtype=self.dtype) \
            + bias.astype(self.dtype)


class _XentHead(nn.Module):
    """nn.Dense twin (identical kernel/bias params, init, and dtype math)
    that can also return the teacher-forcing CE loss directly: with
    ``targets`` it routes the head matmul + softmax through the fused
    Pallas head-xent kernel on TPU — the (N, vocab) logits never reach HBM
    (ops/xent.py). Reference loss formulation: parti.py:76-83."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, targets=None):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (x.shape[-1], self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        if targets is not None:
            from attention_models_tpu.ops.sampling import (
                cross_entropy_ignore_index,
            )
            from attention_models_tpu.ops.xent import (
                fused_head_xent,
                head_xent_supported,
            )

            # Parti's loss is an unmasked mean (every position trains), so
            # ignore_index=-1 with non-negative labels reduces to the mean.
            if head_xent_supported(x.shape, x.shape[-1], self.features):
                return fused_head_xent(x, kernel, targets, bias=bias)
            logits = (jnp.dot(x, kernel.astype(self.dtype))
                      + bias.astype(self.dtype))
            return cross_entropy_ignore_index(logits, targets)
        return (jnp.dot(x, kernel.astype(self.dtype))
                + bias.astype(self.dtype))


class Parti(nn.Module):
    dim: int
    vq_config: dict  # {"kind": "vqgan"|"vitvqgan", ...constructor args}
    max_length: int = 77
    n_heads: int = 8
    d_head: int = 64
    depth: int = 6
    clip_width: int = 768
    clip_layers: int = 12
    clip_heads: int = 12
    dtype: jnp.dtype = jnp.float32
    scan_layers: bool = False
    pp_microbatches: int | None = None
    quant: str | None = None  # "int8": W8A8 decode (inference-only opt-in)
    # CFG conditioning dropout (keep-prob, MUSE semantics — muse.py:169-170).
    # The reference's Parti has no CFG at all (its TODO at parti.py:47);
    # 1.0 keeps training reference-exact, < 1.0 trains the null-context
    # stream that generate(guidance_scale>0) interpolates against.
    cond_keep_prob: float = 1.0

    def setup(self):
        self.vq = build_vq(self.vq_config, dtype=self.dtype)
        self.codebook_size = vq_codebook_size(self.vq_config)
        self.num_patches = vq_num_patches(self.vq_config)

        self.text_encoder = TextEncoder(
            self.dim, self.max_length, project=False,
            clip_width=self.clip_width, clip_layers=self.clip_layers,
            clip_heads=self.clip_heads, dtype=self.dtype,
        )
        self.context_norm = LayerNorm(self.clip_width, dtype=self.dtype)
        self.start_token = self.param(
            "start_token", nn.initializers.normal(1.0), (self.dim,), jnp.float32
        )
        self.token_emb = nn.Embed(self.codebook_size, self.dim, dtype=self.dtype)
        self.pos_enc = SinusoidalPositionalEncoding(self.dim)
        self.transformer_decoder = Decoder(
            self.dim, self.n_heads, self.d_head, self.depth, dtype=self.dtype,
            max_decode_len=self.num_patches, scan=self.scan_layers,
            pp_microbatches=self.pp_microbatches, quant=self.quant,
        )
        self.init_norm = LayerNorm(self.dim, dtype=self.dtype)
        self.final_norm = LayerNorm(self.dim, dtype=self.dtype)
        if self.quant == "int8":
            self.to_logits = _QuantDense(self.codebook_size, dtype=self.dtype)
        else:
            self.to_logits = _XentHead(self.codebook_size, dtype=self.dtype)

    def _embed_prefix(self, indices, deterministic: bool = True):
        """start token + embedded indices, with sinusoidal PE applied to the
        index embeddings BEFORE the start token is prepended (parti.py:104-110
        order preserved)."""
        b = indices.shape[0]
        x = self.token_emb(indices)
        x = self.pos_enc(x, deterministic=deterministic)
        start = jnp.broadcast_to(
            self.start_token.astype(x.dtype), (b, 1, self.dim)
        )
        return jnp.concatenate([start, x], axis=1)

    def init_all(self, text_ids, imgs):
        """Init-time path touching every parameter (incl. the VQ decoder)."""
        loss = self(text_ids, imgs)
        idx = jnp.zeros((imgs.shape[0], self.num_patches), jnp.int32)
        self.vq.decode_indices(idx)
        return loss

    # -- training ----------------------------------------------------------------
    def __call__(self, text_ids, imgs, deterministic: bool = True):
        labels = self.encode_to_indices(imgs)
        return self.loss_from_indices(text_ids, labels, deterministic)

    def encode_to_indices(self, imgs):
        """Frozen-tokenizer image -> token grid (b, n). Deterministic, so
        trainers may cache it per sample (training.cache_vq_tokens)."""
        return jax.lax.stop_gradient(self.vq.encode_imgs(imgs))

    def loss_from_indices(self, text_ids, labels, deterministic: bool = True):
        """Teacher-forced CE from precomputed VQ tokens — the forward minus
        the image encoder, for token-cached training."""
        text_embeds = jax.lax.stop_gradient(self.text_encoder(text_ids))
        text_embeds = self.context_norm(text_embeds)
        if self.cond_keep_prob < 1.0 and not deterministic:
            keep = (
                jax.random.uniform(
                    self.make_rng("dropout"), (text_embeds.shape[0], 1, 1)
                )
                < self.cond_keep_prob
            )
            text_embeds = text_embeds * keep.astype(text_embeds.dtype)

        dec_in = self._embed_prefix(labels[:, :-1], deterministic=deterministic)
        dec_in = self.init_norm(dec_in)
        dec_out = self.transformer_decoder(
            dec_in, text_embeds, causal=True, deterministic=deterministic
        )
        dec_out = self.final_norm(dec_out)
        if isinstance(self.to_logits, _XentHead):
            return self.to_logits(dec_out, targets=labels)
        logits = self.to_logits(dec_out)  # int8 eval-loss path

        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        return jnp.mean(nll)

    # -- KV-cached AR decode -------------------------------------------------------
    def decode_step(self, tok_embed, context):
        """One cached decoder step. tok_embed: (b, 1, dim)."""
        x = self.init_norm(tok_embed)
        x = self.transformer_decoder(x, context, decode=True)
        x = self.final_norm(x)
        return self.to_logits(x)

    def prepare_context(self, text_ids):
        # context_norm applied, matching the training forward (the
        # reference's generate skips it, parti.py:131 — a train/decode
        # mismatch that measurably breaks free-running decode; module
        # docstring has the experiment)
        return self.context_norm(self.text_encoder(text_ids))

    def embed_token(self, indices, pos):
        """Embed one generated token for step pos (position pos in the PE
        table, since the start token carries no PE)."""
        x = self.token_emb(indices)  # (b, 1, dim)
        pe = self.pos_enc.pe_table()
        return x + pe[pos][None, None, :].astype(x.dtype)

    def start_embed(self, batch: int):
        return jnp.broadcast_to(
            self.start_token.astype(self.dtype), (batch, 1, self.dim)
        )


# Jitted decode programs, one per (model, sampling knobs). Keyed by id()
# with the model object held in the value so the id can never be reused
# while the entry is alive; LRU so the hottest model's compiled program
# survives eviction pressure. Without this every parti_generate call built
# a FRESH jax.jit closure — correct but re-traced per call, which dominated
# wall clock for repeated serving calls (measured 18.4 ms/"step" re-tracing
# vs 0.8 ms/step for the compiled loop at b=8 t=1024 on v5e).
_RUN_CACHE: "OrderedDict" = OrderedDict()
_RUN_CACHE_MAX = 16


def _parti_run(model: Parti, filter_p: float, approx_topk: bool,
               guidance_scale: float = 0.0, temperature: float = 1.0):
    try:
        key = (id(model), float(filter_p), bool(approx_topk),
               float(guidance_scale), float(temperature))
    except (TypeError, jax.errors.ConcretizationTypeError):
        # filter_p/approx_topk is a tracer (parti_generate called under an
        # outer jit with traced knobs): skip the cache, close over the
        # tracers as the pre-cache code did — the nested jit inlines.
        key = None
    hit = _RUN_CACHE.get(key) if key is not None else None
    if hit is not None:
        _RUN_CACHE.move_to_end(key)  # LRU: a hit refreshes recency
        return hit[0]

    n = vq_num_patches(model.vq_config)

    # guidance_scale > 0: classifier-free guidance over two decoder streams
    # folded into one 2b batch (the MUSE one-forward trick, muse.py CFG rule
    # `null + g*(cond - null)` replacing the reference's TODO at
    # /root/reference/models/parti.py:47). Both streams consume the SAME
    # sampled token each step, so only the contexts differ (real vs zeroed).
    try:
        cfg_on = bool(guidance_scale)
    except jax.errors.TracerBoolConversionError as e:
        raise ValueError(
            "guidance_scale must be a static Python number: it selects "
            "between the single-stream and the 2b-batch CFG decode programs "
            "(a traced value cannot change the program structure). Call "
            "parti_generate with a concrete float, outside jit or as a "
            "static argument."
        ) from e
    try:
        greedy = temperature == 0
    except jax.errors.TracerBoolConversionError:
        greedy = False  # traced temperature: keep the sampling program

    @jax.jit
    def run(variables, text_ids, rng):
        b = text_ids.shape[0]
        ctx = model.apply(variables, text_ids, method=Parti.prepare_context)
        if cfg_on:
            ctx = jnp.concatenate([ctx, jnp.zeros_like(ctx)], axis=0)
        sb = 2 * b if cfg_on else b  # stream batch
        tok0 = model.apply(variables, sb, method=Parti.start_embed)
        # materialize a fresh zeroed cache (cache_index = 0)
        _, vars0 = model.apply(
            variables, tok0, ctx, method=Parti.decode_step, mutable=["cache"]
        )
        cache = jax.tree.map(jnp.zeros_like, vars0["cache"])

        indices0 = jnp.zeros((b, n), jnp.int32)
        rngs = jax.random.split(rng, n)
        # PE table hoisted out of the loop body: left inside embed_token,
        # XLA re-evaluated the (max_len, dim) sin/cos build every step
        # (measured 0.13 ms/step of the 0.8)
        pe = model.apply(variables, method=lambda m: m.pos_enc.pe_table())

        def body(i, carry):
            indices, tok, cache = carry
            logits, upd = model.apply(
                {**variables, "cache": cache}, tok, ctx,
                method=Parti.decode_step, mutable=["cache"],
            )
            last = logits[:, -1, :]
            if cfg_on:
                cond, null = last[:b], last[b:]
                last = null + guidance_scale * (cond - null)
            filt = filter_logits(last, filter_p, approx=approx_topk)
            if greedy:
                # temperature 0: deterministic argmax decode — the right
                # eval mode for memorization/overfit checks (one sampled
                # off-distribution token derails a free-running AR decode
                # even at train loss ~1e-3) and a standard serving knob
                nxt = jnp.argmax(filt, axis=-1).astype(jnp.int32)
            else:
                nxt = gumbel_argmax(rngs[i], filt, temperature)  # (b,)
            indices = jax.lax.dynamic_update_slice(indices, nxt[:, None], (0, i))
            emb = model.apply(variables, nxt[:, None],
                              method=lambda m, ix: m.token_emb(ix))
            emb = emb + pe[i][None, None, :].astype(emb.dtype)
            tok = jnp.concatenate([emb, emb], axis=0) if cfg_on else emb
            return indices, tok, upd["cache"]

        indices, _, _ = jax.lax.fori_loop(0, n, body, (indices0, tok0, cache))
        return model.apply(variables, indices, method=lambda m, ix: m.vq.decode_indices(ix))

    if key is not None:
        if len(_RUN_CACHE) >= _RUN_CACHE_MAX:
            _RUN_CACHE.popitem(last=False)  # evict least-recently used
        _RUN_CACHE[key] = (run, model)  # hold model: keeps id(model) valid
    return run


def _parti_run_host(model: Parti, filter_p: float, guidance_scale: float,
                    temperature: float):
    """Host-stepped AR decode: the SAME jitted single-token decode-step
    program as ``_parti_run``'s loop body, dispatched once per token from
    the host, with filtering/sampling on the host.

    This is the axon-backend mitigation path (tools/axon_decode_repro.py):
    the defect needs the full model inside one long-running ``fori_loop``
    — the identical step dispatched per token from the host decodes every
    batch row correctly (r4+r5 investigation; the r4 odd-batch-position
    layout trick was INVALIDATED in r5: at the doubled batch the corruption
    pattern moves and hits the re-laid-out rows too). Costs one tunnel
    round-trip per token (~1.5 ms) plus a (b, vocab) fp32 logits fetch.

    Greedy (temperature=0) decode bit-matches the device loop: bf16→fp32
    is monotone and top-p filtering never removes the argmax. Sampled
    decode draws host-side Gumbel noise from a seed derived from ``rng``
    (a different stream than the device path's — both are valid samples
    of the same filtered distribution). CFG logits mix in fp32."""
    import math as _math

    cfg_on = bool(guidance_scale)
    greedy = temperature == 0
    # jitted pieces depend only on the CFG structure (scale mixes on host)
    key = ("host", id(model), cfg_on)
    hit = _RUN_CACHE.get(key)
    if hit is not None:
        _RUN_CACHE.move_to_end(key)
        prep, step, embed, decode_imgs = hit[0]
    else:
        @jax.jit
        def prep(variables, text_ids):
            b = text_ids.shape[0]
            ctx = model.apply(variables, text_ids,
                              method=Parti.prepare_context)
            if cfg_on:
                ctx = jnp.concatenate([ctx, jnp.zeros_like(ctx)], axis=0)
            sb = 2 * b if cfg_on else b
            tok0 = model.apply(variables, sb, method=Parti.start_embed)
            _, vars0 = model.apply(variables, tok0, ctx,
                                   method=Parti.decode_step,
                                   mutable=["cache"])
            cache = jax.tree.map(jnp.zeros_like, vars0["cache"])
            pe = model.apply(variables,
                             method=lambda m: m.pos_enc.pe_table())
            return ctx, tok0, cache, pe

        @jax.jit
        def step(variables, tok, ctx, cache):
            logits, upd = model.apply(
                {**variables, "cache": cache}, tok, ctx,
                method=Parti.decode_step, mutable=["cache"])
            return logits[:, -1, :].astype(jnp.float32), upd["cache"]

        @jax.jit
        def embed(variables, nxt, pe, i):
            emb = model.apply(variables, nxt[:, None],
                              method=lambda m, ix: m.token_emb(ix))
            pe_i = jax.lax.dynamic_slice_in_dim(pe, i, 1, axis=0)
            emb = emb + pe_i[None, :, :].astype(emb.dtype)
            return jnp.concatenate([emb, emb], axis=0) if cfg_on else emb

        @jax.jit
        def decode_imgs(variables, indices):
            return model.apply(variables, indices,
                               method=lambda m, ix: m.vq.decode_indices(ix))

        if len(_RUN_CACHE) >= _RUN_CACHE_MAX:
            _RUN_CACHE.popitem(last=False)
        _RUN_CACHE[key] = ((prep, step, embed, decode_imgs), model)

    n = vq_num_patches(model.vq_config)

    def run(variables, text_ids, rng):
        import numpy as np

        b = text_ids.shape[0]
        ctx, tok, cache, pe = prep(variables, text_ids)
        indices = np.zeros((b, n), np.int32)
        sampler = None
        if not greedy:
            seed = np.asarray(jax.random.key_data(rng)).ravel()
            sampler = np.random.default_rng(
                [int(x) & 0x7FFFFFFF for x in seed])
        for i in range(n):
            last_d, cache = step(variables, tok, ctx, cache)
            last = np.asarray(last_d)  # (sb, vocab) fp32
            if cfg_on:
                cond, null = last[:b], last[b:]
                last = null + guidance_scale * (cond - null)
            if greedy:
                nxt = last.argmax(-1).astype(np.int32)
            else:
                # host top-p (keep top ceil((1-p)·C), matching
                # ops/sampling.filter_logits) + Gumbel sample
                k = _math.ceil((1 - filter_p) * last.shape[-1])
                kth = np.partition(last, -k, axis=-1)[:, -k][:, None]
                filt = np.where(last >= kth, last, -np.inf)
                g = sampler.gumbel(size=filt.shape)
                nxt = (filt + temperature * g).argmax(-1).astype(np.int32)
            indices[:, i] = nxt
            tok = embed(variables, jnp.asarray(nxt), pe,
                        jnp.asarray(i, jnp.int32))
        return decode_imgs(variables, jnp.asarray(indices))

    return run


def parti_generate(
    model: Parti,
    variables,
    text_ids,
    rng: jax.Array,
    filter_p: float = 0.9,
    approx_topk: bool = True,
    guidance_scale: float = 0.0,
    temperature: float = 1.0,
    axon_workaround: bool = False,
) -> jnp.ndarray:
    """AR generation with a KV cache: one jitted lax.fori_loop over
    num_patches single-token decoder steps, then VQ decode. The jitted
    program is cached per (model, knobs) so repeated calls don't re-trace.

    ``guidance_scale > 0`` enables classifier-free guidance — conditional and
    null-context streams folded into one 2b batch, logits mixed per step as
    ``null + g*(cond - null)`` (MUSE's rule; the reference's Parti never
    implemented its CFG TODO, /root/reference/models/parti.py:47). Train with
    ``cond_keep_prob < 1`` so the null stream is meaningful; ``g = 1`` is
    exactly the conditional stream (reduces to the unguided decode).

    ``temperature`` scales the gumbel noise (the reference hardcodes tau=1,
    parti.py:149); ``0.0`` switches to deterministic argmax decode.

    ``axon_workaround=True`` mitigates the tunneled-axon backend defect
    where batch rows of a long cached-decode ``fori_loop`` corrupt
    position-dependently (tools/axon_decode_repro.py is the pinned
    reproducer; docs/ROADMAP.md "Round-4 known issue" has the
    investigation): the decode runs as the SAME jitted single-step program
    dispatched once per token from the host (``_parti_run_host``), which
    the reproducer shows decodes EVERY row correctly on the affected
    backend. (The r4 odd-batch-position layout trick was invalidated in
    r5 — at the doubled batch the corruption hits the re-laid-out rows
    too.) Costs one tunnel round-trip per token; greedy decode bit-equals
    the plain path on healthy backends (tested on the CPU mesh). Off by
    default — it is a backend mitigation, not model semantics."""
    if axon_workaround:
        return _parti_run_host(model, filter_p, guidance_scale,
                               temperature)(variables, text_ids, rng)
    return _parti_run(model, filter_p, approx_topk, guidance_scale,
                      temperature)(variables, text_ids, rng)
