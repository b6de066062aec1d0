"""Muse (arXiv 2301.00704; API parity with /root/reference/models/muse.py):
text-conditioned MaskGIT with classifier-free guidance.

Differences from the reference, all deliberate and documented:
  - The CFG double forward (cond + null context) is batched as a single 2b
    forward per decode step (SURVEY.md §7.6).
  - Text conditioning flows in as token ids (host tokenizes; see
    models/text_encoder.tokenize) so the whole step jits.
  - ``embeds_drop_prob`` keeps the reference's keep-prob semantics (0.9 keep
    = 10% unconditional, §2.9#10) under the clearer name ``cond_keep_prob``
    while the constructor still accepts the old knob.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from attention_models_tpu.models.layers import GammaLayerNorm
from attention_models_tpu.models.maskgit import trunc_normal02
from attention_models_tpu.models.text_encoder import TextEncoder
from attention_models_tpu.models.transformer import Decoder
from attention_models_tpu.models.vq_common import (
    build_vq,
    vq_codebook_size,
    vq_num_patches,
)
from attention_models_tpu.ops.sampling import (
    cosine_schedule,
    cross_entropy_ignore_index,
    filter_logits,
    gumbel_argmax,
    sample_epilogue_fused,
    sample_epilogue_supported,
    sample_topk_filtered,
    lowest_score_mask,
    mask_fill_inputs_and_targets,
    random_mask,
)


class BidirectionalDecoder(nn.Module):
    """muse.py:57-96: token emb (+1 mask token), learned pos-enc,
    transformer.Decoder (bidirectional self-attn + cross-attn to text),
    gamma-LN, no-bias head; google-maskgit trunc-normal(0.02) init."""

    dim: int
    codebook_size: int
    n_heads: int
    d_head: int
    depth: int
    mult: float
    dropout: float
    num_patches: int
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    scan_layers: bool = False
    pp_microbatches: int | None = None
    quant: str | None = None  # "int8": W8A8 inference path (ops/quant.py)

    @nn.compact
    def __call__(self, indices, context, context_mask=None,
                 deterministic: bool = True, targets=None):
        """With ``targets`` (training): returns the masked mean CE directly,
        routing the head matmul + softmax through the fused Pallas
        head-xent kernel on TPU — the (N, vocab) logits never reach HBM
        (ops/xent.py). Without ``targets``: returns logits (decode path)."""
        x = nn.Embed(
            self.codebook_size + 1, self.dim, dtype=self.dtype,
            embedding_init=trunc_normal02, name="token_emb",
        )(indices)
        pos = self.param(
            "pos_enc", nn.initializers.normal(1.0),
            (1, self.num_patches, self.dim), jnp.float32,
        )
        x = x + pos.astype(x.dtype)
        x = Decoder(
            self.dim, self.n_heads, self.d_head, self.depth, self.mult,
            self.dropout, dtype=self.dtype, remat=self.remat,
            scan=self.scan_layers, pp_microbatches=self.pp_microbatches,
            quant=self.quant, name="decoder",
        )(x, context, context_mask=context_mask, deterministic=deterministic)
        x = GammaLayerNorm(self.dim, dtype=self.dtype, name="final_norm")(x)
        from attention_models_tpu.models.layers import _DenseKernel

        # same pytree path ("linear/kernel"), init and math as the previous
        # nn.Dense(use_bias=False, dtype) — the raw kernel also feeds the
        # int8 and fused-xent paths
        kernel = _DenseKernel((x.shape[-1], self.codebook_size),
                              kernel_init=trunc_normal02, name="linear")()
        if targets is not None:
            from attention_models_tpu.ops.xent import (
                fused_head_xent,
                head_xent_supported,
            )

            if self.quant is None and head_xent_supported(
                    x.shape, x.shape[-1], self.codebook_size):
                return fused_head_xent(x, kernel, targets)
            if self.quant == "int8":  # eval-loss of a quantized model
                from attention_models_tpu.ops.quant import quant_dot

                logits = quant_dot(x, kernel, out_dtype=self.dtype)
            else:
                logits = jnp.dot(x, kernel.astype(self.dtype))
            return cross_entropy_ignore_index(logits, targets)
        if self.quant == "int8":
            from attention_models_tpu.ops.quant import quant_dot

            return quant_dot(x, kernel, out_dtype=self.dtype)
        return jnp.dot(x, kernel.astype(self.dtype))


class MUSE(nn.Module):
    dim: int
    vq_config: dict
    max_length: int = 77
    n_heads: int = 8
    d_head: int = 64
    depth: int = 6
    mult: float = 4
    cond_keep_prob: float = 0.9  # reference's embeds_drop_prob (keep-prob!)
    dropout: float = 0.0
    guidance_scale: float = 3.0  # hardcoded 3 in the reference (muse.py:217)
    clip_width: int = 768
    clip_layers: int = 12
    clip_heads: int = 12
    dtype: jnp.dtype = jnp.float32
    remat: bool = False  # rematerialize decoder blocks (trade FLOPs for HBM)
    scan_layers: bool = False  # nn.scan the decoder stack (compile time)
    pp_microbatches: int | None = None  # GPipe microbatch count override
    quant: str | None = None  # "int8": W8A8 decode (inference-only opt-in)

    def setup(self):
        self.text_encoder = TextEncoder(
            self.dim, self.max_length, project=True,
            clip_width=self.clip_width, clip_layers=self.clip_layers,
            clip_heads=self.clip_heads, dtype=self.dtype,
        )
        self.vq = build_vq(self.vq_config, dtype=self.dtype)
        self.codebook_size = vq_codebook_size(self.vq_config)
        self.mask_token_id = self.codebook_size
        self.decoder = BidirectionalDecoder(
            self.dim, self.codebook_size, self.n_heads, self.d_head,
            self.depth, self.mult, self.dropout,
            vq_num_patches(self.vq_config),
            dtype=self.dtype, remat=self.remat, scan_layers=self.scan_layers,
            pp_microbatches=self.pp_microbatches, quant=self.quant,
        )

    def encode_texts(self, text_ids):
        return self.text_encoder(text_ids)

    def init_all(self, text_ids, imgs, rng: jax.Array):
        """Init-time path touching every parameter (incl. the VQ decoder)."""
        loss = self(text_ids, imgs, rng, deterministic=True)
        idx = jnp.zeros((imgs.shape[0], vq_num_patches(self.vq_config)),
                        jnp.int32)
        self.vq.decode_indices(idx)
        return loss

    # -- training ---------------------------------------------------------------
    def __call__(self, text_ids, imgs, rng: jax.Array,
                 deterministic: bool = False):
        indices = self.encode_to_indices(imgs)
        return self.loss_from_indices(text_ids, indices, rng, deterministic)

    def encode_to_indices(self, imgs):
        """Frozen-tokenizer image -> token grid (b, n). Deterministic, so
        trainers may cache it per sample (training.cache_vq_tokens)."""
        return jax.lax.stop_gradient(self.vq.encode_imgs(imgs))

    def loss_from_indices(self, text_ids, indices, rng: jax.Array,
                          deterministic: bool = False):
        """Training loss from precomputed VQ tokens — the forward minus the
        image encoder, for token-cached training. Text still encodes here
        (caption choice is per-epoch random in COCO, so text can't cache)."""
        text_embeds = jax.lax.stop_gradient(self.text_encoder(text_ids))

        mask_rng, cond_rng = jax.random.split(rng)
        mask = random_mask(mask_rng, *indices.shape)
        inputs, targets = mask_fill_inputs_and_targets(
            indices, mask, self.mask_token_id
        )
        # CFG conditioning dropout: keep text with prob cond_keep_prob
        keep = (
            jax.random.uniform(cond_rng, (indices.shape[0], 1, 1))
            < self.cond_keep_prob
        )
        text_embeds = text_embeds * keep.astype(text_embeds.dtype)

        return self.decoder(inputs, text_embeds, deterministic=deterministic,
                            targets=targets)

    # -- iterative parallel decode with CFG --------------------------------------
    def generate(
        self,
        text_ids,
        rng: jax.Array,
        timesteps: int = 18,
        filter_p: float = 0.9,
        guidance_scale: float | None = None,
        approx_topk: bool = False,
    ):
        """Default decode is reference-exact (top-count filter). Passing
        ``approx_topk=True`` opts into the sort-free counting-bisection
        top-k filter (full recall of the kept set; see
        ops/sampling.kth_value_bisect) — the exact lax.top_k costs ~25% of
        a decode step at C=8192. bench.py and the inference CLIs expose it
        as an explicit speed opt-in."""
        gs = self.guidance_scale if guidance_scale is None else guidance_scale
        b = text_ids.shape[0]
        n = vq_num_patches(self.vq_config)
        text_embeds = self.text_encoder(text_ids)
        null_embeds = jnp.zeros_like(text_embeds)
        # single 2b-batch forward per step instead of two b-batch forwards
        both_ctx = jnp.concatenate([text_embeds, null_embeds], axis=0)

        ids = jnp.full((b, n), self.mask_token_id, jnp.int32)
        scores = jnp.zeros((b, n), jnp.float32)
        ts = jnp.linspace(0.0, 1.0, timesteps)
        steps_until_x0 = jnp.arange(timesteps - 1, -1, -1)
        rngs = jax.random.split(rng, timesteps)

        def step(carry, xs):
            ids, scores = carry
            timestep, steps_left, rng_t = xs
            num_to_mask = jnp.maximum(
                (cosine_schedule(timestep) * n).astype(jnp.int32), 1
            )
            mask = lowest_score_mask(scores, num_to_mask)
            ids = jnp.where(mask, self.mask_token_id, ids)

            logits2 = self.decoder(jnp.tile(ids, (2, 1)), both_ctx)
            cond, null = jnp.split(logits2, 2, axis=0)  # model dtype
            cond32 = cond.astype(jnp.float32)
            null32 = null.astype(jnp.float32)
            scaled = null32 + gs * (cond32 - null32)

            temperature = steps_left.astype(jnp.float32) / timesteps
            if approx_topk and sample_epilogue_supported(cond.shape):
                # ONE Pallas kernel: CFG combine + bisect top-k + gumbel
                # argmax + chosen-class softmax prob, logits VMEM-resident
                # throughout (the XLA chain re-reads them from HBM ~20x)
                pred, scores = sample_epilogue_fused(
                    rng_t, cond, null,
                    guidance_scale=gs, p=filter_p, temperature=temperature,
                )
                ids = jnp.where(mask, pred, ids)
                return (ids, scores), None
            # approx mode off-TPU: run the vocab-wide top-k scan on a
            # model-dtype CFG combine (half the HBM traffic); exact mode
            # keeps the reference's fp32 combine for the filter
            sample_in = (null + gs * (cond - null)) if approx_topk else scaled
            pred, chosen = sample_topk_filtered(
                rng_t, sample_in, filter_p, temperature, approx=approx_topk
            )
            ids = jnp.where(mask, pred, ids)
            # softmax prob of the chosen class without materializing
            # softmax(scaled): exp(logit - logsumexp)
            lse = jax.scipy.special.logsumexp(scaled, axis=-1)
            scores = jnp.exp(chosen - lse)
            return (ids, scores), None

        (ids, _), _ = jax.lax.scan(step, (ids, scores), (ts, steps_until_x0, rngs))
        return self.vq.decode_indices(ids)
