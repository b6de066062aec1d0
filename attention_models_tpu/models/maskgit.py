"""MaskGIT (arXiv 2202.04200; API parity with /root/reference/models/maskgit.py).

Bidirectional transformer over frozen-VQ token grids. Training: cosine-
schedule random masking + CE(ignore_index=-1) — with the reference's
``torch.random(b)`` crash fixed per SURVEY.md §2.9#2 (uniform timesteps, as
Muse does). Inference: iterative confidence-based parallel decode as ONE
jitted ``lax.scan`` with static timesteps — no host round-trips.

The frozen ViTVQGAN lives as the ``vq`` submodule; its params are inside this
model's param tree and the trainer zeroes their updates (optax mask).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from attention_models_tpu.models.layers import GammaLayerNorm
from attention_models_tpu.models.transformer import Encoder
from attention_models_tpu.models.vq_common import (
    build_vq,
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

trunc_normal02 = nn.initializers.truncated_normal(0.02, lower=-2.0, upper=2.0)


class BiDirectionalTransformer(nn.Module):
    """maskgit.py:51-88: Embedding(vocab+1) (+1 = mask token), trunc-normal
    learned pos-enc, gamma-LN sandwich around a transformer.Encoder stack,
    no-bias head. google-maskgit trunc-normal(0.02) init."""

    dim: int
    vocab_size: int = 8192
    num_patches: int = 256
    n_heads: int = 8
    d_head: int = 64
    dec_depth: int = 6
    mult: float = 4
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    scan_layers: bool = False
    pp_microbatches: int | None = None
    quant: str | None = None  # "int8": W8A8 inference path (ops/quant.py)

    @nn.compact
    def __call__(self, x, deterministic: bool = True, targets=None):
        """With ``targets`` (training): returns the masked mean CE directly
        via the fused Pallas head-xent kernel on TPU — the (N, vocab)
        logits never reach HBM (ops/xent.py). Without: returns logits."""
        emb = nn.Embed(
            self.vocab_size + 1, self.dim, dtype=self.dtype,
            embedding_init=trunc_normal02, name="input_proj",
        )(x)
        pos = self.param(
            "pos_enc", trunc_normal02, (1, self.num_patches, self.dim),
            jnp.float32,
        )
        h = emb + pos.astype(emb.dtype)
        h = GammaLayerNorm(self.dim, dtype=self.dtype, name="init_norm")(h)
        h = Encoder(
            self.dim, self.n_heads, self.d_head, self.dec_depth, self.mult,
            self.dropout, dtype=self.dtype, remat=self.remat,
            scan=self.scan_layers, pp_microbatches=self.pp_microbatches,
            quant=self.quant, name="decoder",
        )(h, deterministic=deterministic)
        h = GammaLayerNorm(self.dim, dtype=self.dtype, name="final_norm")(h)
        from attention_models_tpu.models.layers import _DenseKernel

        # same pytree path ("linear/kernel"), init and math as the previous
        # nn.Dense(use_bias=False, dtype) — the raw kernel also feeds the
        # int8 and fused-xent paths
        kernel = _DenseKernel((h.shape[-1], self.vocab_size),
                              kernel_init=trunc_normal02, name="linear")()
        if targets is not None:
            from attention_models_tpu.ops.xent import (
                fused_head_xent,
                head_xent_supported,
            )

            if self.quant is None and head_xent_supported(
                    h.shape, h.shape[-1], self.vocab_size):
                return fused_head_xent(h, kernel, targets)
            if self.quant == "int8":  # eval-loss of a quantized model
                from attention_models_tpu.ops.quant import quant_dot

                logits = quant_dot(h, kernel, out_dtype=self.dtype)
            else:
                logits = jnp.dot(h, kernel.astype(self.dtype))
            return cross_entropy_ignore_index(logits, targets)
        if self.quant == "int8":
            from attention_models_tpu.ops.quant import quant_dot

            return quant_dot(h, kernel, out_dtype=self.dtype)
        return jnp.dot(h, kernel.astype(self.dtype))


class MaskGitTransformer(nn.Module):
    dim: int
    vq_config: dict  # {"vit_params": ..., "codebook_params": ...}
    vocab_size: int = 8192
    n_heads: int = 8
    d_head: int = 64
    dec_depth: int = 6
    mult: float = 4
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    scan_layers: bool = False
    pp_microbatches: int | None = None
    quant: str | None = None  # "int8": W8A8 decode (inference-only opt-in)

    def setup(self):
        self.vq = build_vq(self.vq_config, dtype=self.dtype)
        self.mask_token_id = self.vocab_size
        self.bidirectional_transformer = BiDirectionalTransformer(
            dim=self.dim, vocab_size=self.vocab_size,
            num_patches=vq_num_patches(self.vq_config),
            n_heads=self.n_heads, d_head=self.d_head,
            dec_depth=self.dec_depth, mult=self.mult, dropout=self.dropout,
            dtype=self.dtype, remat=self.remat, scan_layers=self.scan_layers,
            pp_microbatches=self.pp_microbatches, quant=self.quant,
        )

    def init_all(self, imgs, rng: jax.Array):
        """Init-time path that touches every parameter (training forward
        alone never visits the VQ decoder): use as
        ``model.init(key, imgs, rng, method=MaskGitTransformer.init_all)``."""
        loss = self(imgs, rng, deterministic=True)
        idx = jnp.zeros((imgs.shape[0], vq_num_patches(self.vq_config)),
                        jnp.int32)
        self.vq.decode_indices(idx)
        return loss

    # -- training -------------------------------------------------------------
    def __call__(self, imgs, rng: jax.Array, deterministic: bool = False):
        """Training loss. ``rng`` drives the masking only — dropout noise
        comes from the 'dropout' rng passed to ``apply()``."""
        indices = self.encode_to_indices(imgs)
        return self.loss_from_indices(indices, rng, deterministic)

    def encode_to_indices(self, imgs):
        """Frozen-tokenizer image -> token grid (b, n). Deterministic, so
        trainers may cache it per sample (training.cache_vq_tokens)."""
        return jax.lax.stop_gradient(self.vq.encode_imgs(imgs))

    def loss_from_indices(self, indices, rng: jax.Array,
                          deterministic: bool = False):
        """Training loss from precomputed VQ tokens — the forward minus the
        encoder, for token-cached training."""
        mask = random_mask(rng, *indices.shape)
        inputs, targets = mask_fill_inputs_and_targets(
            indices, mask, self.mask_token_id
        )
        return self.bidirectional_transformer(
            inputs, deterministic=deterministic, targets=targets
        )

    # -- eval reconstruction (the reference's eval branch of forward) ----------
    def reconstruct(self, imgs, rng: jax.Array):
        indices = self.vq.encode_imgs(imgs)
        mask = random_mask(rng, *indices.shape)
        inputs, _ = mask_fill_inputs_and_targets(indices, mask, self.mask_token_id)
        logits = self.bidirectional_transformer(inputs)
        pred = jnp.argmax(logits, axis=-1)
        filled = jnp.where(mask, pred, indices)
        return self.vq.decode_indices(filled)

    # -- iterative parallel decode ---------------------------------------------
    def generate(
        self,
        rng: jax.Array,
        imgs: Optional[jnp.ndarray] = None,
        batch: int = 1,
        num_masked: int = 200,
        timesteps: int = 18,
        filter_p: float = 0.9,
        approx_topk: bool = False,
    ):
        """maskgit.py:191-288 minus the cv2 debug output. From scratch
        (imgs=None): start all-mask. Inpainting: encode ``imgs`` and mask the
        first ``num_masked`` token positions (fill_custom_mask semantics).
        The loop re-masks the ``cosine(t)·num_masked`` lowest-confidence
        tokens each step, samples with top-k filtered gumbel noise annealed
        to greedy."""
        n = vq_num_patches(self.vq_config)
        if imgs is None:
            ids = jnp.full((batch, n), self.mask_token_id, jnp.int32)
            base_mask = jnp.ones((batch, n), bool)  # everything re-maskable
        else:
            batch = imgs.shape[0]
            ids = self.vq.encode_imgs(imgs)
            pos = jnp.arange(n)[None, :]
            base_mask = jnp.broadcast_to(pos < num_masked, (batch, n))

        scores = jnp.zeros((batch, n), jnp.float32)
        ts = jnp.linspace(0.0, 1.0, timesteps)
        steps_until_x0 = jnp.arange(timesteps - 1, -1, -1)
        rngs = jax.random.split(rng, timesteps)

        def step(carry, xs):
            ids, scores = carry
            timestep, steps_left, rng_t = xs
            num_to_mask = jnp.maximum(
                (cosine_schedule(timestep) * num_masked).astype(jnp.int32), 1
            )
            mask = lowest_score_mask(scores, num_to_mask) & base_mask
            x = jnp.where(mask, self.mask_token_id, ids)
            logits = self.bidirectional_transformer(x)
            temperature = steps_left.astype(jnp.float32) / timesteps
            if approx_topk and sample_epilogue_supported(logits.shape):
                # ONE Pallas kernel: bisect top-k + gumbel argmax +
                # chosen-class softmax prob (see ops/sampling)
                pred, new_scores = sample_epilogue_fused(
                    rng_t, logits, p=filter_p, temperature=temperature,
                )
                ids = jnp.where(mask, pred, ids)
                scores = jnp.where(mask, new_scores, 1.0)
                return (ids, scores), None
            # top-k runs on the model dtype (casting up adds no information
            # and doubles the HBM traffic of the vocab-wide scan)
            pred, chosen = sample_topk_filtered(
                rng_t, logits, filter_p, temperature, approx=approx_topk
            )
            ids = jnp.where(mask, pred, ids)
            # fp32 softmax normalizer, fused into the reduce (no fp32 copy)
            lse = jax.scipy.special.logsumexp(
                logits.astype(jnp.float32), axis=-1
            )
            new_scores = jnp.exp(chosen - lse)
            scores = jnp.where(mask, new_scores, 1.0)
            return (ids, scores), None

        (ids, _), _ = jax.lax.scan(step, (ids, scores), (ts, steps_until_x0, rngs))
        return self.vq.decode_indices(ids)
