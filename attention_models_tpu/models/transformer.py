"""Pre-LN transformer backbone: Encoder / Decoder stacks and the seq2seq
Transformer (API parity with /root/reference/models/transformer.py:49-228).

Decode loops are bounded ``lax.scan``s with static shapes (the reference's
unbounded ``while True`` with a batch-element-0 stop is resolved per
SURVEY.md §2.9#9: per-sequence done mask, max_len bound).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from attention_models_tpu.models.attention import SoftmaxAttention
from attention_models_tpu.models.layers import (
    FeedForward,
    GammaLayerNorm,
    SinusoidalPositionalEncoding,
)
from attention_models_tpu.ops.sampling import gumbel_argmax
from attention_models_tpu.parallel.mesh import DATA_AXIS, STAGE_AXIS
from attention_models_tpu.parallel.pipeline import ambient_pp_mesh, pipeline_apply


def _pp_usable(
    mesh, depth: int, batch: int, n_microbatches: int | None = None
) -> bool:
    """Pipeline the scan-stacked layers iff the depth splits evenly into
    stages and the per-data-shard batch exists and splits into the
    requested microbatch count (a sampling/eval batch smaller than the
    train batch falls back to the sequential scan instead of crashing)."""
    stages = mesh.shape.get(STAGE_AXIS, 1)
    dp = mesh.shape.get(DATA_AXIS, 1)
    if stages <= 1 or depth % stages or batch % dp or batch < dp:
        return False
    if n_microbatches and (batch // dp) % int(n_microbatches):
        return False
    return True


class EncoderLayer(nn.Module):
    dim: int
    n_heads: int = 8
    d_head: int = 64
    mult: float = 4
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    quant: str | None = None  # "int8": W8A8 inference path

    @nn.compact
    def __call__(self, x, context_mask=None, deterministic: bool = True):
        h = GammaLayerNorm(self.dim, dtype=self.dtype, name="norm1")(x)
        x = x + SoftmaxAttention(
            self.dim, self.n_heads, self.d_head, self.dropout,
            dtype=self.dtype, quant=self.quant, name="self_attn",
        )(h, context_mask=context_mask, deterministic=deterministic)
        h = GammaLayerNorm(self.dim, dtype=self.dtype, name="norm2")(x)
        x = x + FeedForward(self.dim, self.mult, dtype=self.dtype,
                            quant=self.quant, name="ff")(h)
        return x


class Encoder(nn.Module):
    """``scan=True`` stacks the layers into one nn.scan-ed layer (params get
    a leading depth axis): one layer is traced/compiled instead of `depth`
    copies — the compile-time lever for deep models (ROADMAP #8). Weight
    layouts differ from the loop form, so checkpoints are not interchangeable
    between the two."""

    dim: int
    n_heads: int = 8
    d_head: int = 64
    depth: int = 6
    mult: float = 4
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    scan: bool = False
    pp_microbatches: int | None = None  # GPipe microbatch count override
    quant: str | None = None  # "int8": W8A8 inference path

    @nn.compact
    def __call__(self, x, context_mask=None, deterministic: bool = True):
        # static_argnums counts self at 0: `deterministic` (3) is a Python
        # bool branched on inside the layer — tracing it crashes remat
        layer_cls = (
            nn.remat(EncoderLayer, static_argnums=(3,))
            if self.remat else EncoderLayer
        )
        if self.scan:
            # Pipeline parallelism: when the trainer mesh has a sharded
            # ``stage`` axis (training.pipeline_parallel), run the stacked
            # layers as a GPipe ring instead of a sequential scan. Params
            # were created by the nn.scan below (leading depth axis) so
            # checkpoints are interchangeable between the two paths.
            if not self.is_initializing():
                pp_mesh = ambient_pp_mesh()
                if pp_mesh is not None and _pp_usable(
                    pp_mesh, self.depth, x.shape[0], self.pp_microbatches
                ):
                    return self._pp_forward(
                        x, context_mask, deterministic, pp_mesh
                    )

            def body(layer, x, context_mask):
                return layer(x, context_mask, deterministic), None

            x, _ = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast,),
                length=self.depth,
            )(
                layer_cls(
                    self.dim, self.n_heads, self.d_head, self.mult,
                    self.dropout, dtype=self.dtype, quant=self.quant,
                    name="layers",
                ),
                x, context_mask,
            )
            return x
        for i in range(self.depth):
            x = layer_cls(
                self.dim, self.n_heads, self.d_head, self.mult, self.dropout,
                dtype=self.dtype, quant=self.quant, name=f"layers_{i}",
            )(x, context_mask, deterministic)
        return x

    def _pp_forward(self, x, context_mask, deterministic, mesh):
        """GPipe forward over the ``stage`` mesh axis: each device applies
        its contiguous depth/S slice of the scan-stacked params; the mask
        is a per-microbatch constant each stage indexes locally; per-layer
        dropout rngs ride in the scanned pytree so stochastic training
        still works. ``remat`` wraps the whole per-layer fn in
        jax.checkpoint (the nn.remat-wrapped module can't take the static
        bool args through its apply)."""
        layer = EncoderLayer(
            self.dim, self.n_heads, self.d_head, self.mult, self.dropout,
            dtype=self.dtype, quant=self.quant,
        )
        scanned = {"params": self.variables["params"]["layers"]}
        if (
            not deterministic and self.dropout > 0
            and self.has_rng("dropout")
        ):
            scanned["rng"] = jax.random.split(
                self.make_rng("dropout"), self.depth
            )
        per_mb = () if context_mask is None else (context_mask,)
        dp = mesh.shape.get(DATA_AXIS, 1)

        def layer_fn(p, h, per, bc, mb_idx):
            rngs = None
            if "rng" in p:
                # distinct masks per microbatch and per data shard (one key
                # per layer would repeat the same mask across microbatches)
                key = jax.random.fold_in(p["rng"], mb_idx)
                if dp > 1:
                    key = jax.random.fold_in(
                        key, jax.lax.axis_index(DATA_AXIS)
                    )
                rngs = {"dropout": key}
            return layer.apply(
                {"params": p["params"]}, h, per[0] if per else None,
                deterministic, rngs=rngs,
            )

        if self.remat:
            layer_fn = jax.checkpoint(layer_fn)
        return pipeline_apply(
            scanned, x, layer_fn, mesh,
            batch_axis=DATA_AXIS if dp > 1 else None,
            per_mb=per_mb,
            n_microbatches=self.pp_microbatches,
        )


class DecoderLayer(nn.Module):
    dim: int
    n_heads: int = 8
    d_head: int = 64
    mult: float = 4
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    max_decode_len: int | None = None
    quant: str | None = None  # "int8": W8A8 inference path

    @nn.compact
    def __call__(
        self, x, context, context_mask=None, causal_mask=None,
        causal: bool = False, deterministic: bool = True, decode: bool = False,
    ):
        h = GammaLayerNorm(self.dim, dtype=self.dtype, name="norm1")(x)
        x = x + SoftmaxAttention(
            self.dim, self.n_heads, self.d_head, self.dropout,
            dtype=self.dtype, max_decode_len=self.max_decode_len,
            quant=self.quant, name="self_attn",
        )(h, causal_mask=causal_mask, causal=causal,
          deterministic=deterministic, decode=decode)
        h = GammaLayerNorm(self.dim, dtype=self.dtype, name="norm2")(x)
        x = x + SoftmaxAttention(
            self.dim, self.n_heads, self.d_head, self.dropout,
            dtype=self.dtype, quant=self.quant, name="cross_attn",
        )(h, context=context, context_mask=context_mask,
          deterministic=deterministic, decode=decode)
        h = GammaLayerNorm(self.dim, dtype=self.dtype, name="norm3")(x)
        x = x + FeedForward(self.dim, self.mult, dtype=self.dtype,
                            quant=self.quant, name="ff")(h)
        return x


class Decoder(nn.Module):
    """Self-attn (optionally causal) → cross-attn → FFN stack. With no causal
    mask this is Muse's "bidirectional decoder" (SURVEY.md §2.2)."""

    dim: int
    n_heads: int = 8
    d_head: int = 64
    depth: int = 6
    mult: float = 4
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    max_decode_len: int | None = None
    scan: bool = False
    pp_microbatches: int | None = None  # GPipe microbatch count override
    quant: str | None = None  # "int8": W8A8 inference path

    @nn.compact
    def __call__(
        self, dec_in, context, context_mask=None, causal_mask=None,
        causal: bool = False, deterministic: bool = True, decode: bool = False,
    ):
        # static_argnums counts self at 0: `causal`/`deterministic`/`decode`
        # (5, 6, 7) are Python bools branched on inside the layer
        layer_cls = (
            nn.remat(DecoderLayer, static_argnums=(5, 6, 7))
            if self.remat else DecoderLayer
        )
        x = dec_in
        if self.scan:
            # Pipeline parallelism (see Encoder.__call__). Not in decode
            # mode: the KV cache is per-device state the ring can't stream.
            if not self.is_initializing() and not decode:
                pp_mesh = ambient_pp_mesh()
                if pp_mesh is not None and _pp_usable(
                    pp_mesh, self.depth, x.shape[0], self.pp_microbatches
                ):
                    return self._pp_forward(
                        x, context, context_mask, causal_mask,
                        causal, deterministic, pp_mesh,
                    )

            def body(layer, x, context, context_mask, causal_mask):
                return layer(
                    x, context, context_mask, causal_mask, causal,
                    deterministic, decode,
                ), None

            x, _ = nn.scan(
                body,
                variable_axes={"params": 0, "cache": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
                length=self.depth,
            )(
                layer_cls(
                    self.dim, self.n_heads, self.d_head, self.mult,
                    self.dropout, dtype=self.dtype,
                    max_decode_len=self.max_decode_len, quant=self.quant,
                    name="layers",
                ),
                x, context, context_mask, causal_mask,
            )
            return x
        for i in range(self.depth):
            x = layer_cls(
                self.dim, self.n_heads, self.d_head, self.mult, self.dropout,
                dtype=self.dtype, max_decode_len=self.max_decode_len,
                quant=self.quant, name=f"layers_{i}",
            )(x, context, context_mask, causal_mask, causal, deterministic,
              decode)
        return x

    def _pp_forward(
        self, x, context, context_mask, causal_mask, causal,
        deterministic, mesh,
    ):
        """GPipe forward (see Encoder._pp_forward). The cross-attention
        context and its mask are per-microbatch constants (stage-replicated,
        indexed locally — only the hidden stream rides the ring); the causal
        mask is an unbatched broadcast constant."""
        layer = DecoderLayer(
            self.dim, self.n_heads, self.d_head, self.mult, self.dropout,
            dtype=self.dtype, max_decode_len=self.max_decode_len,
            quant=self.quant,
        )
        scanned = {"params": self.variables["params"]["layers"]}
        if (
            not deterministic and self.dropout > 0
            and self.has_rng("dropout")
        ):
            scanned["rng"] = jax.random.split(
                self.make_rng("dropout"), self.depth
            )
        per_mb = (context,)
        if context_mask is not None:
            per_mb = per_mb + (context_mask,)
        broadcast = () if causal_mask is None else (causal_mask,)
        dp = mesh.shape.get(DATA_AXIS, 1)

        def layer_fn(p, h, per, bc, mb_idx):
            rngs = None
            if "rng" in p:
                # distinct masks per microbatch and per data shard (one key
                # per layer would repeat the same mask across microbatches)
                key = jax.random.fold_in(p["rng"], mb_idx)
                if dp > 1:
                    key = jax.random.fold_in(
                        key, jax.lax.axis_index(DATA_AXIS)
                    )
                rngs = {"dropout": key}
            mask = per[1] if len(per) > 1 else None
            return layer.apply(
                {"params": p["params"]}, h, per[0], mask,
                bc[0] if bc else None, causal, deterministic, False,
                rngs=rngs,
            )

        if self.remat:
            layer_fn = jax.checkpoint(layer_fn)
        return pipeline_apply(
            scanned, x, layer_fn, mesh,
            batch_axis=DATA_AXIS if dp > 1 else None,
            per_mb=per_mb,
            broadcast=broadcast,
            n_microbatches=self.pp_microbatches,
        )


class Transformer(nn.Module):
    """Seq2seq encoder-decoder LM (transformer.py:138-228)."""

    dim: int
    vocab_size: int = 1000
    n_heads: int = 8
    d_head: int = 64
    enc_depth: int = 6
    dec_depth: int = 6
    n_classes: int | None = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.enc_input_proj = nn.Embed(self.vocab_size, self.dim, dtype=self.dtype)
        self.dec_input_proj = nn.Embed(self.vocab_size, self.dim, dtype=self.dtype)
        self.pos_enc = SinusoidalPositionalEncoding(self.dim, dropout=0.1)
        self.enc_init_norm = GammaLayerNorm(self.dim, dtype=self.dtype)
        self.encoder = Encoder(
            self.dim, self.n_heads, self.d_head, self.enc_depth, dtype=self.dtype
        )
        self.enc_final_norm = GammaLayerNorm(self.dim, dtype=self.dtype)
        self.dec_init_norm = GammaLayerNorm(self.dim, dtype=self.dtype)
        self.decoder = Decoder(
            self.dim, self.n_heads, self.d_head, self.dec_depth, dtype=self.dtype
        )
        self.dec_final_norm = GammaLayerNorm(self.dim, dtype=self.dtype)
        self.linear = nn.Dense(self.n_classes, dtype=self.dtype)

    def encode(self, src_seq, context_mask=None, deterministic=True):
        x = self.enc_input_proj(src_seq)
        x = self.pos_enc(x, deterministic=deterministic)
        x = self.enc_init_norm(x)
        ctx = self.encoder(x, context_mask=context_mask,
                           deterministic=deterministic)
        return self.enc_final_norm(ctx)

    def __call__(self, src_seq, tgt_seq, deterministic: bool = True):
        # reference builds an all-True context mask + triu causal mask
        # (transformer.py:165-174); all-True keep mask is the identity.
        context = self.encode(src_seq, deterministic=deterministic)
        x = self.dec_input_proj(tgt_seq)
        x = self.pos_enc(x, deterministic=deterministic)
        x = self.dec_init_norm(x)
        x = self.decoder(x, context, causal=True, deterministic=deterministic)
        x = self.dec_final_norm(x)
        return self.linear(x)

    def generate(
        self,
        src_seq,
        rng: jax.Array,
        max_len: int = 128,
        start_token: int = 1,
        end_token: int = 2,
    ):
        """AR decode as a bounded lax.scan. The reference (transformer.py:176-202)
        re-forwards the growing sequence each step, samples
        argmax(gumbel_softmax(logits[, -1])) and stops when batch element 0
        emits ``end_token``; here every sequence carries a done-mask and the
        loop is fixed-length (jit-compatible). Emits ``end_token`` padding
        after completion."""
        context = self.encode(src_seq)
        b = src_seq.shape[0]

        # fixed-size token buffer, position 0 = start token
        tokens0 = jnp.full((b, max_len + 1), end_token, jnp.int32)
        tokens0 = tokens0.at[:, 0].set(start_token)

        def step(carry, rng_t):
            tokens, done, t = carry
            x = self.dec_input_proj(tokens)
            x = self.pos_enc(x)
            # reference generate() applies no init/final norms around the
            # decoder (transformer.py:188-194) — kept
            dec = self.decoder(x, context, causal=True)
            logits = self.linear(dec)
            # gather logits at position t (the last generated position)
            last = jnp.take_along_axis(
                logits, t[None, None, None].repeat(b, 0), axis=1
            )[:, 0, :]
            nxt = gumbel_argmax(rng_t, last, 1.0)
            nxt_done = done | (nxt == end_token)
            nxt_tok = jnp.where(done, end_token, nxt)
            tokens = tokens.at[:, t + 1].set(nxt_tok.astype(jnp.int32))
            return (tokens, nxt_done, t + 1), None

        rngs = jax.random.split(rng, max_len)
        (tokens, done, _), _ = jax.lax.scan(
            step, (tokens0, jnp.zeros((b,), bool), jnp.array(0)), rngs
        )
        return tokens
