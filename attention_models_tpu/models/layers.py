"""Core layers shared across the model zoo.

Faithful TPU-native re-implementations of the reference's building blocks:
  - GammaLayerNorm: LayerNorm with learnable gamma and a frozen zero beta
    (/root/reference/models/transformer.py:11-19).
  - GEGLU + FeedForward: gated-GELU FFN with inner dim int(dim·mult·2/3)
    (/root/reference/models/transformer.py:22-43). chunk order: the FIRST
    half is gelu'd, the second half gates.
  - Mlp: plain Linear→GELU→Linear used by ViT (vit.py:10-21) and — with the
    xFormers hidden-dim rounding — by ViTVQGAN (vitvqgan.py:20-34, repaired
    per SURVEY.md §2.9#1: the snapshot's class is broken; shapes follow the
    xFormers MLP the signature was copied from).
  - SinusoidalPositionalEncoding (positional_encoding.py:22-42) and
    AbsolutePositionalEmbedding (positional_encoding.py:9-18).
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp
import flax.linen as nn

from attention_models_tpu.ops.codebook import l2_normalize


class GammaLayerNorm(nn.Module):
    """LayerNorm with learnable scale only; bias frozen at zero. fp32
    statistics; single-HBM-pass Pallas kernel on TPU (ops/layernorm.py)."""

    dim: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from attention_models_tpu.ops.layernorm import layernorm

        gamma = self.param("gamma", nn.initializers.ones, (self.dim,), jnp.float32)
        return layernorm(x, gamma, None, eps=self.eps).astype(self.dtype)


class LayerNorm(nn.Module):
    """Standard LayerNorm (learnable scale and bias), torch semantics. fp32
    statistics; single-HBM-pass Pallas kernel on TPU (ops/layernorm.py)."""

    dim: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from attention_models_tpu.ops.layernorm import layernorm

        gamma = self.param("gamma", nn.initializers.ones, (self.dim,), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (self.dim,), jnp.float32)
        return layernorm(x, gamma, beta, eps=self.eps).astype(self.dtype)


def geglu(x: jnp.ndarray) -> jnp.ndarray:
    """x, gate = chunk(2); gate * gelu(x) — note gelu on the FIRST half."""
    a, gate = jnp.split(x, 2, axis=-1)
    return gate * nn.gelu(a, approximate=False)


class _DenseKernel(nn.Module):
    """Param-only stand-in for an nn.Dense: same pytree paths
    (<name>/kernel and optionally <name>/bias), same inits, same param
    dtype — so the fused-FFN paths below can consume the raw weights while
    checkpoints, the TP sharding rules and the torch converters keep
    working unchanged. Returns kernel, or (kernel, bias) with use_bias."""

    shape: tuple
    use_bias: bool = False
    kernel_init: Callable | None = None

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel",
                            self.kernel_init or nn.initializers.lecun_normal(),
                            self.shape, jnp.float32)
        if not self.use_bias:
            return kernel
        bias = self.param("bias", nn.initializers.zeros,
                          (self.shape[1],), jnp.float32)
        return kernel, bias


class _GammaParam(nn.Module):
    """Param-only stand-in for GammaLayerNorm's scale (<name>/gamma)."""

    dim: int

    @nn.compact
    def __call__(self):
        return self.param("gamma", nn.initializers.ones, (self.dim,),
                          jnp.float32)


class _LNParams(nn.Module):
    """Param-only stand-in for LayerNorm: same pytree paths (<name>/gamma,
    <name>/beta), same inits — lets callers consume the raw affine while
    checkpoints/converters keep working unchanged (the _DenseKernel
    pattern)."""

    dim: int

    @nn.compact
    def __call__(self):
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,),
                           jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (self.dim,),
                          jnp.float32)
        return gamma, beta


class FeedForward(nn.Module):
    """GEGLU FFN: Dense(2·inner, no bias) → GEGLU → GammaLayerNorm(inner) →
    Dense(dim, no bias); inner = int(dim·mult·2/3).

    On TPU with lane-aligned dims the whole block runs as ONE fused Pallas
    kernel (ops/ffn.py) — the (N, 2·inner) and (N, inner) intermediates
    never touch HBM (measured ~half of a Muse decode step unfused). The
    unfused path is numerically identical to the previous nn.Dense chain."""

    dim: int
    mult: float = 4
    dtype: jnp.dtype = jnp.float32
    quant: str | None = None  # "int8": W8A8 inference path (ops/quant.py)

    @nn.compact
    def __call__(self, x):
        from attention_models_tpu.ops.ffn import ffn_supported, fused_ffn
        from attention_models_tpu.ops.layernorm import layernorm

        inner = int(self.dim * self.mult * 2 / 3)
        w1 = _DenseKernel((x.shape[-1], inner * 2), name="ff_in")()
        gamma = _GammaParam(inner, name="norm")()
        w2 = _DenseKernel((inner, self.dim), name="ff_out")()

        tileable = (
            ffn_supported(x.shape, x.shape[-1], inner)
            and (2 * inner) % 128 == 0
            and self.dim % 128 == 0
        )
        if self.quant == "int8":
            # opt-in W8A8 inference path: per-channel int8 weights
            # (quantized at trace time — loop-invariant under decode
            # scans), per-token dynamic activation scales, int32 MXU
            # accumulation. No VJP: training configs must not set quant.
            from attention_models_tpu.ops.quant import (
                ffn_q8_reference,
                fused_ffn_q8,
            )

            if tileable:  # ffn_supported() already gates on the TPU backend
                return fused_ffn_q8(x, w1, gamma, w2)
            return ffn_q8_reference(x, w1, gamma, w2)
        if self.quant == "int8_wide":
            # selective W8A8: ONLY the down-projection (contraction = inner,
            # the one matmul in int8's ≥4096-contraction profit region for
            # the Muse mult=8 FFN); up-projection and every other model
            # matmul stay bf16. Inference-only, like "int8".
            from attention_models_tpu.ops.quant import (
                ffn_q8wide_reference,
                fused_ffn_q8wide,
            )

            if tileable:
                return fused_ffn_q8wide(x, w1, gamma, w2)
            return ffn_q8wide_reference(x, w1, gamma, w2)
        if tileable:
            return fused_ffn(x, w1, gamma, w2)

        h = jnp.dot(x, w1.astype(self.dtype))
        h = geglu(h)
        h = layernorm(h, gamma, None).astype(self.dtype)
        return jnp.dot(h, w2.astype(self.dtype))


def xformers_hidden(hidden_features: int) -> int:
    """ViTVQGAN FFN hidden width: (int(h·2/3)+7)//8·8 (vitvqgan.py:27)."""
    return (int(hidden_features * 2 / 3) + 7) // 8 * 8


class Mlp(nn.Module):
    """Linear → activation → (dropout) → Linear → (dropout).

    The default-configuration hot path (exact-gelu, biased, no active
    dropout, bf16 on TPU — the ViTVQGAN TransformerBlock FFN) runs as one
    fused Pallas kernel (ops/ffn.py::fused_mlp): the (N, hidden)
    intermediate never touches HBM. fp32 keeps the exact unfused
    formulation (the golden bit-match path)."""

    dim: int
    hidden_dim: int
    dropout: float = 0.0
    use_bias: bool = True
    act: Callable = lambda x: nn.gelu(x, approximate=False)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from attention_models_tpu.ops.ffn import fused_mlp, mlp_supported

        default_act = type(self).__dataclass_fields__["act"].default
        fusable = (
            self.use_bias
            and self.act is default_act  # default exact-gelu only
            and (self.dropout == 0.0 or deterministic)
            and self.dtype == jnp.bfloat16
            and x.dtype == jnp.bfloat16
            and mlp_supported(x.shape, x.shape[-1])
            and self.dim % 128 == 0
        )
        if fusable:
            w1, b1 = _DenseKernel((x.shape[-1], self.hidden_dim),
                                  use_bias=True, name="mlp_in")()
            w2, b2 = _DenseKernel((self.hidden_dim, self.dim),
                                  use_bias=True, name="mlp_out")()
            return fused_mlp(x, w1, b1, w2, b2)
        h = nn.Dense(self.hidden_dim, use_bias=self.use_bias, dtype=self.dtype,
                     name="mlp_in")(x)
        h = self.act(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.dim, use_bias=self.use_bias, dtype=self.dtype,
                     name="mlp_out")(h)
        return nn.Dropout(self.dropout)(h, deterministic=deterministic)


class SinusoidalPositionalEncoding(nn.Module):
    """Fixed sin/cos table added to the input, then dropout
    (positional_encoding.py:22-42). The table is a constant, not a param."""

    dim: int
    dropout: float = 0.1
    max_len: int = 5000
    dtype: jnp.dtype = jnp.float32

    def pe_table(self) -> jnp.ndarray:
        position = jnp.arange(self.max_len, dtype=jnp.float32)[:, None]
        div = jnp.exp(
            jnp.arange(0, self.dim, 2, dtype=jnp.float32)
            * (-math.log(10000.0) / self.dim)
        )
        pe = jnp.zeros((self.max_len, self.dim), jnp.float32)
        pe = pe.at[:, 0::2].set(jnp.sin(position * div))
        pe = pe.at[:, 1::2].set(jnp.cos(position * div))
        return pe

    @nn.compact
    def __call__(self, x, deterministic: bool = True, offset: int = 0):
        t = x.shape[1]
        pe = self.pe_table()
        x = x + pe[offset : offset + t].astype(x.dtype)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class AbsolutePositionalEmbedding(nn.Module):
    """Learned position embedding, L2-normalized (positional_encoding.py:9-18).
    Dead code in the reference; kept for API parity."""

    dim: int
    max_len: int

    @nn.compact
    def __call__(self, positions):
        emb = nn.Embed(self.max_len, self.dim, name="emb")(positions)
        return l2_normalize(emb)


class _LayerNormParams(nn.Module):
    """Param-only stand-in for LayerNorm (<name>/gamma, <name>/beta) — lets
    the fully-fused pre-LN MLP block consume raw LN params while keeping
    checkpoint/converter pytree paths identical."""

    dim: int

    @nn.compact
    def __call__(self):
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,),
                           jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (self.dim,),
                          jnp.float32)
        return gamma, beta


class _MlpParams(nn.Module):
    """Param-only stand-in for an Mlp module — same nested pytree paths
    (<name>/mlp_in/{kernel,bias}, <name>/mlp_out/{kernel,bias})."""

    dim: int
    hidden_dim: int

    @nn.compact
    def __call__(self):
        w1, b1 = _DenseKernel((self.dim, self.hidden_dim), use_bias=True,
                              name="mlp_in")()
        w2, b2 = _DenseKernel((self.hidden_dim, self.dim), use_bias=True,
                              name="mlp_out")()
        return w1, b1, w2, b2


def ln_mlp_block(x, *, dim: int, hidden_dim: int, dtype,
                 norm_name: str, mlp_name: str,
                 deterministic: bool = True, dropout: float = 0.0,
                 quant: str | None = None):
    """``x + Mlp(LayerNorm(x))`` — the second half of a ViT TransformerBlock.
    On the TPU bf16 fast path the whole block is ONE Pallas kernel
    (ops/ffn.py::fused_ln_mlp: LN + both matmuls + gelu + residual, no HBM
    intermediates); otherwise the module composition runs unchanged. Call
    from inside an @nn.compact __call__ (submodules attach to the caller).
    ``quant="int8"`` switches to the W8A8 kernel (inference-only —
    ops/quant.py)."""
    from attention_models_tpu.ops.ffn import fused_ln_mlp, mlp_supported

    if quant == "int8":
        from attention_models_tpu.ops.quant import (
            fused_ln_mlp_q8,
            ln_mlp_q8_reference,
        )

        if dropout != 0.0 and not deterministic:
            raise ValueError(
                "quant='int8' is an inference-only path; it cannot apply "
                "active dropout (got dropout={} with deterministic=False)"
                .format(dropout)
            )
        lng, lnb = _LayerNormParams(dim, name=norm_name)()
        w1, b1, w2, b2 = _MlpParams(dim, hidden_dim, name=mlp_name)()
        tileable = (
            mlp_supported(x.shape, x.shape[-1])
            and dim % 128 == 0 and x.shape[-1] == dim
        )
        if tileable:  # mlp_supported() already gates on the TPU backend
            return fused_ln_mlp_q8(x, lng, lnb, w1, b1, w2, b2)
        return ln_mlp_q8_reference(x, lng, lnb, w1, b1, w2, b2)
    fusable = (
        (dropout == 0.0 or deterministic)
        and dtype == jnp.bfloat16
        and x.dtype == jnp.bfloat16
        and mlp_supported(x.shape, x.shape[-1])
        and dim % 128 == 0
        and x.shape[-1] == dim
    )
    if fusable:
        lng, lnb = _LayerNormParams(dim, name=norm_name)()
        w1, b1, w2, b2 = _MlpParams(dim, hidden_dim, name=mlp_name)()
        return fused_ln_mlp(x, lng, lnb, w1, b1, w2, b2)
    h = LayerNorm(dim, dtype=dtype, name=norm_name)(x)
    return x + Mlp(dim, hidden_dim, dropout=dropout, dtype=dtype,
                   name=mlp_name)(h, deterministic=deterministic)
