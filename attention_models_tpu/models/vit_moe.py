"""ViT-MoE classifier (API parity with /root/reference/models/vit_moe.py:49-106):
every block is SwitchHeadAttention + a top-k MoELayer FFN, standard LayerNorm
(the reference uses nn.LayerNorm here, not the gamma-only variant)."""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn
from einops import repeat

from attention_models_tpu.models.attention import SwitchHeadAttention
from attention_models_tpu.models.layers import LayerNorm
from attention_models_tpu.models.moe import MoELayer
from attention_models_tpu.models.vit import PatchEmbedding


class ViTMoEBlock(nn.Module):
    dim: int
    n_heads: int
    d_head: int
    n_experts: int
    sel_experts: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    moe_impl: str = "auto"
    capacity_factor: float | None = None

    @nn.compact
    def __call__(self, x, context_mask=None, deterministic: bool = True):
        h = LayerNorm(self.dim, dtype=self.dtype, name="norm1")(x)
        x = x + SwitchHeadAttention(
            self.dim, self.n_heads, self.d_head,
            num_experts=self.n_experts, sel_experts=self.sel_experts,
            dropout=self.dropout, dtype=self.dtype,
            moe_impl=self.moe_impl, capacity_factor=self.capacity_factor,
            name="self_attn",
        )(h, context_mask=context_mask, deterministic=deterministic)
        h = LayerNorm(self.dim, dtype=self.dtype, name="norm2")(x)
        x = x + MoELayer(
            self.dim, self.dim, self.n_experts, self.sel_experts,
            dtype=self.dtype, impl=self.moe_impl,
            capacity_factor=self.capacity_factor, name="moe",
        )(h)
        return x


class ViTMoE(nn.Module):
    dim: int = 1024
    image_size: int = 256
    patch_size: int = 32
    n_heads: int = 16
    d_head: int = 64
    depth: int = 6
    n_experts: int = 32
    sel_experts: int = 2
    dropout: float = 0.0
    num_classes: int = 1000
    dtype: jnp.dtype = jnp.float32
    moe_impl: str = "auto"
    capacity_factor: float | None = None

    @nn.compact
    def __call__(self, imgs, deterministic: bool = True):
        num_patches = (self.image_size // self.patch_size) ** 2
        x = PatchEmbedding(self.dim, self.patch_size, dtype=self.dtype,
                           name="patch_embed")(imgs)

        class_token = self.param(
            "class_token", nn.initializers.normal(1.0), (1, 1, self.dim),
            jnp.float32,
        )
        cls = repeat(class_token.astype(x.dtype), "1 1 d -> b 1 d", b=x.shape[0])
        x = jnp.concatenate([cls, x], axis=1)

        pos_enc = self.param(
            "pos_enc", nn.initializers.normal(1.0),
            (1, num_patches + 1, self.dim), jnp.float32,
        )
        x = x + pos_enc.astype(x.dtype)

        for i in range(self.depth):
            x = ViTMoEBlock(
                self.dim, self.n_heads, self.d_head,
                self.n_experts, self.sel_experts, self.dropout,
                dtype=self.dtype, moe_impl=self.moe_impl,
                capacity_factor=self.capacity_factor, name=f"layers_{i}",
            )(x, deterministic=deterministic)

        x = LayerNorm(self.dim, dtype=self.dtype, name="norm")(x)
        x = x[:, 0, :]
        return nn.Dense(self.num_classes, dtype=self.dtype, name="class_embed")(x)
