"""CNN VQGAN (taming-transformers lineage; API parity with
/root/reference/models/vqgan.py).

Public API keeps the reference's NCHW image layout; internally everything
runs NHWC (the TPU-native conv layout) with one transpose at entry/exit.

Codebook here is the CNN variant (vqgan.py:138-182), which differs from the
ViT variant on purpose (SURVEY.md §2.9#7): uniform ±1/K init, β on the
*commitment* (second) loss term, and NO re-normalization on
``indices_to_embeddings`` lookup.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn
from einops import rearrange

from attention_models_tpu.ops.codebook import l2_normalize, nearest_codes


class GroupNorm(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # NHWC
        return nn.GroupNorm(
            num_groups=32, epsilon=1e-6, dtype=self.dtype, name="gn"
        )(x)


def swish(x):
    return x * jax.nn.sigmoid(x)


class ResidualBlock(nn.Module):
    in_channels: int
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = GroupNorm(self.in_channels, dtype=self.dtype, name="norm1")(x)
        h = swish(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = GroupNorm(self.out_channels, dtype=self.dtype, name="norm2")(h)
        h = swish(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if self.in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="channel_up")(x)
        return x + h


class UpSampleBlock(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # nearest 2x then conv3x3 (vqgan.py:49-56)
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv")(x)


class DownSampleBlock(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # asymmetric (0,1,0,1) pad + stride-2 conv
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(self.channels, (3, 3), strides=2, padding=0,
                       dtype=self.dtype, name="conv")(x)


class NonLocalBlock(nn.Module):
    """1x1-conv QKV spatial self-attention with residual (vqgan.py:70-102).

    Reference quirk preserved: ``proj_out`` is constructed but never applied
    in forward (vqgan.py:99-102 returns ``x + A`` directly), so this module
    has no proj_out at all — the converter drops those checkpoint keys."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # NHWC
        b, hh, ww, c = x.shape
        h_ = GroupNorm(c, dtype=self.dtype, name="gn")(x)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(h_)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(h_)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(h_)
        q = q.reshape(b, hh * ww, c)
        k = k.reshape(b, hh * ww, c)
        v = v.reshape(b, hh * ww, c)
        attn = jnp.einsum("bic,bjc->bij", q, k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn * (int(c) ** -0.5), axis=2)
        out = jnp.einsum("bij,bjc->bic", attn.astype(self.dtype), v)
        out = out.reshape(b, hh, ww, c)
        return x + out


def encoder_plan(dim: int):
    """The reference encoder's Sequential layout (vqgan.py:105-134), as a
    typed layer plan shared by the module and the weight converter."""
    channels = [128, 128, 128, 256, 256, 512]
    attn_resolutions = [16]
    num_res_blocks = 2
    resolution = 256
    plan = [("conv_in", nn.Conv, dict(features=channels[0], kernel_size=(3, 3), padding=1))]
    for i in range(len(channels) - 1):
        in_c, out_c = channels[i], channels[i + 1]
        for _ in range(num_res_blocks):
            plan.append(("res", ResidualBlock, dict(in_channels=in_c, out_channels=out_c)))
            in_c = out_c
            if resolution in attn_resolutions:
                plan.append(("attn", NonLocalBlock, dict(channels=in_c)))
        if i != len(channels) - 2:
            plan.append(("down", DownSampleBlock, dict(channels=channels[i + 1])))
            resolution //= 2
    plan += [
        ("res", ResidualBlock, dict(in_channels=channels[-1], out_channels=channels[-1])),
        ("attn", NonLocalBlock, dict(channels=channels[-1])),
        ("res", ResidualBlock, dict(in_channels=channels[-1], out_channels=channels[-1])),
        ("norm", GroupNorm, dict(channels=channels[-1])),
        ("swish", None, None),
        ("conv_out", nn.Conv, dict(features=dim, kernel_size=(3, 3), padding=1)),
    ]
    return plan


def decoder_plan(dim: int):
    """vqgan.py:187-218."""
    channels = [512, 256, 256, 128, 128]
    attn_resolutions = [16]
    num_res_blocks = 3
    resolution = 16
    in_c = channels[0]
    plan = [
        ("conv_in", nn.Conv, dict(features=in_c, kernel_size=(3, 3), padding=1)),
        ("res", ResidualBlock, dict(in_channels=in_c, out_channels=in_c)),
        ("attn", NonLocalBlock, dict(channels=in_c)),
        ("res", ResidualBlock, dict(in_channels=in_c, out_channels=in_c)),
    ]
    for i in range(len(channels)):
        out_c = channels[i]
        for _ in range(num_res_blocks):
            plan.append(("res", ResidualBlock, dict(in_channels=in_c, out_channels=out_c)))
            in_c = out_c
            if resolution in attn_resolutions:
                plan.append(("attn", NonLocalBlock, dict(channels=in_c)))
        if i != 0:
            plan.append(("up", UpSampleBlock, dict(channels=in_c)))
            resolution *= 2
    plan += [
        ("norm", GroupNorm, dict(channels=in_c)),
        ("swish", None, None),
        ("conv_out", nn.Conv, dict(features=3, kernel_size=(3, 3), padding=1)),
    ]
    return plan


class _PlannedStack(nn.Module):
    plan_fn: str  # "encoder" | "decoder"
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        plan = (encoder_plan if self.plan_fn == "encoder" else decoder_plan)(self.dim)
        for idx, (kind, cls, kw) in enumerate(plan):
            if cls is None:  # swish
                x = swish(x)
                continue
            kw = dict(kw)
            if cls is not nn.Conv:
                kw["dtype"] = self.dtype
                x = cls(**kw, name=f"m{idx}")(x)
            else:
                x = nn.Conv(**kw, dtype=self.dtype, name=f"m{idx}")(x)
        return x


class CodebookCNN(nn.Module):
    """CNN-variant codebook (vqgan.py:138-182). Operates on NHWC features."""

    codebook_size: int = 1024
    codebook_dim: int = 256
    beta: float = 0.25

    def setup(self):
        scale = 1.0 / self.codebook_size
        self.embedding = self.param(
            "embedding",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32,
                                                  -scale, scale),
            (self.codebook_size, self.codebook_dim),
        )

    def nearest(self, z_nhwc: jnp.ndarray) -> jnp.ndarray:
        zn = l2_normalize(z_nhwc.astype(jnp.float32))
        en = l2_normalize(self.embedding)
        flat = zn.reshape(-1, self.codebook_dim)
        # bf16 tower -> bf16 distance dots (see ViT Codebook.nearest)
        dot_dtype = jnp.bfloat16 if z_nhwc.dtype == jnp.bfloat16 else None
        return nearest_codes(flat, en, dot_dtype=dot_dtype)  # flat (b·h·w,)

    def __call__(self, z_nhwc):
        zn = l2_normalize(z_nhwc.astype(jnp.float32))
        indices = self.nearest(z_nhwc)
        z_q = l2_normalize(self.embedding[indices]).reshape(zn.shape)
        # β on the SECOND (commitment) term here — CNN variant (vqgan.py:169)
        loss = jnp.mean(
            (jax.lax.stop_gradient(z_q) - zn) ** 2
        ) + self.beta * jnp.mean((z_q - jax.lax.stop_gradient(zn)) ** 2)
        z_q = zn + jax.lax.stop_gradient(z_q - zn)
        return z_q.astype(z_nhwc.dtype), indices, loss

    def indices_to_embeddings(self, indices):
        # (b, hw) -> (b, √hw, √hw, d); NO l2-norm (reference quirk §2.9#7)
        embeds = self.embedding[indices]
        hw = indices.shape[1]
        side = int(hw ** 0.5)
        return embeds.reshape(indices.shape[0], side, side, self.codebook_dim)


class VQGAN(nn.Module):
    """Constructor matches the reference: VQGAN(dim, codebook_size) where
    ``dim`` doubles as the codebook dim (model_factory.py:43-49)."""

    dim: int
    codebook_size: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = _PlannedStack("encoder", self.dim, dtype=self.dtype)
        self.pre_quant = nn.Conv(self.dim, (1, 1), dtype=self.dtype)
        self.codebook = CodebookCNN(self.codebook_size, self.dim)
        self.post_quant = nn.Conv(self.dim, (1, 1), dtype=self.dtype)
        self.decoder = _PlannedStack("decoder", self.dim, dtype=self.dtype)

    def _encode_features(self, imgs_nchw):
        x = jnp.transpose(imgs_nchw, (0, 2, 3, 1))  # NHWC
        z = self.encoder(x)
        return self.pre_quant(z)

    def __call__(self, imgs):
        z = self._encode_features(imgs)
        z_q, _, loss = self.codebook(z)
        rec = self.decoder(self.post_quant(z_q.astype(self.dtype)))
        return jnp.transpose(rec, (0, 3, 1, 2)), loss

    def encode_imgs(self, imgs):
        z = self._encode_features(imgs)
        indices = self.codebook.nearest(z)
        return indices.reshape(imgs.shape[0], -1)

    def decode_indices(self, indices):
        embeds = self.codebook.indices_to_embeddings(indices)
        rec = self.decoder(self.post_quant(embeds.astype(self.dtype)))
        return jnp.transpose(rec, (0, 3, 1, 2))

    @property
    def num_patches(self):
        return 16 * 16  # hardcoded like the reference (vqgan.py:130)
