"""CLIP text encoder (frozen conditioning tower for Muse/Parti).

The reference wraps HF ``CLIPTextModel`` + ``CLIPTokenizer``
(/root/reference/models/muse.py:32-53, parti.py:29-44). Here the same
architecture is implemented natively in flax (token+position embeddings,
pre-LN causal transformer with quick-GELU MLP, final LN) so the conditioning
tower runs inside the jitted TPU graph, with a converter for HF CLIP torch
weights (``convert_hf_clip_text``). Tokenization is host-side: HF tokenizer
when its vocab is available locally, otherwise a deterministic hash tokenizer
(offline-safe; conditioning is then learned from scratch).
"""

from __future__ import annotations

import hashlib
from typing import List

import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from attention_models_tpu.models.layers import LayerNorm
from attention_models_tpu.ops.attention import make_causal_mask, multihead_attention

CLIP_VOCAB = 49408
CLIP_BOS = 49406
CLIP_EOS = 49407


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class ClipTextBlock(nn.Module):
    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        d_head = self.width // self.heads
        h = LayerNorm(self.width, dtype=self.dtype, name="ln1")(x)
        qkv_dim = self.width
        q = nn.Dense(qkv_dim, dtype=self.dtype, name="wq")(h)
        k = nn.Dense(qkv_dim, dtype=self.dtype, name="wk")(h)
        v = nn.Dense(qkv_dim, dtype=self.dtype, name="wv")(h)
        reshape = lambda t: t.reshape(*t.shape[:-1], self.heads, d_head).transpose(
            0, 2, 1, 3
        )
        out = multihead_attention(
            reshape(q), reshape(k), reshape(v),
            scale=d_head ** -0.5, causal_mask=causal_mask,
        )
        out = out.transpose(0, 2, 1, 3).reshape(*x.shape)
        x = x + nn.Dense(self.width, dtype=self.dtype, name="wo")(out)
        h = LayerNorm(self.width, dtype=self.dtype, name="ln2")(x)
        h = nn.Dense(self.width * 4, dtype=self.dtype, name="fc1")(h)
        h = quick_gelu(h)
        x = x + nn.Dense(self.width, dtype=self.dtype, name="fc2")(h)
        return x


class ClipTextModel(nn.Module):
    """openai/clip-vit-large-patch14 text tower defaults (width 768, 12 layers
    x 12 heads, 77 positions)."""

    width: int = 768
    layers: int = 12
    heads: int = 12
    max_length: int = 77
    vocab_size: int = CLIP_VOCAB
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids):  # (b, t) int32
        t = input_ids.shape[1]
        x = nn.Embed(self.vocab_size, self.width, dtype=self.dtype,
                     name="token_embedding")(input_ids)
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.01),
            (self.max_length, self.width), jnp.float32,
        )
        x = x + pos[:t].astype(x.dtype)
        cm = make_causal_mask(t, t)
        for i in range(self.layers):
            x = ClipTextBlock(self.width, self.heads, dtype=self.dtype,
                              name=f"layers_{i}")(x, cm)
        return LayerNorm(self.width, dtype=self.dtype, name="final_ln")(x)


class TextEncoder(nn.Module):
    """CLIP text tower + optional Linear(width → dim) projection, matching
    MUSE.TextEncoder (muse.py:32-53; Parti's variant has no projection)."""

    dim: int
    max_length: int = 77
    project: bool = True
    clip_width: int = 768
    clip_layers: int = 12
    clip_heads: int = 12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids):
        embeds = ClipTextModel(
            self.clip_width, self.clip_layers, self.clip_heads,
            self.max_length, dtype=self.dtype, name="clip",
        )(input_ids)
        if self.project:
            embeds = nn.Dense(self.dim, dtype=self.dtype, name="project_embeds")(
                embeds
            )
        return embeds


# --------------------------------------------------------------------------- #
# Host-side tokenization
# --------------------------------------------------------------------------- #

_HF_TOKENIZER = None
_HF_TRIED = False


def _try_hf_tokenizer():
    global _HF_TOKENIZER, _HF_TRIED
    if _HF_TRIED:
        return _HF_TOKENIZER
    _HF_TRIED = True
    try:  # only works when the vocab is already on disk (offline env)
        from transformers import CLIPTokenizer

        _HF_TOKENIZER = CLIPTokenizer.from_pretrained(
            "openai/clip-vit-large-patch14", local_files_only=True
        )
    except Exception:
        _HF_TOKENIZER = None
    return _HF_TOKENIZER


def _hash_token(word: str) -> int:
    h = int.from_bytes(hashlib.md5(word.encode()).digest()[:4], "little")
    return h % CLIP_BOS  # keep clear of BOS/EOS ids


def tokenize(texts: List[str], max_length: int = 77) -> np.ndarray:
    """(b, max_length) int32, BOS ... EOS then EOS-padding (CLIP convention)."""
    tok = _try_hf_tokenizer()
    if tok is not None:
        out = tok(texts, return_tensors="np", max_length=max_length,
                  padding="max_length", truncation=True)
        return out["input_ids"].astype(np.int32)
    ids = np.full((len(texts), max_length), CLIP_EOS, np.int32)
    for i, text in enumerate(texts):
        words = text.lower().split()[: max_length - 2]
        row = [CLIP_BOS] + [_hash_token(w) for w in words] + [CLIP_EOS]
        ids[i, : len(row)] = row
    return ids
