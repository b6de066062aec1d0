"""The reference README's usage snippets are its de-facto public API contract
(SURVEY.md §4.2). Each documented constructor call + forward shape is
reproduced here with the flax equivalents."""

import jax
import jax.numpy as jnp
import numpy as np

from attention_models_tpu.models import (
    AgentAttention,
    MoELayer,
    SoftmaxAttention,
    SwitchHeadAttention,
    Transformer,
    ViT,
    ViTMoE,
)
from attention_models_tpu.ops.attention import make_causal_mask
import pytest

KEY = jax.random.key(0)


def test_softmax_attention_snippet():  # README.md:97-109
    attention = SoftmaxAttention(dim=512, num_heads=16, dim_head=64)
    x = jnp.zeros((2, 10, 512))
    mask = make_causal_mask(10, 10)
    params = attention.init(KEY, x, causal_mask=mask)
    out = attention.apply(params, x, causal_mask=mask)
    assert out.shape == (2, 10, 512)


def test_agent_attention_snippet():  # README.md:118-127
    attention = AgentAttention(dim=384, num_heads=6, dim_head=64)  # agent 47
    x = jnp.zeros((2, 10, 384))
    params = attention.init(KEY, x)
    assert attention.apply(params, x).shape == (2, 10, 384)


def test_switchhead_snippet():  # README.md:135-147
    attention = SwitchHeadAttention(dim=512, num_heads=2, dim_head=64,
                                    num_experts=5)
    x = jnp.zeros((2, 10, 512))
    params = attention.init(KEY, x)
    assert attention.apply(params, x).shape == (2, 10, 512)


def test_moe_snippet():  # models/moe.py __main__ block
    moe = MoELayer(input_dim=512, output_dim=512, num_experts=6,
                   sel_experts=2)
    x = jnp.zeros((2, 10, 512))
    params = moe.init(KEY, x)
    assert moe.apply(params, x).shape == (2, 10, 512)


def test_transformer_snippet():  # README.md:55-89
    transformer = Transformer(dim=512, vocab_size=1000, n_heads=16, d_head=64,
                              enc_depth=2, dec_depth=2, n_classes=1000)
    src = jnp.zeros((2, 10), jnp.int32)
    tgt = jnp.zeros((2, 20), jnp.int32)
    params = transformer.init(KEY, src, tgt)
    out = transformer.apply(params, src, tgt)
    assert out.shape == (2, 20, 1000)


def test_vit_snippet():  # README.md:149-157
    model = ViT(1024, image_size=256, patch_size=32, depth=1, n_heads=16,
                mlp_dim=2048, dropout=0.0, num_classes=1000)
    x = jnp.zeros((2, 3, 256, 256))
    params = model.init(KEY, x)
    assert model.apply(params, x).shape == (2, 1000)


@pytest.mark.slow
def test_vit_moe_snippet():  # README.md:165-182
    model = ViTMoE(dim=256, image_size=64, patch_size=32, n_heads=4,
                   d_head=64, depth=1, n_experts=8, sel_experts=2,
                   num_classes=1000)
    x = jnp.zeros((2, 3, 64, 64))
    params = model.init(KEY, x)
    assert model.apply(params, x).shape == (2, 1000)
