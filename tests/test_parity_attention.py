"""Numerical parity of attention/MoE primitives vs the actual PyTorch
reference modules (loaded read-only from /root/reference, weights copied via
the torch->flax converters)."""

import jax.numpy as jnp
import numpy as np
import torch

from attention_models_tpu.models.attention import (
    AgentAttention,
    SoftmaxAttention,
    SwitchHeadAttention,
)
from attention_models_tpu.models.moe import MoELayer
from attention_models_tpu.utils.torch_convert import (
    convert_agent_attention,
    convert_moe_layer,
    convert_softmax_attention,
    convert_switchhead_attention,
    state_dict_to_numpy,
)
from ref_loader import load_ref_module

ATOL = 2e-5


def test_softmax_attention_parity():
    ref_mod = load_ref_module("models.softmax_attention")
    torch.manual_seed(0)
    m = ref_mod.SoftmaxAttention(dim=64, num_heads=4, dim_head=16).eval()
    x = torch.randn(2, 12, 64)
    ctx = torch.randn(2, 7, 64)
    causal = torch.ones((12, 12), dtype=torch.bool).triu(1)
    cmask = torch.rand(2, 7) > 0.3

    with torch.no_grad():
        out_self = m(x, causal_mask=causal).numpy()
        out_cross = m(x, context=ctx, context_mask=cmask).numpy()

    params = {"params": convert_softmax_attention(state_dict_to_numpy(m.state_dict()))}
    ours = SoftmaxAttention(dim=64, num_heads=4, dim_head=16)
    got_self = ours.apply(params, jnp.array(x.numpy()), causal=True)
    got_cross = ours.apply(
        params, jnp.array(x.numpy()), context=jnp.array(ctx.numpy()),
        context_mask=jnp.array(cmask.numpy()),
    )
    np.testing.assert_allclose(np.asarray(got_self), out_self, atol=ATOL, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_cross), out_cross, atol=ATOL, rtol=1e-4)


def test_moe_layer_parity():
    ref_mod = load_ref_module("models.moe")
    torch.manual_seed(1)
    m = ref_mod.MoELayer(input_dim=32, output_dim=32, num_experts=6, sel_experts=2).eval()
    x = torch.randn(2, 10, 32)
    with torch.no_grad():
        ref_out = m(x).numpy()

    params = {"params": convert_moe_layer(state_dict_to_numpy(m.state_dict()))}
    for impl in ("dense", "scatter"):
        ours = MoELayer(32, 32, 6, 2, impl=impl)
        got = ours.apply(params, jnp.array(x.numpy()))
        np.testing.assert_allclose(np.asarray(got), ref_out, atol=ATOL, rtol=1e-4)


def test_switchhead_attention_parity():
    ref_mod = load_ref_module("models.switchhead_attention")
    torch.manual_seed(2)
    m = ref_mod.SwitchHeadAttention(
        dim=48, num_heads=4, dim_head=12, num_experts=5, sel_experts=2
    ).eval()
    x = torch.randn(2, 9, 48)
    causal = torch.ones((9, 9), dtype=torch.bool).triu(1)
    with torch.no_grad():
        ref_out = m(x).numpy()
        ref_causal = m(x, causal_mask=causal).numpy()

    params = {
        "params": convert_switchhead_attention(state_dict_to_numpy(m.state_dict()))
    }
    for impl in ("dense", "scatter"):
        ours = SwitchHeadAttention(
            dim=48, num_heads=4, dim_head=12, num_experts=5, sel_experts=2,
            moe_impl=impl,
        )
        got = ours.apply(params, jnp.array(x.numpy()))
        np.testing.assert_allclose(np.asarray(got), ref_out, atol=ATOL, rtol=1e-4)
    got_causal = SwitchHeadAttention(
        dim=48, num_heads=4, dim_head=12, num_experts=5, sel_experts=2
    ).apply(params, jnp.array(x.numpy()), causal=True)
    np.testing.assert_allclose(np.asarray(got_causal), ref_causal, atol=ATOL, rtol=1e-4)


def test_agent_attention_parity():
    ref_mod = load_ref_module("models.agent_attention")
    torch.manual_seed(3)
    # constraint: num_heads == int(agent_num ** 0.5) (SURVEY §2.1)
    m = ref_mod.AgentAttention(
        dim=32, num_heads=3, dim_head=8, agent_num=9
    ).eval()
    x = torch.randn(2, 11, 32)
    with torch.no_grad():
        ref_out = m(x).numpy()

    params = {"params": convert_agent_attention(state_dict_to_numpy(m.state_dict()))}
    ours = AgentAttention(dim=32, num_heads=3, dim_head=8, agent_num=9)
    got = ours.apply(params, jnp.array(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), ref_out, atol=ATOL, rtol=1e-4)
