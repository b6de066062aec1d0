"""Parity of the full seq2seq Transformer (encoder-decoder stacks, GEGLU FFN,
gamma LayerNorm, sinusoidal PE) vs the PyTorch reference."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from attention_models_tpu.models.transformer import Transformer
from attention_models_tpu.utils.torch_convert import (
    convert_transformer,
    state_dict_to_numpy,
)
from ref_loader import load_ref_module


def test_seq2seq_transformer_forward_parity():
    ref_mod = load_ref_module("models.transformer")
    torch.manual_seed(0)
    m = ref_mod.Transformer(
        dim=32, vocab_size=50, n_heads=2, d_head=16,
        enc_depth=2, dec_depth=2, n_classes=50,
    ).eval()
    src = torch.randint(0, 50, (2, 9))
    tgt = torch.randint(0, 50, (2, 7))
    with torch.no_grad():
        ref_out = m(src, tgt).numpy()

    params = {
        "params": convert_transformer(
            state_dict_to_numpy(m.state_dict()), enc_depth=2, dec_depth=2
        )
    }
    ours = Transformer(
        dim=32, vocab_size=50, n_heads=2, d_head=16,
        enc_depth=2, dec_depth=2, n_classes=50,
    )
    got = ours.apply(params, jnp.array(src.numpy()), jnp.array(tgt.numpy()))
    np.testing.assert_allclose(np.asarray(got), ref_out, atol=3e-5, rtol=1e-4)


def test_generate_is_bounded_and_jittable():
    ours = Transformer(
        dim=32, vocab_size=50, n_heads=2, d_head=16,
        enc_depth=1, dec_depth=1, n_classes=50,
    )
    src = jnp.array(np.random.RandomState(0).randint(0, 50, (2, 5)))
    params = ours.init(jax.random.key(0), src, src[:, :3])

    @jax.jit
    def gen(params, src, rng):
        return ours.apply(params, src, rng, max_len=12, method=Transformer.generate)

    out = gen(params, src, jax.random.key(1))
    assert out.shape == (2, 13)
    assert int(out[0, 0]) == 1  # start token
