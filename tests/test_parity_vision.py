"""Parity of the vision models vs the PyTorch reference: ViTVQGAN (with the
snapshot's broken FFN repaired in-test the same way the rebuild repairs it),
CNN VQGAN, PatchGAN discriminator and ViT-MoE."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from attention_models_tpu.models.discriminator import NLayerDiscriminator
from attention_models_tpu.models.vit_moe import ViTMoE
from attention_models_tpu.models.vitvqgan import ViTVQGAN
from attention_models_tpu.models.vqgan import VQGAN
from attention_models_tpu.utils.torch_convert import (
    convert_discriminator,
    convert_vit_moe,
    convert_vitvqgan,
    convert_vqgan,
    state_dict_to_numpy,
)
from ref_loader import load_ref_module


def _repaired_ff(dim, mlp_dim):
    """The working xFormers-style MLP the snapshot intended (SURVEY §2.9#1)."""
    hidden = (int(mlp_dim * 2 / 3) + 7) // 8 * 8
    return nn.Sequential(nn.Linear(dim, hidden), nn.GELU(), nn.Linear(hidden, dim))


def test_vitvqgan_full_parity():
    ref = load_ref_module("models.vitvqgan")
    ref.FeedForward = _repaired_ff  # repair the broken snapshot class
    torch.manual_seed(0)
    vit_params = dict(dim=64, img_size=32, patch_size=8, n_heads=2, d_head=32,
                      depth=2, mlp_dim=128, dropout=0.0)
    cb_params = dict(codebook_dim=16, codebook_size=64)
    m = ref.ViTVQGAN(vit_params, cb_params).eval()
    imgs = torch.rand(2, 3, 32, 32)
    with torch.no_grad():
        rec_ref, loss_ref = m(imgs)
        idx_ref = m.encode_imgs(imgs)
        dec_ref = m.decode_indices(idx_ref)

    params = {
        "params": convert_vitvqgan(state_dict_to_numpy(m.state_dict()), depth=2)
    }
    ours = ViTVQGAN(vit_params=vit_params, codebook_params=cb_params)
    ji = jnp.array(imgs.numpy())

    rec, loss = ours.apply(params, ji)
    idx = ours.apply(params, ji, method=ViTVQGAN.encode_imgs)
    dec = ours.apply(params, jnp.array(idx_ref.numpy()),
                     method=ViTVQGAN.decode_indices)

    np.testing.assert_array_equal(np.asarray(idx), idx_ref.numpy())  # bit-match
    np.testing.assert_allclose(np.asarray(rec), rec_ref.numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(float(loss), float(loss_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dec), dec_ref.numpy(), atol=1e-4, rtol=1e-4)


def test_vqgan_cnn_full_parity():
    ref = load_ref_module("models.vqgan")
    torch.manual_seed(1)
    m = ref.VQGAN(dim=32, codebook_size=64).eval()
    imgs = torch.rand(1, 3, 64, 64)
    with torch.no_grad():
        rec_ref, loss_ref = m(imgs)
        idx_ref = m.encode_imgs(imgs)
        dec_ref = m.decode_indices(idx_ref)

    params = {"params": convert_vqgan(state_dict_to_numpy(m.state_dict()))}
    ours = VQGAN(dim=32, codebook_size=64)
    ji = jnp.array(imgs.numpy())

    rec, loss = ours.apply(params, ji)
    idx = ours.apply(params, ji, method=VQGAN.encode_imgs)
    dec = ours.apply(params, jnp.array(idx_ref.numpy()),
                     method=VQGAN.decode_indices)

    np.testing.assert_array_equal(np.asarray(idx).reshape(-1), idx_ref.numpy().reshape(-1))
    np.testing.assert_allclose(np.asarray(rec), rec_ref.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(float(loss), float(loss_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dec), dec_ref.numpy(), atol=2e-4, rtol=1e-3)


def test_discriminator_parity_eval_mode():
    # through ref_loader so a missing reference checkout SKIPS like every
    # other parity test instead of erroring
    ref = load_ref_module("models.utils.discriminator")
    torch.manual_seed(2)
    m = ref.NLayerDiscriminator(input_nc=3, ndf=16, n_layers=3).eval()
    imgs = torch.rand(2, 3, 64, 64)
    with torch.no_grad():
        out_ref = m(imgs).numpy()

    params, stats = convert_discriminator(state_dict_to_numpy(m.state_dict()))
    ours = NLayerDiscriminator(input_nc=3, ndf=16, n_layers=3)
    got = ours.apply(
        {"params": params, "batch_stats": stats}, jnp.array(imgs.numpy()),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(got), out_ref, atol=1e-4, rtol=1e-4)


def test_vit_moe_parity():
    ref = load_ref_module("models.vit_moe")
    torch.manual_seed(3)
    m = ref.ViTMoE(
        dim=64, image_size=32, patch_size=8, n_heads=2, d_head=16, depth=2,
        n_experts=4, sel_experts=2, dropout=0.0, num_classes=10,
    ).eval()
    imgs = torch.rand(2, 3, 32, 32)
    with torch.no_grad():
        out_ref = m(imgs).numpy()

    params = {
        "params": convert_vit_moe(state_dict_to_numpy(m.state_dict()), depth=2)
    }
    ours = ViTMoE(
        dim=64, image_size=32, patch_size=8, n_heads=2, d_head=16, depth=2,
        n_experts=4, sel_experts=2, dropout=0.0, num_classes=10,
    )
    got = ours.apply(params, jnp.array(imgs.numpy()))
    np.testing.assert_allclose(np.asarray(got), out_ref, atol=5e-5, rtol=1e-4)


def test_vit_shapes_and_jit():
    from attention_models_tpu.models.vit import ViT

    m = ViT(dim=64, image_size=32, patch_size=8, n_heads=2, d_head=16,
            depth=2, mlp_dim=128, num_classes=10)
    x = jnp.zeros((2, 3, 32, 32))
    params = m.init(jax.random.key(0), x)
    out = jax.jit(m.apply)(params, x)
    assert out.shape == (2, 10)
    # the fixed ViT must have a real mlp_dim-wide FFN (SURVEY §2.9#3)
    assert params["params"]["layers_0"]["mlp"]["mlp_in"]["kernel"].shape == (64, 128)


def test_vitvqgan_full_parity_released_config():
    """Bit-match at the RELEASED checkpoint's production shapes (dim 512,
    patch 8, depth 6, 8192x32 codebook, 256 px — inference/vitvqgan.py:35-44)
    on real image content (the reference's committed sample grids), so the
    converter + numerics are proven where VitVQGAN.pt actually lives."""
    import os

    from PIL import Image

    ref = load_ref_module("models.vitvqgan")
    ref.FeedForward = _repaired_ff
    torch.manual_seed(7)
    vit_params = dict(dim=512, img_size=256, patch_size=8, n_heads=8,
                      d_head=64, depth=6, mlp_dim=2048, dropout=0.0)
    cb_params = dict(codebook_dim=32, codebook_size=8192)
    m = ref.ViTVQGAN(vit_params, cb_params).eval()

    img_path = "/root/reference/outputs/vitvqgan/images/step_0.png"
    if not os.path.exists(img_path):
        import pytest

        pytest.skip("reference sample image not available")
    pil = Image.open(img_path).convert("RGB").resize((256, 256),
                                                     Image.BILINEAR)
    arr = np.asarray(pil, np.float32) / 255.0
    imgs = torch.from_numpy(arr.transpose(2, 0, 1)[None])

    with torch.no_grad():
        idx_ref = m.encode_imgs(imgs)
        dec_ref = m.decode_indices(idx_ref)

    params = {
        "params": convert_vitvqgan(state_dict_to_numpy(m.state_dict()),
                                   depth=6)
    }
    ours = ViTVQGAN(vit_params=vit_params, codebook_params=cb_params)
    ji = jnp.array(imgs.numpy())
    idx = ours.apply(params, ji, method=ViTVQGAN.encode_imgs)
    dec = ours.apply(params, jnp.array(idx_ref.numpy()),
                     method=ViTVQGAN.decode_indices)

    assert idx.shape == (1, 1024)
    np.testing.assert_array_equal(np.asarray(idx), idx_ref.numpy())
    np.testing.assert_allclose(np.asarray(dec), dec_ref.numpy(),
                               atol=2e-4, rtol=2e-4)


def test_patch_embed_conv_fast_path_matches_exact():
    """PatchEmbedding's TPU conv-form fast path (LN1+Linear refolded into a
    strided conv + window statistics — same parameters, no layout-hostile
    rearrange) must numerically match the exact unfused formulation. Gate
    monkeypatched on (the CPU mesh is not a TPU); both paths run bf16 so
    the only difference is the refold's summation order."""
    import attention_models_tpu.models.vit as vit_mod

    pe = vit_mod.PatchEmbedding(dim=128, patch_size=8, dtype=jnp.bfloat16)
    imgs = jnp.array(np.random.RandomState(0).rand(2, 3, 32, 32) * 2 - 1,
                     jnp.bfloat16)
    params = pe.init(jax.random.key(0), imgs)
    # param pytree is the LayerNorm/Dense-compatible one (checkpoints,
    # converters, TP rules key on these paths)
    assert set(params["params"].keys()) == {"norm1", "proj", "norm2"}
    assert set(params["params"]["norm1"].keys()) == {"gamma", "beta"}
    assert set(params["params"]["proj"].keys()) == {"kernel", "bias"}

    exact = pe.apply(params, imgs)

    orig = vit_mod._patch_embed_fast
    vit_mod._patch_embed_fast = lambda dtype: True
    try:
        fast = pe.apply(params, imgs)
    finally:
        vit_mod._patch_embed_fast = orig

    assert fast.shape == exact.shape == (2, 16, 128)
    np.testing.assert_allclose(np.asarray(fast, np.float32),
                               np.asarray(exact, np.float32),
                               atol=0.1, rtol=0.05)


def test_patch_embed_exact_path_bit_identical_to_module_composition():
    """The r5 PatchEmbedding refactor reads raw params (param-only
    stand-ins) but its exact path must stay BIT-identical to the original
    LayerNorm→Dense→LayerNorm module composition in fp32 — the golden
    bit-match contract rides on it (vitvqgan encode indices)."""
    from einops import rearrange

    from attention_models_tpu.models.layers import LayerNorm
    from attention_models_tpu.models.vit import PatchEmbedding

    pe = PatchEmbedding(dim=64, patch_size=4, dtype=jnp.float32)
    imgs = jnp.array(np.random.RandomState(1).rand(2, 3, 16, 16) * 2 - 1,
                     jnp.float32)
    params = pe.init(jax.random.key(3), imgs)
    got = pe.apply(params, imgs)

    import flax.linen as fnn

    class Original(fnn.Module):
        @fnn.compact
        def __call__(self, imgs):
            x = rearrange(imgs, "b c (h p1) (w p2) -> b (h w) (p1 p2 c)",
                          p1=4, p2=4)
            x = LayerNorm(x.shape[-1], dtype=jnp.float32, name="norm1")(x)
            x = fnn.Dense(64, dtype=jnp.float32, name="proj")(x)
            return LayerNorm(64, dtype=jnp.float32, name="norm2")(x)

    want = Original().apply(params, imgs)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
