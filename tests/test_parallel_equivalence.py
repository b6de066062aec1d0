"""Multi-device semantics: tensor/expert-parallel sharded execution must
reproduce single-device results, and data-parallel gradients must equal
full-batch gradients. Runs on the 8-device virtual CPU mesh (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np

from attention_models_tpu.models.vit_moe import ViTMoE
from attention_models_tpu.models.vitvqgan import ViTVQGAN
from attention_models_tpu.parallel import (
    batch_sharding,
    create_mesh,
    param_shardings,
    shard_pytree,
)


def _tree_allclose(a, b, atol=1e-5):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol,
                                   rtol=1e-4)


def test_vitmoe_tp_ep_matches_single_device():
    model = ViTMoE(dim=64, image_size=32, patch_size=8, n_heads=2, d_head=32,
                   depth=2, n_experts=4, sel_experts=2, num_classes=10,
                   moe_impl="dense")
    imgs = jnp.array(np.random.RandomState(0).rand(8, 3, 32, 32), jnp.float32)
    variables = model.init(jax.random.key(0), imgs)

    ref = jax.jit(model.apply)(variables, imgs)  # single-device

    mesh = create_mesh(data=4, model=2)
    params_sh = shard_pytree(variables["params"],
                             param_shardings(variables["params"], mesh))
    imgs_sh = jax.device_put(imgs, batch_sharding(mesh))
    out = jax.jit(model.apply)({"params": params_sh}, imgs_sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=1e-4)


def test_vitvqgan_dp_gradients_match_single_device():
    model = ViTVQGAN(
        vit_params=dict(dim=64, img_size=16, patch_size=8, n_heads=2,
                        d_head=32, depth=1, mlp_dim=128, dropout=0.0),
        codebook_params=dict(codebook_size=64, codebook_dim=8),
    )
    imgs = jnp.array(np.random.RandomState(1).rand(8, 3, 16, 16), jnp.float32)
    variables = model.init(jax.random.key(0), imgs)

    def loss_fn(params, x):
        rec, cb = model.apply({"params": params}, x)
        return jnp.mean((rec - x) ** 2) + cb

    g_ref = jax.jit(jax.grad(loss_fn))(variables["params"], imgs)

    mesh = create_mesh(data=8, model=1)
    params_sh = shard_pytree(variables["params"],
                             param_shardings(variables["params"], mesh))
    imgs_sh = jax.device_put(imgs, batch_sharding(mesh))
    g_dp = jax.jit(jax.grad(loss_fn))(params_sh, imgs_sh)
    _tree_allclose(g_dp, g_ref, atol=1e-4)


def test_codebook_indices_invariant_to_sharding():
    model = ViTVQGAN(
        vit_params=dict(dim=64, img_size=16, patch_size=8, n_heads=2,
                        d_head=32, depth=1, mlp_dim=128, dropout=0.0),
        codebook_params=dict(codebook_size=64, codebook_dim=8),
    )
    imgs = jnp.array(np.random.RandomState(2).rand(8, 3, 16, 16), jnp.float32)
    variables = model.init(jax.random.key(0), imgs)
    enc = jax.jit(lambda v, x: model.apply(v, x, method=ViTVQGAN.encode_imgs))
    ref = enc(variables, imgs)

    mesh = create_mesh(data=8, model=1)
    imgs_sh = jax.device_put(imgs, batch_sharding(mesh))
    got = enc(variables, imgs_sh)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_generate_data_parallel_matches_single_device():
    """Serving scale-out: the jitted MUSE decode with the prompt batch
    sharded over the data axis reproduces the single-device decode exactly
    (partitionable threefry keeps the per-token sampling draws identical
    under any sharding), so inference batches scale across chips with no
    code changes."""
    from attention_models_tpu.models.muse import MUSE
    from attention_models_tpu.models.text_encoder import tokenize

    vq = dict(
        vit_params=dict(dim=32, img_size=16, patch_size=8, n_heads=2,
                        d_head=16, depth=1, mlp_dim=64, dropout=0.0),
        codebook_params=dict(codebook_size=32, codebook_dim=8),
    )
    m = MUSE(dim=32, vq_config=vq, n_heads=2, d_head=16, depth=1, mult=2,
             dropout=0.0, clip_width=32, clip_layers=1, clip_heads=2)
    ids = jnp.array(tokenize(["a cat", "a dog"] * 4))  # batch 8
    params = m.init(jax.random.key(0), ids,
                    jnp.zeros((1, 3, 16, 16)), jax.random.key(1),
                    method=MUSE.init_all)

    gen = jax.jit(lambda p, i, r: m.apply(p, i, r, timesteps=3,
                                          method=MUSE.generate))
    ref = gen(params, ids, jax.random.key(2))

    mesh = create_mesh(data=8, model=1)
    ids_sh = jax.device_put(ids, batch_sharding(mesh, ndim=2))
    got = gen(params, ids_sh, jax.random.key(2))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fsdp_composes_with_tensor_parallel():
    """FSDP over `data` stacks on the TP rules: a rule-sharded kernel (e.g.
    wq split over `model`) additionally shards a rule-unsharded dim over
    `data`, outputs stay exact, and every large leaf splits 1/(dp*tp)."""
    model = ViTMoE(dim=128, image_size=32, patch_size=8, n_heads=2, d_head=64,
                   depth=2, n_experts=4, sel_experts=2, num_classes=10,
                   moe_impl="dense")
    imgs = jnp.array(np.random.RandomState(0).rand(8, 3, 32, 32), jnp.float32)
    variables = model.init(jax.random.key(0), imgs)
    ref = jax.jit(model.apply)(variables, imgs)

    mesh = create_mesh(data=4, model=2)
    sh = param_shardings(variables["params"], mesh,
                         fsdp_axis="data", fsdp_min_size=1024)
    paths = {str(p): s for p, s in
             jax.tree_util.tree_flatten_with_path(sh)[0]}
    leaves = {str(p): l for p, l in
              jax.tree_util.tree_flatten_with_path(variables["params"])[0]}
    both = [  # leaves carrying model AND data in one spec
        p for p, s in paths.items()
        if "model" in tuple(s.spec) and "data" in tuple(s.spec)
    ]
    assert both, f"no leaf sharded over both axes: " \
        f"{[(p, s.spec) for p, s in list(paths.items())[:8]]}"
    for p in both:
        assert leaves[p].size >= 1024

    params_sh = shard_pytree(variables["params"], sh)
    for p in both:
        leaf = {str(q): l for q, l in
                jax.tree_util.tree_flatten_with_path(params_sh)[0]}[p]
        assert leaf.addressable_shards[0].data.size == leaf.size // 8, p

    imgs_sh = jax.device_put(imgs, batch_sharding(mesh))
    out = jax.jit(model.apply)({"params": params_sh}, imgs_sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=1e-4)
