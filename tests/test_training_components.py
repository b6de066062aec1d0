"""Unit tests for training components: LR schedules vs the HF/timm
implementations the reference uses, optimizer masking, GAN losses vs torch,
and orbax checkpoint resume round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import torch

from attention_models_tpu.training.losses import (
    g_nonsaturating_loss,
    gradient_penalty,
    hinge_d_loss,
)
from attention_models_tpu.training.optim import decay_mask, frozen_mask
from attention_models_tpu.training.schedules import (
    constant_with_warmup,
    cosine_with_warmup,
    timm_cosine,
)


def test_cosine_with_warmup_matches_hf():
    from transformers import get_cosine_schedule_with_warmup

    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=1.0)
    sched = get_cosine_schedule_with_warmup(opt, num_warmup_steps=10,
                                            num_training_steps=100)
    ours = cosine_with_warmup(1.0, 10, 100)
    hf_lrs = []
    for step in range(100):
        hf_lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()
    our_lrs = [float(ours(s)) for s in range(100)]
    np.testing.assert_allclose(our_lrs, hf_lrs, atol=1e-6)


def test_constant_with_warmup_matches_hf():
    from transformers import get_constant_schedule_with_warmup

    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=0.5)
    sched = get_constant_schedule_with_warmup(opt, num_warmup_steps=5)
    ours = constant_with_warmup(0.5, 5)
    for step in range(20):
        assert abs(float(ours(step)) - opt.param_groups[0]["lr"]) < 1e-7, step
        opt.step()
        sched.step()


def test_timm_cosine_shape():
    fn = timm_cosine(1e-4, t_initial=1000, warmup_t=100,
                     warmup_lr_init=1e-6, lr_min=5e-5)
    assert abs(float(fn(0)) - 1e-6) < 1e-9
    assert abs(float(fn(100)) - 1e-4) < 1e-8
    assert abs(float(fn(1000)) - 5e-5) < 1e-8
    assert float(fn(550)) > 5e-5


def test_gan_losses_match_torch():
    rs = np.random.RandomState(0)
    fake = rs.randn(4, 1, 8, 8).astype(np.float32)
    real = rs.randn(4, 1, 8, 8).astype(np.float32)
    ft, rt = torch.from_numpy(fake), torch.from_numpy(real)
    d_ref = 0.5 * (
        torch.mean(torch.relu(1.0 - rt)) + torch.mean(torch.relu(1.0 + ft))
    )
    g_ref = torch.nn.functional.softplus(-ft).mean()
    assert abs(float(hinge_d_loss(jnp.array(fake), jnp.array(real)))
               - float(d_ref)) < 1e-6
    assert abs(float(g_nonsaturating_loss(jnp.array(fake))) - float(g_ref)) < 1e-6


def test_gradient_penalty_zero_for_linear_unit_norm_disc():
    # D(x) = sum over channel dim with weight 1 -> grad = 1 per channel
    # entry; channel-dim norm = 1 everywhere -> GP = 0
    def disc(x):
        return jnp.sum(x * jnp.array([1.0, 0.0, 0.0])[None, :, None, None])

    real = jnp.ones((2, 3, 4, 4))
    fake = jnp.zeros((2, 3, 4, 4))
    gp = gradient_penalty(disc, jax.random.key(0), real, fake)
    assert abs(float(gp)) < 1e-8


def test_masks():
    params = {
        "encoder": {"ff_in": {"kernel": jnp.zeros((4, 4)),
                              "bias": jnp.zeros((4,))}},
        "vq": {"codebook": {"embedding": jnp.zeros((8, 2))}},
        "norm": {"gamma": jnp.zeros((4,))},
    }
    dm = decay_mask(params)
    assert dm["encoder"]["ff_in"]["kernel"] is True
    assert dm["encoder"]["ff_in"]["bias"] is False
    assert dm["norm"]["gamma"] is False
    assert dm["vq"]["codebook"]["embedding"] is False  # name 'embedding'
    fm = frozen_mask(params, ("vq",))
    assert fm["vq"]["codebook"]["embedding"] is False
    assert fm["encoder"]["ff_in"]["kernel"] is True


def test_checkpoint_roundtrip(tmp_path):
    from attention_models_tpu.utils.checkpoint import CheckpointManager

    tx = optax.adam(1e-3)
    params = {"w": jnp.arange(4.0), "b": jnp.zeros(2)}
    state = {"step": 7, "params": params, "opt": tx.init(params)}
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(7, state)
    mgr.wait()  # saves are async; restore below models a LATER process

    template = jax.tree.map(jnp.zeros_like, state)
    template["step"] = 0
    restored = CheckpointManager(str(tmp_path / "ckpt")).restore(template)
    assert int(restored["step"]) == 7
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.arange(4.0))
    # optimizer state restored too (count + moments)
    assert jax.tree.structure(restored["opt"]) == jax.tree.structure(state["opt"])


def test_factory_loads_frozen_vq_from_orbax_dir(tmp_path):
    """load_vq_checkpoint accepts an ORBAX run directory (the output of
    this framework's own VQGANTrainer): restore_params_auto rebuilds the
    g_params subtree from checkpoint metadata alone (no live template) and
    prefers EMA weights when present — so generators can train over a
    tokenizer trained here without any torch round-trip."""
    from attention_models_tpu.models.factory import load_vq_checkpoint
    from attention_models_tpu.utils.checkpoint import CheckpointManager

    g_params = {"encoder": {"w": jnp.arange(6.0).reshape(2, 3)},
                "codebook": {"embedding": jnp.ones((4, 2))}}
    state = {"step": 11, "g_params": g_params,
             "ema": {"encoder": {"w": jnp.full((2, 3), 5.0)}}}
    mgr = CheckpointManager(str(tmp_path / "run"))
    mgr.save(11, state)
    mgr.wait()

    restored = load_vq_checkpoint(str(tmp_path / "run"), depth=6)
    # EMA overlay wins for the subtree it covers
    np.testing.assert_array_equal(np.asarray(restored["encoder"]["w"]),
                                  np.full((2, 3), 5.0))
    np.testing.assert_array_equal(np.asarray(restored["codebook"]["embedding"]),
                                  np.ones((4, 2)))
    # missing path -> None (random-init tokenizer), not an exception
    assert load_vq_checkpoint(str(tmp_path / "nope"), depth=6) is None


def test_max_grad_norm_clips_update():
    """training.max_grad_norm must actually bound the gradient entering the
    optimizer (optax.clip_by_global_norm chained FIRST in build_optimizer).
    Adam's update is scale-invariant, so observe the clip through the adam
    moments: with clipping the first-step moments reflect a norm-1
    gradient; without, they reflect the raw norm-50 one."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from attention_models_tpu.training.optim import build_optimizer
    from attention_models_tpu.utils.config import Config

    def first_step_moment_max(clip):
        cfg = Config({
            "optimizer": {"name": "adam", "params": {
                "learning_rate": 1.0, "beta1": 0.9, "beta2": 0.999}},
            "training": ({"max_grad_norm": 1.0} if clip else {}),
        })
        params = {"w": jnp.zeros((2,))}
        tx = build_optimizer(cfg, lambda step: 0.1, params)
        g = {"w": jnp.array([30.0, 40.0])}  # global norm 50
        _, state = tx.update(g, tx.init(params), params)
        return max(float(jnp.max(jnp.abs(l)))
                   for l in jax.tree.leaves(state)
                   if jnp.issubdtype(l.dtype, jnp.floating))  # skip count

    clipped = first_step_moment_max(clip=True)
    raw = first_step_moment_max(clip=False)
    # mu = (1-b1)*g: 0.08 for the norm-1 clipped grad vs 4.0 raw
    assert clipped < 0.5 < raw, (clipped, raw)
