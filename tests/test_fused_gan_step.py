"""The fused single-forward GAN train step must be bit-equivalent to the
reference's two-phase structure (D phase re-forwarding the generator, then a
G phase forwarding it again — /root/reference/trainers/vitgqgan.py:148-189).

VQGANTrainer shares ONE generator forward between the phases via jax.vjp
(g_params don't change between them, so the reference's second forward is
redundant). This test reconstructs the explicit two-forward step from the
trainer's own pieces and asserts the post-step states match exactly.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from attention_models_tpu.data import build_loader
from attention_models_tpu.models.factory import build_model
from attention_models_tpu.training import build_trainer
from attention_models_tpu.training.losses import (
    g_nonsaturating_loss,
    gradient_penalty,
    hinge_d_loss,
)
from attention_models_tpu.utils.config import load_config

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "cfg_exp")


def _tree_allclose(a, b):
    # tight but not bit-exact: the fused and two-phase steps are separate
    # XLA programs, so the backend may reassociate float ops a few ulps
    # apart (bit-equality holds on CPU today but is not a compiler contract)
    flat_a, flat_b = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(x, np.float64), np.asarray(y, np.float64),
            rtol=1e-5, atol=1e-7,
        )


@pytest.mark.slow
def test_fused_gan_step_matches_two_phase(tmp_path):
    cfg = load_config(os.path.join(CFG_DIR, "vitvqgan_overfit.yaml"))
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        model, patches = build_model(cfg)
        loaders = build_loader(cfg)
        trainer = build_trainer(cfg, model, loaders,
                                pretrained_patches=patches)
    finally:
        os.chdir(cwd)

    img = jnp.asarray(
        np.random.RandomState(0).rand(2, 3, 32, 32), jnp.float32
    )
    rng = jax.random.key(7)
    state0 = jax.tree.map(jnp.copy, trainer.state)

    # --- explicit two-phase step built from the trainer's own pieces ------
    def two_phase(state, img, rng):
        rec_d, _ = trainer.model.apply({"params": state["g_params"]}, img)
        rec_d = jax.lax.stop_gradient(rec_d)

        def d_loss_fn(d_params):
            fake, upd = trainer.discr.apply(
                {"params": d_params, "batch_stats": state["d_stats"]},
                rec_d, train=True, mutable=["batch_stats"],
            )
            real, upd = trainer.discr.apply(
                {"params": d_params, "batch_stats": upd["batch_stats"]},
                img, train=True, mutable=["batch_stats"],
            )
            gp = gradient_penalty(
                lambda x: trainer.discr.apply(
                    {"params": d_params, "batch_stats": state["d_stats"]},
                    x, train=False,
                ),
                rng, img, rec_d,
            )
            return hinge_d_loss(fake, real) + gp, upd["batch_stats"]

        (d_loss, stats), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state["d_params"])
        d_updates, d_opt = trainer.d_tx.update(
            d_grads, state["d_opt"], state["d_params"]
        )
        d_params = optax.apply_updates(state["d_params"], d_updates)

        # G phase: the reference's SECOND generator forward
        def g_loss_fn(g_params):
            rec, cb = trainer.model.apply({"params": g_params}, img)
            l1 = jnp.mean(jnp.abs(rec - img))
            l2 = jnp.mean((rec - img) ** 2)
            per = jnp.mean(
                trainer.lpips.apply(
                    trainer.lpips_params, rec.astype(jnp.float32),
                    img.astype(jnp.float32),
                )
            )
            fake = trainer.discr.apply(
                {"params": d_params, "batch_stats": stats}, rec, train=False,
            )
            adv = g_nonsaturating_loss(fake)
            return (
                cb
                + trainer.adv_loss_weight * adv
                + trainer.per_loss_weight * per
                + trainer.logit_laplace_weight * l1
                + l2
            )

        g_grads = jax.grad(g_loss_fn)(state["g_params"])
        g_updates, g_opt = trainer.g_tx.update(
            g_grads, state["g_opt"], state["g_params"]
        )
        return {
            **state,
            "g_params": optax.apply_updates(state["g_params"], g_updates),
            "g_opt": g_opt,
            "d_params": d_params,
            "d_stats": stats,
            "d_opt": d_opt,
            "step": state["step"] + 1,
        }, d_loss

    expected, d_loss = jax.jit(two_phase)(
        jax.tree.map(jnp.copy, state0), img, rng
    )
    got, metrics = trainer._train_step(
        jax.tree.map(jnp.copy, state0), img, rng
    )

    # same D loss, same post-step G/D params + optimizer moments
    np.testing.assert_allclose(
        float(metrics["d_loss"]), float(d_loss), rtol=1e-5, atol=1e-7
    )
    for k in ("g_params", "d_params", "d_stats", "g_opt", "d_opt"):
        _tree_allclose(got[k], expected[k])
    assert int(got["step"]) == int(expected["step"]) == 1
