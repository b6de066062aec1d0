"""GAN trainer for vqgan / vitvqgan (API parity with
/root/reference/trainers/vitgqgan.py:45-231).

Structure per batch mirrors the reference exactly: a discriminator phase
(hinge loss + WGAN-GP on the interpolated images) followed by a generator
phase (codebook + 0.1·adv + w·LPIPS + w·L1 + L2, cfg/vitvqgan.yaml:66-69) —
both fused into ONE jitted step that forwards the generator once (the
reference re-forwards it in the G phase, trainers/vitgqgan.py:148-189, but
g_params don't change between phases, so sharing the forward via jax.vjp is
bit-equivalent). The reference's Python-side ``requires_grad_`` flipping
becomes two separate loss functions differentiated wrt their own params (the
other side is simply not differentiated); DDP-allreduce-in-backward becomes
data-sharded batches under jit (XLA inserts the gradient psum).

Known deviations (documented): GP runs the discriminator with eval-mode
BatchNorm statistics (second-order autodiff through mutable batch stats is
ill-defined); LPIPS uses the native flax tower (training/losses.py) which
equals published LPIPS only when converted pretrained weights are supplied.
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np
import optax

from attention_models_tpu.models.discriminator import NLayerDiscriminator
from attention_models_tpu.training.base_trainer import BaseTrainer
from attention_models_tpu.training.losses import (
    LPIPS,
    g_nonsaturating_loss,
    gradient_penalty,
    hinge_d_loss,
)
from attention_models_tpu.training.optim import build_optimizer
from attention_models_tpu.training.schedules import timm_cosine
from attention_models_tpu.utils.checkpoint import apply_param_patches

log = logging.getLogger(__name__)


class VQGANTrainer(BaseTrainer):
    def __init__(self, cfg, model, dataloaders, pretrained_patches=None):
        super().__init__(cfg, model, dataloaders, pretrained_patches)

        lr = float(cfg.optimizer.params.learning_rate)
        warmup = int(cfg.lr_scheduler.params.warmup_steps)
        decay = cfg.lr_scheduler.params.get("decay_steps")
        total_iters = int(decay) if decay else (
            self.num_epoch * self.num_iters_per_epoch
        )
        self.schedule = timm_cosine(lr, total_iters, warmup)

        self.discr = NLayerDiscriminator(input_nc=3, ndf=64, n_layers=3)
        self.lpips = LPIPS()

        self.per_loss_weight = float(cfg.losses.per_loss_weight)
        self.adv_loss_weight = float(cfg.losses.adv_loss_weight)
        self.logit_laplace_weight = float(cfg.losses.logit_laplace_weight)

        # --- init all states -------------------------------------------------
        res = int(cfg.dataset.preprocessing.resolution)
        dummy = jnp.zeros((1, 3, res, res), jnp.float32)
        g_params = jax.jit(self.model.init)(self.rng(), dummy)
        if self.pretrained_patches:
            g_params = apply_param_patches(g_params, self.pretrained_patches)
        d_vars = jax.jit(
            functools.partial(self.discr.init, train=False)
        )(self.rng(), dummy)
        lpips_params = jax.jit(self.lpips.init)(self.rng(), dummy, dummy)

        g_tx = build_optimizer(cfg, self.schedule, g_params["params"])
        d_tx = build_optimizer(cfg, self.schedule, d_vars["params"])

        self.state = {
            "step": 0,
            "g_params": g_params["params"],
            "g_opt": g_tx.init(g_params["params"]),
            "d_params": d_vars["params"],
            "d_stats": d_vars.get("batch_stats", {}),
            "d_opt": d_tx.init(d_vars["params"]),
        }
        self.lpips_params = lpips_params
        self.g_tx, self.d_tx = g_tx, d_tx
        # training.ema_decay: EMA of the GENERATOR weights only (the
        # discriminator exists for the training signal, not for serving);
        # eval grids render through eval_params("g_params")
        self.ema_init(g_params["params"])
        self.state = self.maybe_resume(self.state)
        self.state, state_sh = self.place_state(self.state)

        model_apply = self.model.apply
        discr_apply = self.discr.apply
        lpips_apply = self.lpips.apply

        @functools.partial(
            jax.jit, donate_argnums=(0,),
            out_shardings=(state_sh, self.replicated),
        )
        def train_step(state, img, rng):
            # ONE generator forward serves both phases. The reference
            # re-forwards the (unchanged) generator in its G phase
            # (trainers/vitgqgan.py:148-189); since g_params don't move
            # between phases, rec is identical — we keep the forward's
            # vjp residuals and push the G-loss cotangent back through
            # them instead of paying the forward twice.
            (rec, codebook_loss), g_vjp = jax.vjp(
                lambda p: model_apply({"params": p}, img), state["g_params"]
            )
            rec_sg = jax.lax.stop_gradient(rec)

            # ---- D phase (hinge + WGAN-GP, reference order: D first) ----
            def d_loss_fn(d_params):
                fake, upd = discr_apply(
                    {"params": d_params, "batch_stats": state["d_stats"]},
                    rec_sg, train=True, mutable=["batch_stats"],
                )
                real, upd = discr_apply(
                    {"params": d_params, "batch_stats": upd["batch_stats"]},
                    img, train=True, mutable=["batch_stats"],
                )
                gp = gradient_penalty(
                    lambda x: discr_apply(
                        {"params": d_params,
                         "batch_stats": state["d_stats"]},
                        x, train=False,
                    ),
                    rng, img, rec_sg,
                )
                loss = hinge_d_loss(fake, real) + gp
                return loss, (upd["batch_stats"], gp)

            (d_loss, (stats, gp)), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True
            )(state["d_params"])
            d_updates, d_opt = self.d_tx.update(
                d_grads, state["d_opt"], state["d_params"]
            )
            d_params = optax.apply_updates(state["d_params"], d_updates)

            # ---- G phase on the same rec, vs the just-updated D ----
            def g_loss_fn(rec, codebook_loss):
                l1 = jnp.mean(jnp.abs(rec - img))
                l2 = jnp.mean((rec - img) ** 2)
                per = jnp.mean(
                    lpips_apply(self.lpips_params, rec.astype(jnp.float32),
                                img.astype(jnp.float32))
                )
                fake = discr_apply(
                    {"params": d_params, "batch_stats": stats},
                    rec, train=False,
                )
                adv = g_nonsaturating_loss(fake)
                loss = (
                    codebook_loss
                    + self.adv_loss_weight * adv
                    + self.per_loss_weight * per
                    + self.logit_laplace_weight * l1
                    + l2
                )
                return loss, {
                    "codebook_loss": codebook_loss, "g_loss": adv,
                    "per_loss": per, "logit_laplace": l1, "l2_loss": l2,
                }

            (_, aux), out_bar = jax.value_and_grad(
                g_loss_fn, argnums=(0, 1), has_aux=True
            )(rec, codebook_loss)
            (g_grads,) = g_vjp(out_bar)
            g_updates, g_opt = self.g_tx.update(
                g_grads, state["g_opt"], state["g_params"]
            )
            g_new = optax.apply_updates(state["g_params"], g_updates)
            state = {
                **state,
                "g_params": g_new,
                "g_opt": g_opt,
                "d_params": d_params,
                "d_stats": stats,
                "d_opt": d_opt,
                "step": state["step"] + 1,
            }
            if "ema" in state:
                state["ema"] = self.ema_update(state, g_new)
            return state, {"d_loss": d_loss, "gp": gp, **aux}

        self._train_step = train_step

        @jax.jit
        def recon(g_params, img):
            return model_apply({"params": g_params}, img)[0]

        self._recon = recon

    def train(self):
        from attention_models_tpu.data.loaders import device_prefetch

        def place(batch):
            img = batch[0] if isinstance(batch, (tuple, list)) else batch
            return self.shard_batch(img)

        start_epoch, skip = self.resume_position()
        for epoch in range(start_epoch, self.num_epoch):
            # deterministic shuffle per epoch index: resumed runs replay
            # the exact permutation the uninterrupted run would have used
            self.train_dl.set_epoch(epoch)
            for it, img in enumerate(device_prefetch(self.train_dl, place)):
                if epoch == start_epoch and it < skip:
                    continue  # mid-epoch resume: already-trained batches
                self.state, metrics = self._train_step(self.state, img,
                                                       self.rng())
                self.run_cadence(metrics)
                if self.check_preemption(self.state):
                    return
        self.finish()

    def on_sample(self):
        self.evaluate()

    def _train_metrics(self, m):
        lr = float(self.schedule(self.opt_step))
        return {"g_lr": lr, "d_lr": lr,
                **{k: float(v) for k, v in m.items()}}

    def evaluate(self):
        from attention_models_tpu.utils.eval_metrics import psnr, fid_score

        eval_fid = bool(self.cfg.training.get("eval_fid", True))
        psnrs, real_feats, rec_feats = [], [], []
        for i, batch in enumerate(self.val_dl):
            if i == 10:
                break
            img = batch[0] if isinstance(batch, (tuple, list)) else batch
            img_p, n = self.pad_batch(img)
            rec = self._recon(self.eval_params("g_params"),
                              self.shard_batch(img_p))
            rec = np.asarray(rec, np.float32)[:n]
            psnrs.append(np.asarray(psnr(
                jnp.clip(jnp.asarray(rec), 0, 1),
                jnp.asarray(np.asarray(img, np.float32)),
            )))
            if eval_fid:
                # seed-0 tower from BaseTrainer.fid_features — the LPIPS
                # tower here is config-seed-initialized, which would make
                # val_fid_vgg incomparable across seeds and trainer types
                real_feats.append(self.fid_features(
                    np.asarray(img, np.float32)))
                rec_feats.append(self.fid_features(np.clip(rec, 0, 1)))
            pair = np.stack([np.asarray(img), rec], 1)
            pair = pair.reshape(-1, *pair.shape[2:])
            self.log_image_grid(
                pair, f"{self.image_saved_dir}/step_{i}.png",
                f"samples/recon_{i}", nrow=6,
            )
        if psnrs:
            # quantitative val fidelity (the reference renders grids only)
            m = {"val_psnr_db": float(np.mean(np.concatenate(psnrs)))}
            if eval_fid:
                m["val_fid_vgg"] = fid_score(
                    np.concatenate(real_feats), np.concatenate(rec_feats)
                )
            self.metrics.log(m, self.global_step)
