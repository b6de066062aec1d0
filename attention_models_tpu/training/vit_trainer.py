"""Classification trainer for ViT / ViT-MoE (API parity with
/root/reference/trainers/vit.py:13-112): AdamW + HF cosine-with-warmup, CE
loss, train/val accuracy logging. Device placement bugs of the reference
(§2.9#6) don't exist here — the whole batch is sharded onto the mesh."""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np
import optax

from attention_models_tpu.training.base_trainer import BaseTrainer
from attention_models_tpu.training.optim import build_optimizer
from attention_models_tpu.training.schedules import cosine_with_warmup

log = logging.getLogger(__name__)


class VitTrainer(BaseTrainer):
    def __init__(self, cfg, model, dataloaders, pretrained_patches=None):
        super().__init__(cfg, model, dataloaders, pretrained_patches)

        lr = float(cfg.optimizer.params.learning_rate)
        warmup = int(cfg.lr_scheduler.params.warmup_steps)
        # horizon in OPTIMIZER steps: MultiSteps advances the schedule once
        # per gradient_accumulation_steps micro-batches, so sizing it in
        # micro-steps would leave the cosine 1/accum of the way through at
        # the end of training (num_iters_per_epoch is eff-batch based)
        total = self.num_epoch * self.num_iters_per_epoch
        self.schedule = cosine_with_warmup(lr, warmup, total)

        res = int(cfg.dataset.preprocessing.resolution)
        dummy = jnp.zeros((1, 3, res, res), jnp.float32)
        variables = jax.jit(self.model.init)(self.rng(), dummy)
        self.tx = build_optimizer(cfg, self.schedule, variables["params"])
        self.state = {
            "step": 0,
            "params": variables["params"],
            "opt": self.tx.init(variables["params"]),
        }
        # training.ema_decay: EMA weights, used by evaluate()
        self.ema_init(variables["params"])
        self.state = self.maybe_resume(self.state)
        self.state, state_sh = self.place_state(self.state)

        model_apply = self.model.apply

        @functools.partial(
            jax.jit, donate_argnums=(0,),
            out_shardings=(state_sh, self.replicated),
        )
        def train_step(state, img, target, rng):
            def loss_fn(params):
                logits = model_apply(
                    {"params": params}, img, deterministic=False,
                    rngs={"dropout": rng},
                )
                loss = optax.softmax_cross_entropy_with_integer_labels(
                    logits.astype(jnp.float32), target
                ).mean()
                return loss, logits

            (loss, logits), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state["params"])
            updates, opt = self.tx.update(grads, state["opt"], state["params"])
            acc = jnp.mean((jnp.argmax(logits, -1) == target).astype(jnp.float32))
            params = optax.apply_updates(state["params"], updates)
            new_state = {"step": state["step"] + 1, "params": params,
                         "opt": opt}
            if "ema" in state:
                new_state["ema"] = self.ema_update(state, params)
            return new_state, {"loss": loss, "acc": acc}

        @jax.jit
        def eval_step(params, img, target):
            # per-sample correctness so the host can slice off the padded
            # rows of a ragged tail batch (pad_batch) before averaging
            logits = model_apply({"params": params}, img)
            return (jnp.argmax(logits, -1) == target).astype(jnp.float32)

        self._train_step, self._eval_step = train_step, eval_step

    def train(self):
        from attention_models_tpu.data.loaders import device_prefetch

        def place(batch):
            img, target = batch
            return (self.shard_batch(img),
                    self.shard_batch(np.asarray(target)))

        start_epoch, skip = self.resume_position()
        for epoch in range(start_epoch, self.num_epoch):
            # deterministic shuffle per epoch index: resumed runs replay
            # the exact permutation the uninterrupted run would have used
            self.train_dl.set_epoch(epoch)
            for it, (img, target) in enumerate(
                device_prefetch(self.train_dl, place)
            ):
                if epoch == start_epoch and it < skip:
                    continue  # mid-epoch resume: already-trained batches
                self.state, m = self._train_step(self.state, img, target,
                                                 self.rng())
                self.run_cadence(m)
                if self.check_preemption(self.state):
                    return
        self.finish()

    def on_eval(self):
        self.evaluate()

    def evaluate(self):
        correct = []
        for img, target in self.val_dl:
            img_p, tgt_p, n = self.pad_batch(img, np.asarray(target))
            per_sample = self._eval_step(
                self.eval_params(), self.shard_batch(img_p),
                self.shard_batch(tgt_p),
            )
            correct.append(np.asarray(per_sample, np.float32)[:n])
        if correct:
            self.metrics.log(
                {"val_acc": float(np.mean(np.concatenate(correct)))},
                self.global_step,
            )
        log.info("Validation finished!")
