"""Trainers for the token-space generators (API parity with
/root/reference/trainers/muse.py:31-153 and maskgit.py:31-114): single
optimizer with no-decay grouping for bias/LayerNorm/embeddings, frozen
vq/text-encoder subtrees (zero-update optax masks instead of requires_grad
flips), loss = model(batch), periodic prompt sampling / eval-generation
grids."""

from __future__ import annotations

import functools
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from attention_models_tpu.models.maskgit import MaskGitTransformer
from attention_models_tpu.models.muse import MUSE
from attention_models_tpu.models.text_encoder import tokenize
from attention_models_tpu.training.base_trainer import BaseTrainer
from attention_models_tpu.training.optim import build_optimizer
from attention_models_tpu.training.schedules import build_schedule
from attention_models_tpu.utils.checkpoint import apply_param_patches

log = logging.getLogger(__name__)

PROMPTS_FILE = "data/prompts/dalle_prompts.txt"


class _GeneratorTrainer(BaseTrainer):
    """Shared loop; subclasses define _init_model_state and _loss signature."""

    frozen_subtrees: tuple = ("vq",)

    def __init__(self, cfg, model, dataloaders, pretrained_patches=None):
        super().__init__(cfg, model, dataloaders, pretrained_patches)
        self.schedule = build_schedule(cfg, self.num_iters_per_epoch)

        variables = self._init_variables()
        if self.pretrained_patches:
            variables = apply_param_patches(variables, self.pretrained_patches)
        self.tx = build_optimizer(
            cfg, self.schedule, variables["params"],
            frozen_subtrees=self.frozen_subtrees, no_decay_grouping=True,
        )
        self.state = {
            "step": 0,
            "params": variables["params"],
            "opt": self.tx.init(variables["params"]),
        }
        self.state = self.maybe_resume(self.state)
        self.state, self.state_shardings = self.place_state(self.state)
        self._build_steps()

    # -- subclass hooks ---------------------------------------------------------
    def _init_variables(self):
        raise NotImplementedError

    def _build_steps(self):
        raise NotImplementedError



class MaskGitTrainer(_GeneratorTrainer):
    frozen_subtrees = ("vq",)

    def _init_variables(self):
        res = int(self.cfg.dataset.preprocessing.resolution)
        dummy = jnp.zeros((1, 3, res, res), jnp.float32)
        return jax.jit(
            functools.partial(self.model.init,
                              method=MaskGitTransformer.init_all)
        )(self.rng(), dummy, self.rng())

    def _build_steps(self):
        model_apply = self.model.apply

        @functools.partial(
            jax.jit, donate_argnums=(0,),
            out_shardings=(self.state_shardings, self.replicated),
        )
        def train_step(state, img, rng):
            mask_rng, drop_rng = jax.random.split(rng)

            def loss_fn(params):
                return model_apply(
                    {"params": params}, img, mask_rng, deterministic=False,
                    rngs={"dropout": drop_rng},
                )

            loss, grads = jax.value_and_grad(loss_fn)(state["params"])
            updates, opt = self.tx.update(grads, state["opt"], state["params"])
            return (
                {"step": state["step"] + 1,
                 "params": optax.apply_updates(state["params"], updates),
                 "opt": opt},
                {"loss": loss},
            )

        @jax.jit
        def recon_step(params, img, rng):
            return model_apply({"params": params}, img, rng,
                               method=MaskGitTransformer.reconstruct)

        self._train_step, self._recon_step = train_step, recon_step

    def train(self):
        from attention_models_tpu.data.loaders import device_prefetch

        start_epoch, skip = self.resume_position()
        for epoch in range(start_epoch, self.num_epoch):
            # deterministic shuffle per epoch index: resumed runs replay
            # the exact permutation the uninterrupted run would have used
            self.train_dl.set_epoch(epoch)
            # host->device DMA for batch N+1 overlaps step N
            for it, img in enumerate(device_prefetch(
                self.train_dl, lambda b: self.shard_batch(b[0])
            )):
                if epoch == start_epoch and it < skip:
                    continue  # mid-epoch resume: already-trained batches
                self.state, m = self._train_step(self.state, img, self.rng())
                self.run_cadence(m)
                if self.check_preemption(self.state):
                    return
        self.finish()

    def evaluate(self):
        for i, (img, _) in enumerate(self.val_dl):
            if i > 10:
                break
            img_p, n = self.pad_batch(img)
            rec = self._recon_step(
                self.state["params"], self.shard_batch(img_p), self.rng()
            )
            self.log_image_grid(
                np.asarray(rec, np.float32)[:n],
                os.path.join(self.image_saved_dir, f"step_{i}.png"),
                f"samples/recon_{i}",
            )

    def on_sample(self):
        self.evaluate()


class MuseTrainer(_GeneratorTrainer):
    frozen_subtrees = ("vq", "text_encoder")

    def _init_variables(self):
        res = int(self.cfg.dataset.preprocessing.resolution)
        max_len = int(self.cfg.model.encoder.max_length)
        dummy_img = jnp.zeros((1, 3, res, res), jnp.float32)
        dummy_ids = jnp.zeros((1, max_len), jnp.int32)
        return jax.jit(
            functools.partial(self.model.init, method=MUSE.init_all)
        )(self.rng(), dummy_ids, dummy_img, self.rng())

    def _build_steps(self):
        model_apply = self.model.apply
        self.max_length = int(self.cfg.model.encoder.max_length)

        @functools.partial(
            jax.jit, donate_argnums=(0,),
            out_shardings=(self.state_shardings, self.replicated),
        )
        def train_step(state, text_ids, img, rng):
            step_rng, drop_rng = jax.random.split(rng)

            def loss_fn(params):
                return model_apply(
                    {"params": params}, text_ids, img, step_rng,
                    deterministic=False, rngs={"dropout": drop_rng},
                )

            loss, grads = jax.value_and_grad(loss_fn)(state["params"])
            updates, opt = self.tx.update(grads, state["opt"], state["params"])
            return (
                {"step": state["step"] + 1,
                 "params": optax.apply_updates(state["params"], updates),
                 "opt": opt},
                {"loss": loss},
            )

        @functools.partial(jax.jit, static_argnames=("timesteps",))
        def generate_step(params, text_ids, rng, timesteps=18):
            return model_apply({"params": params}, text_ids, rng,
                               timesteps=timesteps, method=MUSE.generate)

        self._train_step, self._generate_step = train_step, generate_step

    def train(self):
        from attention_models_tpu.data.loaders import device_prefetch

        def place(batch):  # tokenize + DMA in the prefetch thread
            img, texts = batch
            return (self.shard_batch(img),
                    self.shard_batch(tokenize(list(texts), self.max_length)))

        start_epoch, skip = self.resume_position()
        for epoch in range(start_epoch, self.num_epoch):
            # deterministic shuffle per epoch index: resumed runs replay
            # the exact permutation the uninterrupted run would have used
            self.train_dl.set_epoch(epoch)
            for it, (img, ids) in enumerate(
                device_prefetch(self.train_dl, place)
            ):
                if epoch == start_epoch and it < skip:
                    continue  # mid-epoch resume: already-trained batches
                self.state, m = self._train_step(self.state, ids, img,
                                                 self.rng())
                self.run_cadence(m)
                if self.check_preemption(self.state):
                    return
        self.finish()

    def on_sample(self):
        self.sample_prompts()

    def on_eval(self):
        self.evaluate()

    def _prompts(self):
        if os.path.exists(PROMPTS_FILE):
            with open(PROMPTS_FILE) as f:
                return [line.strip() for line in f if line.strip()]
        return ["a photo of a cat", "a red stop sign"]

    def sample_prompts(self, chunk: int = 8):
        """Generate the 31 fixed dalle prompts (trainers/muse.py:120-134) in
        fixed-size chunks so the CFG 2b-batch forward keeps one jitted shape
        and bounded memory."""
        prompts = self._prompts()
        outs = []
        for s in range(0, len(prompts), chunk):
            batch = prompts[s : s + chunk]
            batch = batch + [""] * (chunk - len(batch))  # static shape
            ids = jnp.array(tokenize(batch, self.max_length))
            outs.append(np.asarray(
                self._generate_step(self.state["params"], ids, self.rng()),
                np.float32,
            ))
        imgs = np.concatenate(outs)[: len(prompts)]
        self.log_image_grid(
            imgs, os.path.join(self.image_saved_dir, "step.png"),
            "samples/prompts",
        )

    def evaluate(self):
        for i, (img, texts) in enumerate(self.val_dl):
            if i > 3:
                break
            ids, n = self.pad_batch(tokenize(list(texts), self.max_length))
            imgs = self._generate_step(self.state["params"], jnp.array(ids),
                                       self.rng())
            self.log_image_grid(
                np.asarray(imgs, np.float32)[:n],
                os.path.join(self.image_saved_dir, f"step_{i}.png"),
                f"samples/eval_{i}",
            )


class PartiTrainer(_GeneratorTrainer):
    """Autoregressive text-to-image trainer. The reference ships the Parti
    model but no trainer (build_trainer has no 'parti' branch) — this closes
    that gap with the Muse trainer's structure: frozen vq + text encoder,
    teacher-forced CE loss, periodic prompt sampling via KV-cached decode."""

    frozen_subtrees = ("vq", "text_encoder")

    def _init_variables(self):
        from attention_models_tpu.models.parti import Parti

        res = int(self.cfg.dataset.preprocessing.resolution)
        max_len = int(self.cfg.model.encoder.max_length)
        dummy_img = jnp.zeros((1, 3, res, res), jnp.float32)
        dummy_ids = jnp.zeros((1, max_len), jnp.int32)
        return jax.jit(
            functools.partial(self.model.init, method=Parti.init_all)
        )(self.rng(), dummy_ids, dummy_img)

    def _build_steps(self):
        model_apply = self.model.apply
        self.max_length = int(self.cfg.model.encoder.max_length)

        @functools.partial(
            jax.jit, donate_argnums=(0,),
            out_shardings=(self.state_shardings, self.replicated),
        )
        def train_step(state, text_ids, img, rng):
            def loss_fn(params):
                return model_apply(
                    {"params": params}, text_ids, img, deterministic=False,
                    rngs={"dropout": rng},
                )

            loss, grads = jax.value_and_grad(loss_fn)(state["params"])
            updates, opt = self.tx.update(grads, state["opt"], state["params"])
            return (
                {"step": state["step"] + 1,
                 "params": optax.apply_updates(state["params"], updates),
                 "opt": opt},
                {"loss": loss},
            )

        self._train_step = train_step

    def train(self):
        from attention_models_tpu.data.loaders import device_prefetch

        def place(batch):
            img, texts = batch
            return (self.shard_batch(img),
                    self.shard_batch(tokenize(list(texts), self.max_length)))

        start_epoch, skip = self.resume_position()
        for epoch in range(start_epoch, self.num_epoch):
            # deterministic shuffle per epoch index: resumed runs replay
            # the exact permutation the uninterrupted run would have used
            self.train_dl.set_epoch(epoch)
            for it, (img, ids) in enumerate(
                device_prefetch(self.train_dl, place)
            ):
                if epoch == start_epoch and it < skip:
                    continue  # mid-epoch resume: already-trained batches
                self.state, m = self._train_step(self.state, ids, img,
                                                 self.rng())
                self.run_cadence(m)
                if self.check_preemption(self.state):
                    return
        self.finish()

    def on_sample(self):
        self.evaluate()

    def evaluate(self):
        from attention_models_tpu.models.parti import parti_generate

        for i, (_, texts) in enumerate(self.val_dl):
            if i > 0:
                break
            ids, n = self.pad_batch(tokenize(list(texts), self.max_length))
            imgs = parti_generate(self.model, {"params": self.state["params"]},
                                  jnp.array(ids), self.rng())
            self.log_image_grid(
                np.asarray(imgs, np.float32)[:n],
                os.path.join(self.image_saved_dir, f"parti_step_{i}.png"),
                f"samples/eval_{i}",
            )
