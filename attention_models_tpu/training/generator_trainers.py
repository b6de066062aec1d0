"""Trainers for the token-space generators (API parity with
/root/reference/trainers/muse.py:31-153 and maskgit.py:31-114): single
optimizer with no-decay grouping for bias/LayerNorm/embeddings, frozen
vq/text-encoder subtrees (zero-update optax masks instead of requires_grad
flips), loss = model(batch), periodic prompt sampling / eval-generation
grids."""

from __future__ import annotations

import functools
import hashlib
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
        self.cache_tokens = bool(cfg.training.get("cache_vq_tokens", False))
        if self.cache_tokens:
            pp = cfg.dataset.preprocessing
            if bool(pp.get("random_flip")) or bool(pp.get("random_crop")):
                raise ValueError(
                    "training.cache_vq_tokens requires deterministic "
                    "transforms — disable dataset.preprocessing.random_flip/"
                    "random_crop (a cached token grid would freeze one "
                    "augmentation draw for every epoch)"
                )

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
        # training.ema_decay: EMA of the trainable subtrees, updated inside
        # the jitted step and used by every sampling/eval path (eval_params)
        self.ema_init(variables["params"], exclude=self.frozen_subtrees)
        self.state = self.maybe_resume(self.state)
        self.state, self.state_shardings = self.place_state(self.state)
        self._build_steps()
        if self.cache_tokens:
            self._pretokenize()

    def log_val_loss(self, losses, real_feats=(), gen_feats=()):
        """Log the mean val loss over the evaluated batches (the reference
        trainers render grids but never report a validation number). Val
        losses are computed with deterministic=True and a FIXED rng so the
        masking draw is identical across evals — the curve compares
        like-for-like instead of bouncing with the mask sample.

        With ``training.eval_fid`` the evaluate() loops also hand in VGG
        feature batches of the real vs generated images and a ``val_fid_vgg``
        Fréchet distance is logged alongside."""
        m = {}
        if losses:
            m["val_loss"] = float(np.mean(losses))
        if len(real_feats) and len(gen_feats):
            from attention_models_tpu.utils.eval_metrics import fid_score

            m["val_fid_vgg"] = fid_score(
                np.concatenate(real_feats), np.concatenate(gen_feats)
            )
        if m:
            self.metrics.log(m, self.global_step)

    @property
    def eval_fid_on(self) -> bool:
        """Generative FID is opt-in for generator trainers (the GAN trainer
        defaults it on — its LPIPS tower is already resident; here the VGG
        tower exists only for the metric)."""
        return bool(self.cfg.training.get("eval_fid", False))

    # fid_features lives on BaseTrainer (shared with VQGANTrainer so the
    # seed-0 tower makes val_fid_vgg comparable across trainer types)

    def _make_step(self, loss_of):
        """Jitted optimizer step from a loss(params, *batch_and_rng) fn —
        the train/token step pairs differ only in their loss."""

        @functools.partial(
            jax.jit, donate_argnums=(0,),
            out_shardings=(self.state_shardings, self.replicated),
        )
        def step(state, *batch_and_rng):
            loss, grads = jax.value_and_grad(
                lambda p: loss_of(p, *batch_and_rng)
            )(state["params"])
            updates, opt = self.tx.update(grads, state["opt"], state["params"])
            params = optax.apply_updates(state["params"], updates)
            out = {"step": state["step"] + 1, "params": params, "opt": opt}
            if "ema" in state:
                out["ema"] = self.ema_update(state, params)
            return out, {"loss": loss}

        return step

    def _pretokenize(self):
        """training.cache_vq_tokens: one pass over the train set through the
        frozen VQ encoder; every later train step reads the cached token grid
        instead of re-encoding the image on device. The tokenizer is frozen
        and the transforms are deterministic (validated above), so a cached
        grid equals what the step would have computed — this is exact, not an
        approximation. Cache cost: 4·num_patches bytes per sample (a 100k-
        image set at 1024 tokens is ~400 MB host RAM). The reference re-runs
        its frozen tokenizer every step (/root/reference/models/muse.py:162,
        maskgit.py:166)."""
        from attention_models_tpu.data.loaders import DataLoader
        from attention_models_tpu.models.vq_common import vq_num_patches

        ds = self.train_dl.dataset
        n_tok = vq_num_patches(self.model.vq_config)
        self.train_dl.with_indices = True

        # resume path: reuse the persisted cache if it was built from the
        # same frozen VQ weights and the same dataset extent
        cache_file = os.path.join(self.checkpoint_folder,
                                  "vq_token_cache.npz")
        digest = self._vq_cache_digest(n_tok, len(ds))
        if os.path.exists(cache_file):
            try:
                z = np.load(cache_file)
                if str(z["digest"]) == digest:
                    self._tok_cache = z["cache"]
                    log.info("cache_vq_tokens: loaded %s (%.1f MB)",
                             cache_file, self._tok_cache.nbytes / 1e6)
                    return
                log.warning(
                    "cache_vq_tokens: %s is stale (vq weights, dataset or "
                    "preprocessing changed) — re-tokenizing", cache_file,
                )
            except Exception:  # truncated write (preempted mid-save) etc.
                log.warning("cache_vq_tokens: %s unreadable — re-tokenizing",
                            cache_file)

        encode = jax.jit(functools.partial(
            self.model.apply, method=type(self.model).encode_to_indices
        ))
        cache = np.zeros((len(ds), n_tok), np.int32)
        scan_dl = DataLoader(
            ds, self.train_dl.batch_size, shuffle=False, drop_last=False,
            batch_transform=self.train_dl.batch_transform, with_indices=True,
            num_workers=self.train_dl.num_workers,
        )
        gather = None
        if jax.process_count() > 1:
            # every host scans the same deterministic order; replicate the
            # encoded grids so each host fills its full local cache
            gather = jax.jit(lambda x: x, out_shardings=self.replicated)
        for idx, img, *_ in scan_dl:
            img_p, n = self.pad_batch(np.asarray(img))
            ids = encode({"params": self.state["params"]},
                         self.shard_batch(img_p))
            if gather is not None:
                ids = gather(ids)
            cache[np.asarray(idx)] = np.asarray(ids, np.int32)[:n]
        self._tok_cache = cache
        # atomic publish: a preempted mid-write must not leave a truncated
        # npz that poisons every later startup
        tmp = cache_file[: -len(".npz")] + ".tmp.npz"
        np.savez(tmp, cache=cache, digest=np.array(digest))
        os.replace(tmp, cache_file)
        log.info(
            "cache_vq_tokens: pretokenized %d samples x %d tokens (%.1f MB)"
            " -> %s",
            len(ds), n_tok, cache.nbytes / 1e6, cache_file,
        )

    def _vq_cache_digest(self, n_tok: int, n_samples: int) -> str:
        """Fingerprint of the frozen VQ weights + the full dataset config
        (paths, preprocessing, native pipeline) + dataset extent — guards
        the persisted token cache against silently training on grids from
        different tokenizer weights, images, or preprocessing."""
        import json

        h = hashlib.sha256()
        leaves = jax.tree_util.tree_flatten_with_path(
            self.state["params"]["vq"]
        )[0]
        for path, leaf in sorted(leaves, key=lambda kv: str(kv[0])):
            h.update(str(path).encode())
            h.update(np.asarray(leaf).tobytes())
        h.update(json.dumps(self.cfg.dataset.to_dict(), sort_keys=True,
                            default=str).encode())
        h.update(f"{n_tok}:{n_samples}".encode())
        return h.hexdigest()

    def _cached_text_batches(self):
        """(sample idx, captions) batches for token-cached text-to-image
        training. When the dataset exposes ``caption(i)`` the image pipeline
        (decode/transform/collate) never runs; otherwise fall back to full
        iteration (with_indices) and discard the images."""
        ds = self.train_dl.dataset
        if hasattr(ds, "caption"):
            for idx in self.train_dl.iter_indices():
                yield idx, [ds.caption(int(i)) for i in idx]
        else:
            for idx, _, texts in self.train_dl:
                yield idx, list(texts)

    def _train_text_loop(self):
        """Shared Muse/Parti loop: step(state, text_ids, imgs_or_tokens, rng)."""
        from attention_models_tpu.data.loaders import device_prefetch

        if self.cache_tokens:
            step = self._token_step
            batches = self._cached_text_batches

            def place(batch):  # cached VQ tokens; text still per-epoch
                idx, texts = batch
                return (
                    self.shard_batch(tokenize(texts, self.max_length)),
                    self.shard_batch(self._tok_cache[np.asarray(idx)]),
                )
        else:
            step = self._train_step
            batches = lambda: iter(self.train_dl)

            def place(batch):  # tokenize + DMA in the prefetch thread
                img, texts = batch
                return (
                    self.shard_batch(tokenize(list(texts), self.max_length)),
                    self.shard_batch(img),
                )

        start_epoch, skip = self.resume_position()
        for epoch in range(start_epoch, self.num_epoch):
            # deterministic shuffle per epoch index: resumed runs replay
            # the exact permutation the uninterrupted run would have used
            self.train_dl.set_epoch(epoch)
            for it, (ids, second) in enumerate(
                device_prefetch(batches(), place)
            ):
                if epoch == start_epoch and it < skip:
                    continue  # mid-epoch resume: already-trained batches
                self.state, m = step(self.state, ids, second, self.rng())
                self.run_cadence(m)
                if self.check_preemption(self.state):
                    return
        self.finish()

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

        def img_loss(params, img, rng):
            mask_rng, drop_rng = jax.random.split(rng)
            return model_apply(
                {"params": params}, img, mask_rng, deterministic=False,
                rngs={"dropout": drop_rng},
            )

        self._train_step = self._make_step(img_loss)

        if self.cache_tokens:
            def tok_loss(params, vq_ids, rng):
                mask_rng, drop_rng = jax.random.split(rng)
                return model_apply(
                    {"params": params}, vq_ids, mask_rng, deterministic=False,
                    rngs={"dropout": drop_rng},
                    method=MaskGitTransformer.loss_from_indices,
                )

            self._token_step = self._make_step(tok_loss)

        @jax.jit
        def recon_step(params, img, rng):
            return model_apply({"params": params}, img, rng,
                               method=MaskGitTransformer.reconstruct)

        self._recon_step = recon_step

        @jax.jit
        def val_loss_step(params, img):
            return model_apply({"params": params}, img, jax.random.key(0),
                               deterministic=True)

        self._val_loss_step = val_loss_step

    def train(self):
        from attention_models_tpu.data.loaders import device_prefetch

        if self.cache_tokens:
            # index-only iteration: grids come from the cache, so neither
            # the VQ encoder nor the image pipeline (decode/transform) runs
            step = self._token_step
            batches = lambda: self.train_dl.iter_indices()
            place = lambda idx: self.shard_batch(self._tok_cache[idx])
        else:
            step = self._train_step
            batches = lambda: iter(self.train_dl)
            place = lambda b: self.shard_batch(b[0])

        start_epoch, skip = self.resume_position()
        for epoch in range(start_epoch, self.num_epoch):
            # deterministic shuffle per epoch index: resumed runs replay
            # the exact permutation the uninterrupted run would have used
            self.train_dl.set_epoch(epoch)
            # host->device DMA for batch N+1 overlaps step N
            for it, batch in enumerate(device_prefetch(
                batches(), place
            )):
                if epoch == start_epoch and it < skip:
                    continue  # mid-epoch resume: already-trained batches
                self.state, m = step(self.state, batch, self.rng())
                self.run_cadence(m)
                if self.check_preemption(self.state):
                    return
        self.finish()

    def evaluate(self):
        losses, real_f, gen_f = [], [], []
        for i, (img, _) in enumerate(self.val_dl):
            if i > 10:
                break
            img_p, n = self.pad_batch(img)
            img_d = self.shard_batch(img_p)
            losses.append(float(self._val_loss_step(self.eval_params(),
                                                    img_d)))
            rec = self._recon_step(self.eval_params(), img_d,
                                   self.eval_rng(1, i))
            rec = np.asarray(rec, np.float32)
            if self.eval_fid_on:
                real_f.append(self.fid_features(img_p)[:n])
                gen_f.append(self.fid_features(np.clip(rec, 0, 1))[:n])
            self.log_image_grid(
                rec[:n],
                os.path.join(self.image_saved_dir, f"step_{i}.png"),
                f"samples/recon_{i}",
            )
        self.log_val_loss(losses, real_f, gen_f)

    def on_sample(self):
        self.evaluate()

    def on_eval(self):
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

        def img_loss(params, text_ids, img, rng):
            step_rng, drop_rng = jax.random.split(rng)
            return model_apply(
                {"params": params}, text_ids, img, step_rng,
                deterministic=False, rngs={"dropout": drop_rng},
            )

        self._train_step = self._make_step(img_loss)

        if self.cache_tokens:
            def tok_loss(params, text_ids, vq_ids, rng):
                step_rng, drop_rng = jax.random.split(rng)
                return model_apply(
                    {"params": params}, text_ids, vq_ids, step_rng,
                    deterministic=False, rngs={"dropout": drop_rng},
                    method=MUSE.loss_from_indices,
                )

            self._token_step = self._make_step(tok_loss)

        @functools.partial(jax.jit, static_argnames=("timesteps",))
        def generate_step(params, text_ids, rng, timesteps=18):
            return model_apply({"params": params}, text_ids, rng,
                               timesteps=timesteps, method=MUSE.generate)

        self._generate_step = generate_step

        @jax.jit
        def val_loss_step(params, text_ids, img):
            return model_apply({"params": params}, text_ids, img,
                               jax.random.key(0), deterministic=True)

        self._val_loss_step = val_loss_step

    def train(self):
        self._train_text_loop()

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
                self._generate_step(self.eval_params(), ids,
                                    self.eval_rng(2, s)),
                np.float32,
            ))
        imgs = np.concatenate(outs)[: len(prompts)]
        self.log_image_grid(
            imgs, os.path.join(self.image_saved_dir, "step.png"),
            "samples/prompts",
        )

    def evaluate(self):
        losses, real_f, gen_f = [], [], []
        for i, (img, texts) in enumerate(self.val_dl):
            if i > 3:
                break
            ids, img_p, n = self.pad_batch(
                tokenize(list(texts), self.max_length), np.asarray(img)
            )
            losses.append(float(self._val_loss_step(
                self.eval_params(), self.shard_batch(ids),
                self.shard_batch(img_p),
            )))
            imgs = self._generate_step(self.eval_params(), jnp.array(ids),
                                       self.eval_rng(1, i))
            imgs = np.asarray(imgs, np.float32)
            if self.eval_fid_on:
                # text-conditioned generation vs the real val images — the
                # true generative-quality axis (the reference only eyeballs
                # grids, /root/reference/trainers/muse.py:137-153)
                real_f.append(self.fid_features(img_p)[:n])
                gen_f.append(self.fid_features(np.clip(imgs, 0, 1))[:n])
            self.log_image_grid(
                imgs[:n],
                os.path.join(self.image_saved_dir, f"step_{i}.png"),
                f"samples/eval_{i}",
            )
        self.log_val_loss(losses, real_f, gen_f)


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
        from attention_models_tpu.models.parti import Parti

        model_apply = self.model.apply
        self.max_length = int(self.cfg.model.encoder.max_length)

        def img_loss(params, text_ids, img, rng):
            return model_apply(
                {"params": params}, text_ids, img, deterministic=False,
                rngs={"dropout": rng},
            )

        self._train_step = self._make_step(img_loss)

        if self.cache_tokens:
            def tok_loss(params, text_ids, vq_ids, rng):
                return model_apply(
                    {"params": params}, text_ids, vq_ids, deterministic=False,
                    rngs={"dropout": rng}, method=Parti.loss_from_indices,
                )

            self._token_step = self._make_step(tok_loss)

        @jax.jit
        def val_loss_step(params, text_ids, img):
            return model_apply({"params": params}, text_ids, img,
                               deterministic=True)

        self._val_loss_step = val_loss_step

    def train(self):
        self._train_text_loop()

    def on_sample(self):
        self.evaluate()

    def on_eval(self):
        self.evaluate()

    def evaluate(self):
        """``val_loss`` and the sample grid always come from the FIRST val
        batch only, so the fixed-rng loss curve stays like-for-like whether
        or not FID is enabled. When ``training.eval_fid`` is on, FID
        features additionally accumulate over ``training.eval_fid_batches``
        (default 4) val batches — a single ~batch-size feature set in 512
        dims gives an essentially-noise covariance estimate, so the
        distance would swing between identical-quality models. Each extra
        batch costs a full AR decode, hence a smaller default than
        MaskGit's 11."""
        from attention_models_tpu.models.parti import parti_generate

        n_batches = (int(self.cfg.training.get("eval_fid_batches", 4))
                     if self.eval_fid_on else 1)
        losses, real_f, gen_f = [], [], []
        for i, (img, texts) in enumerate(self.val_dl):
            if i >= n_batches:
                break
            ids, img_p, n = self.pad_batch(
                tokenize(list(texts), self.max_length), np.asarray(img)
            )
            if i == 0:
                losses.append(float(self._val_loss_step(
                    self.eval_params(), self.shard_batch(ids),
                    self.shard_batch(img_p),
                )))
            imgs = parti_generate(
                self.model, {"params": self.eval_params()},
                jnp.array(ids), self.eval_rng(1, i),
                # eval decode temperature (0 = argmax): free-running AR
                # decode of an overfit model derails under tau=1 sampling
                # even at train loss ~1e-3 — the overfit configs eval greedy
                temperature=float(
                    self.cfg.training.get("eval_temperature", 1.0)),
                # tunneled-axon batch-position decode corruption mitigation
                # (tools/axon_decode_repro.py) — opt-in per config, since it
                # host-steps the decode (a tunnel round-trip per token) and
                # is a backend-defect workaround, not model semantics
                axon_workaround=bool(
                    self.cfg.training.get("eval_axon_workaround", False)),
            )
            imgs = np.asarray(imgs, np.float32)
            if self.eval_fid_on:
                real_f.append(self.fid_features(img_p)[:n])
                gen_f.append(self.fid_features(np.clip(imgs, 0, 1))[:n])
            if i == 0:
                self.log_image_grid(
                    imgs[:n],
                    os.path.join(self.image_saved_dir, f"parti_step_{i}.png"),
                    f"samples/eval_{i}",
                )
        self.log_val_loss(losses, real_f, gen_f)
