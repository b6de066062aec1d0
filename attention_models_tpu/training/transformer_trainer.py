"""Seq2seq Transformer trainer.

The reference trains its seq2seq ``Transformer`` only through a README
snippet (/root/reference/README.md:55-89): teacher-forced forward over
``(src, tgt_shifted)`` pairs and ``cross_entropy(..., ignore_index=0)``
with no trainer class, config, or dataset. This trainer formalizes that
contract as a first-class `main.py --config=cfg/transformer.yaml` path:
AdamW + warmup schedule, padding-aware CE (PAD=0 ignored, matching the
snippet's ignore_index), token-accuracy metrics, and a greedy-decode
exact-match validation metric via the model's bounded-scan ``generate``.
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np
import optax

from attention_models_tpu.training.base_trainer import BaseTrainer
from attention_models_tpu.training.optim import build_optimizer
from attention_models_tpu.training.schedules import build_schedule

log = logging.getLogger(__name__)

PAD, START, END = 0, 1, 2


def _shift_right(tgt: np.ndarray) -> np.ndarray:
    """Teacher-forcing decoder input: [START] + tgt[:-1] (the reference
    snippet feeds a separately-drawn ``tgt_shifted``; a real task needs the
    actual shifted labels)."""
    out = np.empty_like(tgt)
    out[:, 0] = START
    out[:, 1:] = tgt[:, :-1]
    return out


class TransformerTrainer(BaseTrainer):
    def __init__(self, cfg, model, dataloaders, pretrained_patches=None):
        super().__init__(cfg, model, dataloaders, pretrained_patches)
        self.schedule = build_schedule(cfg, self.num_iters_per_epoch)

        seq_len = int(cfg.dataset.params.seq_len)
        src0 = jnp.zeros((1, seq_len), jnp.int32)
        tgt0 = jnp.zeros((1, seq_len + 1), jnp.int32)
        variables = jax.jit(self.model.init)(self.rng(), src0, tgt0)
        self.tx = build_optimizer(cfg, self.schedule, variables["params"],
                                  no_decay_grouping=True)
        self.state = {
            "step": 0,
            "params": variables["params"],
            "opt": self.tx.init(variables["params"]),
        }
        self.ema_init(variables["params"])
        self.state = self.maybe_resume(self.state)
        self.state, state_sh = self.place_state(self.state)

        model_apply = self.model.apply

        def ce_and_acc(logits, labels):
            """Padding-masked CE + token accuracy (ignore_index=0 in the
            reference snippet, README.md:88)."""
            valid = (labels != PAD).astype(jnp.float32)
            n = jnp.maximum(valid.sum(), 1.0)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), labels
            )
            acc = (jnp.argmax(logits, -1) == labels).astype(jnp.float32)
            return (ce * valid).sum() / n, (acc * valid).sum() / n

        @functools.partial(
            jax.jit, donate_argnums=(0,),
            out_shardings=(state_sh, self.replicated),
        )
        def train_step(state, src, tgt_in, labels, rng):
            def loss_fn(params):
                logits = model_apply(
                    {"params": params}, src, tgt_in, deterministic=False,
                    rngs={"dropout": rng},
                )
                return ce_and_acc(logits, labels)

            (loss, acc), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state["params"])
            updates, opt = self.tx.update(grads, state["opt"], state["params"])
            params = optax.apply_updates(state["params"], updates)
            new_state = {"step": state["step"] + 1, "params": params,
                         "opt": opt}
            if "ema" in state:
                new_state["ema"] = self.ema_update(state, params)
            return new_state, {"loss": loss, "acc": acc}

        @jax.jit
        def eval_step(params, src, tgt_in, labels):
            logits = model_apply({"params": params}, src, tgt_in)
            valid = (labels != PAD).astype(jnp.float32)
            n = jnp.maximum(valid.sum(-1), 1.0)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), labels
            )
            acc = (jnp.argmax(logits, -1) == labels).astype(jnp.float32)
            # per-sample so the host can slice padded tail rows (pad_batch)
            return (ce * valid).sum(-1) / n, (acc * valid).sum(-1) / n

        @functools.partial(jax.jit, static_argnums=(2,))
        def generate_step(params, src, max_len, rng):
            return model_apply(
                {"params": params}, src, rng, max_len=max_len,
                start_token=START, end_token=END,
                method=type(self.model).generate,
            )

        self._train_step = train_step
        self._eval_step = eval_step
        self._generate_step = generate_step

    def train(self):
        from attention_models_tpu.data.loaders import device_prefetch

        def place(batch):
            src, tgt = batch
            return (
                self.shard_batch(np.asarray(src)),
                self.shard_batch(_shift_right(np.asarray(tgt))),
                self.shard_batch(np.asarray(tgt)),
            )

        start_epoch, skip = self.resume_position()
        for epoch in range(start_epoch, self.num_epoch):
            self.train_dl.set_epoch(epoch)
            for it, batch in enumerate(
                device_prefetch(self.train_dl, place)
            ):
                if epoch == start_epoch and it < skip:
                    continue
                src, tgt_in, labels = batch
                self.state, m = self._train_step(
                    self.state, src, tgt_in, labels, self.rng()
                )
                self.run_cadence(m)
                if self.check_preemption(self.state):
                    return
        self.finish()

    def on_eval(self):
        self.evaluate()

    def on_sample(self):
        """Greedy-decode a val batch and log exact-sequence match — the
        generation-quality analogue of the image trainers' sample grids."""
        for src, tgt in self.val_dl:
            src_p, tgt_p, n = self.pad_batch(np.asarray(src), np.asarray(tgt))
            max_len = int(tgt_p.shape[1])
            tokens = self._generate_step(
                self.eval_params(), self.shard_batch(src_p), max_len,
                self.rng(),
            )
            # tokens[:, 0] is the start token; compare the generated tail
            gen = np.asarray(tokens)[:n, 1 : max_len + 1]
            ref = np.asarray(tgt_p)[:n]
            valid = ref != PAD
            token_match = float(
                ((gen == ref) & valid).sum() / max(valid.sum(), 1)
            )
            exact = float(np.mean(((gen == ref) | ~valid).all(axis=1)))
            self.metrics.log(
                {"sample_token_match": token_match, "sample_exact_match": exact},
                self.global_step,
            )
            break

    def evaluate(self):
        ce, acc = [], []
        for src, tgt in self.val_dl:
            src, tgt = np.asarray(src), np.asarray(tgt)
            src_p, tgt_p, n = self.pad_batch(src, tgt)
            ce_b, acc_b = self._eval_step(
                self.eval_params(),
                self.shard_batch(src_p),
                self.shard_batch(_shift_right(tgt_p)),
                self.shard_batch(tgt_p),
            )
            ce.append(np.asarray(ce_b, np.float32)[:n])
            acc.append(np.asarray(acc_b, np.float32)[:n])
        if ce:
            self.metrics.log(
                {
                    "val_loss": float(np.mean(np.concatenate(ce))),
                    "val_token_acc": float(np.mean(np.concatenate(acc))),
                },
                self.global_step,
            )
        log.info("Validation finished!")
