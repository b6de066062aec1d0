"""LR schedules matching the reference's two scheduler families:

- HF ``get_constant_schedule_with_warmup`` / ``get_cosine_schedule_with_warmup``
  (trainers/utils/scheduler.py:6-14): linear warmup from 0, then constant, or
  cosine decay to 0 over ``decay_steps``.
- timm ``CosineLRScheduler(t_initial, warmup_t, warmup_lr_init=1e-6,
  lr_min=5e-5)`` used by the VQGAN trainer (trainers/vitgqgan.py:75-76):
  linear warmup from ``warmup_lr_init`` to base lr, then cosine to ``lr_min``.

The reference's iters/epoch bugs (SURVEY.md §2.9#4-5) are resolved by always
computing decay_steps = epochs · ceil(len(ds)/effective_batch) when the
config leaves it null.
"""

from __future__ import annotations

import math

import optax


def constant_with_warmup(base_lr: float, warmup_steps: int):
    """HF get_constant_schedule_with_warmup semantics: ``step/warmup`` while
    ``step < warmup``, else 1 — so warmup_steps=0 is full lr from step 0
    (HF's `step < num_warmup_steps` branch is immediately false), not a
    zero-lr first step."""

    def fn(step):
        import jax.numpy as jnp

        warm = jnp.where(
            step < warmup_steps, step / max(warmup_steps, 1), 1.0
        )
        return base_lr * warm

    return fn


def cosine_with_warmup(base_lr: float, warmup_steps: int, decay_steps: int):
    """HF semantics: cosine from base_lr to 0 after linear warmup. With
    warmup_steps=0, step 0 is already in the cosine branch at full base_lr
    (matching HF, where `step < num_warmup_steps` is immediately false)."""
    cosine = optax.cosine_decay_schedule(
        base_lr, max(decay_steps - warmup_steps, 1)
    )
    if warmup_steps <= 0:
        return cosine
    return optax.join_schedules(
        [optax.linear_schedule(0.0, base_lr, warmup_steps), cosine],
        [warmup_steps],
    )


def timm_cosine(
    base_lr: float,
    t_initial: int,
    warmup_t: int,
    warmup_lr_init: float = 1e-6,
    lr_min: float = 5e-5,
):
    """timm CosineLRScheduler equivalent (single cycle, no restarts)."""
    import jax.numpy as jnp

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_lr_init + (base_lr - warmup_lr_init) * jnp.minimum(
            step / max(warmup_t, 1), 1.0
        )
        t = jnp.clip((step - warmup_t) / max(t_initial - warmup_t, 1), 0.0, 1.0)
        cos = lr_min + 0.5 * (base_lr - lr_min) * (1 + jnp.cos(math.pi * t))
        return jnp.where(step < warmup_t, warm, cos)

    return fn


def build_schedule(cfg, num_iters_per_epoch: int):
    """From the reference YAML schema (lr_scheduler.name + params)."""
    name = cfg.lr_scheduler.get("name", "cosine_with_warmup")
    p = cfg.lr_scheduler.params
    base_lr = float(cfg.optimizer.params.learning_rate)
    warmup = int(p.warmup_steps)
    decay = p.get("decay_steps")
    if not decay:
        decay = int(cfg.training.num_epochs) * num_iters_per_epoch
    if name == "constant_with_warmup":
        return constant_with_warmup(base_lr, warmup)
    if name == "cosine_with_warmup":
        return cosine_with_warmup(base_lr, warmup, int(decay))
    if name == "timm_cosine":
        return timm_cosine(base_lr, int(decay), warmup)
    raise ValueError(f"unknown lr scheduler {name!r}")
