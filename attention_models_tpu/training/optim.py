"""Optimizer factory: optax equivalents of the reference's Adam/AdamW setup
(trainers/utils/optimizer.py:5-18), plus the pieces the reference handled via
Accelerate or module mutation:

- grad clipping (accelerator.clip_grad_norm_)
- gradient accumulation (accelerator.accumulate -> optax.MultiSteps)
- frozen submodules (requires_grad_(False) on vq/text encoder -> zero-update
  masks over param subtrees)
- no-decay param grouping for bias/LayerNorm/embeddings
  (trainers/muse.py:48-59 -> optax.masked weight decay)
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import optax


def _path_has(path, names: Sequence[str]) -> bool:
    parts = [str(getattr(p, "key", p)) for p in path]
    return any(n in parts for n in names)


def decay_mask(params, no_decay_names=("bias", "beta", "gamma", "scale",
                                       "embedding", "pos_enc", "class_token",
                                       "bias1", "bias2", "start_token")):
    """True where weight decay applies (2D+ kernels not in the no-decay set)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: not _path_has(path, no_decay_names)
        and leaf.ndim >= 2,
        params,
    )


def frozen_mask(params, frozen_subtrees: Sequence[str]):
    """True where params are trainable (outside the frozen subtrees)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: not _path_has(path, frozen_subtrees), params
    )


def build_optimizer(
    cfg,
    schedule: Callable,
    params,
    frozen_subtrees: Sequence[str] = (),
    no_decay_grouping: bool = False,
):
    name = cfg.optimizer.name
    p = cfg.optimizer.params
    b1, b2 = float(p.beta1), float(p.beta2)
    wd = float(p.get("weight_decay", 0.0) or 0.0)
    eps = float(p.get("epsilon", 1e-8) or 1e-8)

    if name == "adamw" and no_decay_grouping and wd > 0:
        # decay_mask passed as a CALLABLE: when this whole chain runs inside
        # optax.masked (frozen_subtrees below), the updates pytree carries
        # MaskedNode leaves — a mask precomputed on the full params tree
        # would no longer match its structure
        base = optax.chain(
            optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
            optax.masked(optax.add_decayed_weights(wd), decay_mask),
            optax.scale_by_learning_rate(schedule),
        )
    elif name == "adamw":
        base = optax.adamw(schedule, b1=b1, b2=b2, eps=eps, weight_decay=wd)
    elif name == "adam":
        base = optax.adam(schedule, b1=b1, b2=b2, eps=eps)
        if wd:  # torch Adam applies L2 via grad += wd * param (pre-moment)
            base = optax.chain(optax.add_decayed_weights(wd), base)
    else:
        raise ValueError(f"unknown optimizer {name!r}")

    max_grad_norm = cfg.training.get("max_grad_norm")
    if max_grad_norm:
        base = optax.chain(optax.clip_by_global_norm(float(max_grad_norm)), base)

    if frozen_subtrees:
        frozen = jax.tree.map(lambda m: not m,
                              frozen_mask(params, frozen_subtrees))
        trainable = jax.tree.map(lambda m: not m, frozen)
        # run the optimizer on the TRAINABLE partition only — optax.masked
        # substitutes MaskedNode for masked-out leaves in the inner state,
        # so no adam moments are allocated for the frozen towers (for
        # Muse's frozen vq + text encoder that is two full fp32 copies of
        # ~their params in HBM holding permanent zeros) — then zero the
        # frozen updates, which the first masked passes through unchanged
        base = optax.chain(
            optax.masked(base, trainable),
            optax.masked(optax.set_to_zero(), frozen),
        )

    accum = int(cfg.training.get("gradient_accumulation_steps", 1) or 1)
    if accum > 1:
        base = optax.MultiSteps(base, every_k_schedule=accum)
    return base
