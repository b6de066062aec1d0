"""Checkpoint / resume via orbax (SURVEY.md §5): unlike the reference —
which saves model weights + step only and silently loses optimizer/scheduler/
RNG state on resume (base_trainer.py:92-115) — the full train state is saved:
params, optimizer state, step, and the host PRNG key."""

from __future__ import annotations

import logging
import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

log = logging.getLogger(__name__)


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any, force: bool = False,
             wait: bool = False):
        """Async by default: orbax copies device arrays to host before
        returning (safe against donated/overwritten buffers) and streams to
        disk in the background, so training never stalls on filesystem I/O.
        ``wait=True`` blocks until durable — use for final/preemption saves."""
        self._mgr.save(step, args=ocp.args.StandardSave(state), force=force)
        if wait:
            self._mgr.wait_until_finished()
        log.info("saved checkpoint step=%d -> %s (wait=%s)",
                 step, self._dir, wait)

    def wait(self):
        self._mgr.wait_until_finished()

    def latest_step(self):
        self._mgr.wait_until_finished()
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: int | None = None,
                partial: bool = False) -> Any:
        """``partial=True`` restores only the template's top-level keys out
        of a larger on-disk state — what the inference CLIs need: trainers
        save {step, params|g_params, opt, host_rng, ...} but inference only
        wants the weights, and StandardRestore rejects a template that
        doesn't cover the saved tree."""
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        if partial:
            path = self._item_path(step)
            ck = ocp.StandardCheckpointer()
            disk = dict(ck.metadata(path).item_metadata)
            missing = [k for k in state_template if k not in disk]
            if missing:
                raise KeyError(
                    f"checkpoint at {path} has no keys {missing}; "
                    f"on disk: {sorted(disk)}"
                )

            def sds(tree):
                return jax.tree.map(
                    lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype), tree
                )

            full = {
                k: (state_template[k] if k in state_template else sds(v))
                for k, v in disk.items()
            }
            restored = ck.restore(path, full)
            log.info("restored %s (partial) step=%d from %s",
                     sorted(state_template), step, self._dir)
            return {k: restored[k] for k in state_template}
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )
        log.info("restored checkpoint step=%d from %s", step, self._dir)
        return restored

    def restore_params(self, template_params: Any, key: str = "params",
                       prefer_ema: bool = True, step: int | None = None):
        """Weights-for-inference restore: the ``key`` params subtree (trainers
        save "params" or "g_params"), with the EMA subtrees
        (``training.ema_decay``) overlaid when the checkpoint carries them —
        serving should see the averaged weights, which is what EMA exists
        for. Returns the params tree, or None when no checkpoint exists."""
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        path = self._item_path(step)
        disk = dict(ocp.StandardCheckpointer().metadata(path).item_metadata)
        template = {key: template_params}
        if prefer_ema and "ema" in disk:
            template["ema"] = {
                k: template_params[k] for k in dict(disk["ema"])
            }
        restored = self.restore(template, step=step, partial=True)
        params = restored[key]
        if "ema" in restored:
            log.info("using EMA weights for %s", sorted(restored["ema"]))
            params = {**params, **restored["ema"]}
        return params

    def restore_params_auto(self, keys=("g_params", "params"),
                            prefer_ema: bool = True, step: int | None = None):
        """``restore_params`` for callers holding NO live template: leaf
        shapes/dtypes come from the checkpoint's own metadata. Used by the
        model factory to load a frozen tokenizer straight from another
        run's orbax directory (train the ViTVQGAN here, then train
        MaskGIT/Muse/Parti on it — no torch round-trip)."""
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        disk = dict(
            ocp.StandardCheckpointer().metadata(
                self._item_path(step)).item_metadata
        )
        key = next((k for k in keys if k in disk), None)
        if key is None:
            raise KeyError(
                f"checkpoint has none of {keys}; on disk: {sorted(disk)}"
            )
        template = jax.tree.map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype), dict(disk[key])
        )
        return self.restore_params(template, key=key, prefer_ema=prefer_ema,
                                   step=step)

    def _item_path(self, step: int) -> str:
        cand = os.path.join(self._dir, str(step))
        if not os.path.isdir(cand):  # zero-padded step-name formats
            for name in sorted(os.listdir(self._dir)):
                full = os.path.join(self._dir, name)
                if os.path.isdir(full) and name.lstrip("0") == str(step):
                    cand = full
                    break
        return os.path.join(cand, "default")


def apply_param_patches(params: dict, patches: dict[str, Any]) -> dict:
    """Overwrite init-time param subtrees with converted pretrained weights
    (the frozen-tokenizer injection, model_factory.py:14-17). Shapes are
    validated leaf-by-leaf."""
    params = jax.tree.map(lambda x: x, params)  # shallow copy tree
    for key, subtree in patches.items():
        tgt = params["params"][key]

        def check(path, new, old):
            new = np.asarray(new)
            if new.shape != old.shape:
                raise ValueError(
                    f"patch shape mismatch at {key}/{path}: "
                    f"{new.shape} vs {old.shape}"
                )
            return new.astype(old.dtype)

        params["params"][key] = jax.tree_util.tree_map_with_path(
            lambda p, n, o: check(p, n, o), subtree, tgt
        )
    return params
