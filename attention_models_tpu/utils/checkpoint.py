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

    def restore(self, state_template: Any, step: int | None = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )
        log.info("restored checkpoint step=%d from %s", step, self._dir)
        return restored


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
