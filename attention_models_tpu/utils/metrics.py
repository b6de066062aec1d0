"""Structured metrics/observability (SURVEY.md §5 rebuild plan): the
reference logs through wandb-via-Accelerate (base_trainer.py:29-39). Here a
single writer fans out to JSONL (always), TensorBoard and wandb (when
importable), keeping the reference's metric names."""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Mapping

import numpy as np

log = logging.getLogger(__name__)


class MetricsWriter:
    def __init__(self, out_dir: str, project: str, run_name: str,
                 config: dict | None = None, enable_wandb: bool = True):
        os.makedirs(out_dir, exist_ok=True)
        self._jsonl = open(os.path.join(out_dir, "metrics.jsonl"), "a")
        self._tb = None
        self._wandb = None
        try:
            from torch.utils.tensorboard import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(os.path.join(out_dir, "tb"))
        except Exception:
            pass
        if enable_wandb:
            try:
                import wandb  # type: ignore

                self._wandb = wandb.init(
                    project=project, name=run_name, config=config or {}
                )
            except Exception:
                pass

    def log(self, metrics: Mapping, step: int):
        clean = {
            k: (float(v) if np.ndim(v) == 0 else v) for k, v in metrics.items()
        }
        # vector metrics serialize as lists instead of killing the run
        # (json has no encoder for ndarray/jax.Array)
        self._jsonl.write(json.dumps(
            {"step": step, "ts": time.time(), **clean},
            default=lambda o: np.asarray(o).tolist(),
        ) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in clean.items():
                if isinstance(v, (int, float)):
                    self._tb.add_scalar(k, v, step)
        if self._wandb is not None:
            self._wandb.log(clean, step=step)

    def log_image(self, name: str, image_chw: np.ndarray, step: int):
        if self._tb is not None:
            self._tb.add_image(name, np.clip(image_chw, 0, 1), step)
        if self._wandb is not None:
            import wandb  # type: ignore

            self._wandb.log(
                {name: wandb.Image(np.transpose(image_chw, (1, 2, 0)))},
                step=step,
            )

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()


def make_grid(images: np.ndarray, nrow: int = 6, pad: int = 2) -> np.ndarray:
    """torchvision make_grid equivalent: (n, c, h, w) -> (c, H, W)."""
    n, c, h, w = images.shape
    ncol = nrow
    nr = -(-n // ncol)
    grid = np.zeros((c, nr * (h + pad) + pad, ncol * (w + pad) + pad),
                    images.dtype)
    for i in range(n):
        r, col = divmod(i, ncol)
        top = r * (h + pad) + pad
        left = col * (w + pad) + pad
        grid[:, top : top + h, left : left + w] = images[i]
    return grid


def save_image_grid(images: np.ndarray, path: str, nrow: int = 6):
    from PIL import Image

    grid = make_grid(np.asarray(images, np.float32), nrow)
    arr = (np.clip(grid, 0, 1) * 255).astype(np.uint8).transpose(1, 2, 0)
    Image.fromarray(arr).save(path)
