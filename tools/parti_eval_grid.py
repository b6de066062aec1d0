"""Regenerate the committed Parti sample grid from a trained checkpoint.

The trainer writes its eval grid only on the ``eval_every`` cadence; this
tool reproduces that artifact standalone — load the orbax checkpoint, greedy-
decode the first val batch's captions, save the grid — so the committed
evidence (outputs/parti_coco_mini/images/parti_step_0.png, the reference's
committed-outputs practice, /root/reference/trainers/vitgqgan.py:211-231)
can be refreshed without retraining. On the tunneled axon backend run with
--workaround (host-stepped decode, tools/axon_decode_repro.py).

    python tools/parti_eval_grid.py --ckpt outputs/parti_coco_mini \
        [--workaround] [--out outputs/parti_coco_mini/images/parti_step_0.png]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", default="outputs/parti_coco_mini")
    ap.add_argument("--out", default=None)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--workaround", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from axon_decode_repro import build_parti, load_coco_mini_batch
    from attention_models_tpu.models.parti import Parti, parti_generate
    from attention_models_tpu.utils.checkpoint import CheckpointManager
    from attention_models_tpu.utils.metrics import save_image_grid

    model = build_parti(depth=8, dim=512, dtype_str="bf16", cache_len=1024)
    ids, _ = load_coco_mini_batch(args.batch)
    dummy = jnp.zeros((1, 3, 256, 256), jnp.float32)
    shapes = jax.eval_shape(
        lambda k, i, d: model.init(k, i, d, method=Parti.init_all),
        jax.random.key(0), jnp.asarray(ids), dummy)
    template = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    ckpt_dir = args.ckpt
    sub = os.path.join(args.ckpt, "checkpoints", "parti_coco_mini_overfit")
    if os.path.isdir(sub):
        ckpt_dir = sub
    params = CheckpointManager(ckpt_dir).restore_params(template["params"])
    if params is None:
        raise SystemExit(f"no checkpoint restored from {ckpt_dir}")

    imgs = np.asarray(parti_generate(
        model, {"params": params}, jnp.asarray(ids), jax.random.key(1),
        temperature=0.0, axon_workaround=args.workaround), np.float32)
    out = args.out or os.path.join(args.ckpt, "images", "parti_step_0.png")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    save_image_grid(imgs, out, nrow=6)
    print(f"saved {imgs.shape[0]}-tile grid to {out}")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
