"""Muse text-to-image CLI (API parity with /root/reference/inference/muse.py):

    python inference/muse.py --prompt "stop sign" --vq-ckpt VitVQGAN.pt \
        [--ckpt <orbax dir>] [--timesteps 18]

Writes test.jpg.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt", default="stop sign")
    ap.add_argument("--vq-ckpt", default=None)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--output", default="test.jpg")
    ap.add_argument("--timesteps", type=int, default=18)
    ap.add_argument("--guidance-scale", type=float, default=None,
                    help="CFG scale (default: the model's trained scale, 3.0 "
                         "— the reference hardcodes 3, muse.py:217)")
    ap.add_argument("--approx-topk", dest="approx_topk",
                    action="store_true",
                    help="faster lax.approx_max_k top-p filter (recall ~0.95) instead of the reference-exact top-count filter")
    ap.add_argument("--resolution", type=int, default=256)
    # decoder dims default to the reference inference config
    # (inference/muse.py:36-86: dim 768, depth 16, heads 12, mult 8)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--depth", type=int, default=16)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--mult", type=int, default=8)
    ap.add_argument("--quant", default=None, choices=["int8", "int8_wide"],
                    help="W8A8 int8 decode (2x MXU rate on v5e; "
                         "per-token dynamic activation scales)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from attention_models_tpu.models.factory import load_vq_checkpoint
    from attention_models_tpu.models.muse import MUSE
    from attention_models_tpu.models.text_encoder import tokenize
    from attention_models_tpu.utils.checkpoint import (
        CheckpointManager,
        apply_param_patches,
    )

    vq_config = dict(
        vit_params=dict(dim=512, img_size=args.resolution, patch_size=8,
                        n_heads=8, d_head=64, depth=6, mlp_dim=2048,
                        dropout=0.0),
        codebook_params=dict(codebook_size=8192, codebook_dim=32),
    )
    model = MUSE(dim=args.dim, vq_config=vq_config, n_heads=args.heads,
                 d_head=64, depth=args.depth, mult=args.mult,
                 quant=args.quant)

    ids = jnp.array(tokenize([args.prompt]))
    dummy = jnp.zeros((1, 3, args.resolution, args.resolution), jnp.float32)
    import functools
    variables = jax.jit(
        functools.partial(model.init, method=MUSE.init_all)
    )(jax.random.key(0), ids, dummy, jax.random.key(1))
    if args.ckpt and os.path.isdir(args.ckpt):
        params = CheckpointManager(args.ckpt).restore_params(
            variables["params"]
        )
        if params is not None:
            variables = {"params": params}
    if args.vq_ckpt:
        vq = load_vq_checkpoint(args.vq_ckpt, depth=6)
        if vq is not None:
            variables = apply_param_patches(variables, {"vq": vq})

    imgs = jax.jit(functools.partial(model.apply, timesteps=args.timesteps,
                               approx_topk=args.approx_topk,
                               guidance_scale=args.guidance_scale,
                               method=MUSE.generate))(
        variables, ids, jax.random.key(2))
    from PIL import Image

    arr = (np.clip(np.asarray(imgs, np.float32)[0], 0, 1) * 255).astype(
        np.uint8
    ).transpose(1, 2, 0)
    Image.fromarray(arr).save(args.output)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
