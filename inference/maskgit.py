"""MaskGIT inpainting / generation CLI (API parity with
/root/reference/inference/maskgit.py):

    python inference/maskgit.py [--image x.jpg] --vq-ckpt VitVQGAN.pt \
        [--ckpt <orbax dir>] [--num-masked 100] [--timesteps 8]

Without --image, generates from scratch. Writes final.jpg.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", default=None)
    ap.add_argument("--vq-ckpt", default=None)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--output", default="final.jpg")
    ap.add_argument("--num-masked", type=int, default=100)
    ap.add_argument("--timesteps", type=int, default=8)
    ap.add_argument("--approx-topk", dest="approx_topk",
                    action="store_true",
                    help="faster lax.approx_max_k top-p filter (recall ~0.95) instead of the reference-exact top-count filter")
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--depth", type=int, default=6)
    ap.add_argument("--quant", default=None, choices=["int8", "int8_wide"],
                    help="W8A8 int8 decode (2x MXU rate on v5e)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from attention_models_tpu.models.factory import load_vq_checkpoint
    from attention_models_tpu.models.maskgit import MaskGitTransformer
    from attention_models_tpu.utils.checkpoint import (
        CheckpointManager,
        apply_param_patches,
    )
    from inference.vitvqgan import load_image, save_side_by_side

    vq_config = dict(
        vit_params=dict(dim=512, img_size=args.resolution, patch_size=8,
                        n_heads=8, d_head=64, depth=6, mlp_dim=2048,
                        dropout=0.0),
        codebook_params=dict(codebook_size=8192, codebook_dim=32),
    )
    model = MaskGitTransformer(
        dim=args.dim, vq_config=vq_config, vocab_size=8192,
        n_heads=8, d_head=64, dec_depth=args.depth, dropout=0.0,
        quant=args.quant,
    )

    imgs = (jnp.array(load_image(args.image, args.resolution))
            if args.image else None)
    dummy = imgs if imgs is not None else jnp.zeros(
        (1, 3, args.resolution, args.resolution), jnp.float32
    )
    import functools
    variables = jax.jit(
        functools.partial(model.init, method=MaskGitTransformer.init_all)
    )(jax.random.key(0), dummy, jax.random.key(1))
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

    gen = jax.jit(functools.partial(
        model.apply, batch=1, num_masked=args.num_masked,
        timesteps=args.timesteps, approx_topk=args.approx_topk,
        method=MaskGitTransformer.generate,
    ))
    out = (gen(variables, jax.random.key(2), imgs=imgs)
           if imgs is not None else gen(variables, jax.random.key(2)))
    out = np.asarray(out, np.float32)
    if imgs is not None:
        save_side_by_side(np.asarray(imgs), out, args.output)
    else:
        from PIL import Image

        arr = (np.clip(out[0], 0, 1) * 255).astype(np.uint8).transpose(1, 2, 0)
        Image.fromarray(arr).save(args.output)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
