"""Parti autoregressive text-to-image CLI (the reference ships the model but
no inference script — gap closed):

    python inference/parti.py --prompt "stop sign" [--vq-ckpt VitVQGAN.pt] \
        [--ckpt <orbax dir>]
"""

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt", default="stop sign")
    ap.add_argument("--vq-ckpt", default=None)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--output", default="parti.jpg")
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--depth", type=int, default=6)
    ap.add_argument("--guidance-scale", type=float, default=0.0,
                    help="classifier-free guidance (0 = off; needs a model "
                         "trained with model.cond_keep_prob < 1)")
    ap.add_argument("--quant", choices=["int8", "int8_wide"], default=None,
                    help="W8A8 int8 decode (TPU serving fast path)")
    ap.add_argument("--temperature", type=float, default=1.0,
                    help="gumbel sampling temperature (0 = argmax decode)")
    ap.add_argument("--axon-workaround", action="store_true",
                    help="mitigate the tunneled-axon batch-position decode "
                         "corruption (tools/axon_decode_repro.py): host-"
                         "stepped decode, one tunnel round-trip per token")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from attention_models_tpu.models.factory import load_vq_checkpoint
    from attention_models_tpu.models.parti import Parti, parti_generate
    from attention_models_tpu.models.text_encoder import tokenize
    from attention_models_tpu.utils.checkpoint import (
        CheckpointManager,
        apply_param_patches,
    )

    vq_config = dict(
        kind="vitvqgan",
        vit_params=dict(dim=512, img_size=args.resolution, patch_size=8,
                        n_heads=8, d_head=64, depth=6, mlp_dim=2048,
                        dropout=0.0),
        codebook_params=dict(codebook_size=8192, codebook_dim=32),
    )
    model = Parti(dim=args.dim, vq_config=vq_config, n_heads=8, d_head=64,
                  depth=args.depth, quant=args.quant)

    ids = jnp.array(tokenize([args.prompt]))
    dummy = jnp.zeros((1, 3, args.resolution, args.resolution), jnp.float32)
    variables = jax.jit(
        functools.partial(model.init, method=Parti.init_all)
    )(jax.random.key(0), ids, dummy)
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

    imgs = parti_generate(model, variables, ids, jax.random.key(2),
                          guidance_scale=args.guidance_scale,
                          temperature=args.temperature,
                          axon_workaround=args.axon_workaround)
    from PIL import Image

    arr = (np.clip(np.asarray(imgs, np.float32)[0], 0, 1) * 255).astype(
        np.uint8
    ).transpose(1, 2, 0)
    Image.fromarray(arr).save(args.output)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
