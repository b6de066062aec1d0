"""CNN VQGAN reconstruction round-trip CLI (API parity with
/root/reference/inference/vqgan.py):

    python inference/vqgan.py --image x.jpg [--ckpt <orbax dir or .pt>]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", required=True)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--output", default="vqgan_recon.jpg")
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--codebook-size", type=int, default=1024)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from attention_models_tpu.models.vqgan import VQGAN
    from attention_models_tpu.utils.checkpoint import CheckpointManager
    from inference.vitvqgan import load_image, save_side_by_side

    model = VQGAN(dim=args.dim, codebook_size=args.codebook_size)
    imgs = jnp.array(load_image(args.image, args.resolution))
    variables = jax.jit(model.init)(jax.random.key(0), imgs)
    if args.ckpt and args.ckpt.endswith(".pt") and os.path.exists(args.ckpt):
        import torch

        from attention_models_tpu.utils.torch_convert import (
            convert_vqgan,
            state_dict_to_numpy,
        )

        ckpt = torch.load(args.ckpt, map_location="cpu", weights_only=False)
        sd = ckpt.get("state_dict", ckpt)
        variables = {"params": convert_vqgan(state_dict_to_numpy(sd))}
    elif args.ckpt and os.path.isdir(args.ckpt):
        params = CheckpointManager(args.ckpt).restore_params(
            variables["params"], key="g_params"
        )
        if params is not None:
            variables = {"params": params}
        else:
            print(f"warning: no checkpoint found in {args.ckpt}; "
                  f"using RANDOM init", file=sys.stderr)
    elif args.ckpt:
        raise SystemExit(
            f"--ckpt {args.ckpt!r} is neither an existing .pt file nor an "
            f"orbax checkpoint dir — refusing to silently reconstruct with "
            f"random weights"
        )

    indices = jax.jit(lambda v, x: model.apply(v, x, method=VQGAN.encode_imgs))(variables, imgs)
    rec = jax.jit(lambda v, i: model.apply(v, i, method=VQGAN.decode_indices))(variables, indices)
    print(f"indices shape: {indices.shape}")
    save_side_by_side(np.asarray(imgs), np.asarray(rec, np.float32),
                      args.output)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
