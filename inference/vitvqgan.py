"""ViTVQGAN reconstruction round-trip CLI (API parity with
/root/reference/inference/vitvqgan.py):

    python inference/vitvqgan.py --image x.jpg --ckpt VitVQGAN.pt \
        [--output out.jpg] [--resolution 256]

Accepts either a converted orbax checkpoint directory or the released torch
``VitVQGAN.pt`` (converted on the fly). Writes a side-by-side
original/reconstruction JPEG. This is the golden-fidelity path: codebook
indices must bit-match the PyTorch reference (SURVEY.md §3.4).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def load_image(path: str, resolution: int) -> np.ndarray:
    from PIL import Image

    img = Image.open(path).convert("RGB").resize(
        (resolution, resolution), Image.BILINEAR
    )
    arr = np.asarray(img, np.float32) / 255.0
    return np.transpose(arr, (2, 0, 1))[None]  # (1, 3, H, W)


def save_side_by_side(orig: np.ndarray, rec: np.ndarray, path: str):
    from PIL import Image

    both = np.concatenate([orig[0], np.clip(rec[0], 0, 1)], axis=2)
    arr = (both * 255).astype(np.uint8).transpose(1, 2, 0)
    Image.fromarray(arr).save(path)


def load_params(model, ckpt_path: str, depth: int, example_imgs):
    import jax

    if ckpt_path and ckpt_path.endswith(".pt") and os.path.exists(ckpt_path):
        from attention_models_tpu.models.factory import load_vq_checkpoint

        converted = load_vq_checkpoint(ckpt_path, depth)
        if converted is not None:
            return {"params": converted}
    if ckpt_path and os.path.isdir(ckpt_path):
        from attention_models_tpu.utils.checkpoint import CheckpointManager

        template = jax.jit(model.init)(jax.random.key(0), example_imgs)
        state = CheckpointManager(ckpt_path).restore(
            {"step": 0, "g_params": template["params"]}
        )
        if state is not None:
            return {"params": state["g_params"]}
    print("warning: no checkpoint loaded; using random init", file=sys.stderr)
    return jax.jit(model.init)(jax.random.key(0), example_imgs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", required=True)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--output", default="reconstruction.jpg")
    ap.add_argument("--resolution", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from attention_models_tpu.models.vitvqgan import ViTVQGAN, vitvqgan_base

    model = vitvqgan_base(img_size=args.resolution)
    imgs = jnp.array(load_image(args.image, args.resolution))
    variables = load_params(model, args.ckpt, depth=6, example_imgs=imgs)

    indices = jax.jit(
        lambda v, x: model.apply(v, x, method=ViTVQGAN.encode_imgs)
    )(variables, imgs)
    rec = jax.jit(
        lambda v, i: model.apply(v, i, method=ViTVQGAN.decode_indices)
    )(variables, indices)

    print(f"indices shape: {indices.shape}, unique codes: "
          f"{len(np.unique(np.asarray(indices)))}")
    save_side_by_side(np.asarray(imgs), np.asarray(rec, np.float32),
                      args.output)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
