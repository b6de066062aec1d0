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
        params = CheckpointManager(ckpt_path).restore_params(
            template["params"], key="g_params"
        )
        if params is not None:
            return {"params": params}
    print("warning: no checkpoint loaded; using random init", file=sys.stderr)
    return jax.jit(model.init)(jax.random.key(0), example_imgs)


def golden_json(model, variables, imgs, indices, rec, ckpt_path, ref_path):
    """One-command golden fidelity report: when the PyTorch reference code
    and the released .pt are both reachable, run the torch round-trip on the
    same image/weights and emit one JSON line with index-match rate + PSNR
    (the BASELINE.md bit-match protocol — /root/reference/inference/
    vitvqgan.py:21-77, README.md:43-45)."""
    import json

    import jax.numpy as jnp

    from attention_models_tpu.utils.eval_metrics import psnr

    out = {
        "metric": "vitvqgan_golden_fidelity",
        "ckpt": ckpt_path,
        "psnr_recon_db": round(float(jnp.mean(
            psnr(jnp.clip(jnp.array(rec), 0, 1), jnp.array(imgs))
        )), 3),
        "unique_codes": int(len(np.unique(np.asarray(indices)))),
        "index_match_rate": None,
    }
    try:
        import torch

        from attention_models_tpu.utils.torch_convert import (
            load_reference_vitvqgan,
        )

        vit_params = dict(dim=512, img_size=imgs.shape[-1], patch_size=8,
                          n_heads=8, d_head=64, depth=6, mlp_dim=2048,
                          dropout=0.0)
        m = load_reference_vitvqgan(
            ref_path, vit_params, dict(codebook_dim=32, codebook_size=8192))
        sd = torch.load(ckpt_path, map_location="cpu")
        sd = sd.get("state_dict", sd)
        m.load_state_dict(sd, strict=False)
        with torch.no_grad():
            idx_ref = m.encode_imgs(torch.from_numpy(np.asarray(imgs)))
        match = float(np.mean(
            np.asarray(indices).reshape(-1) == idx_ref.numpy().reshape(-1)
        ))
        out["index_match_rate"] = round(match, 6)
    except Exception as e:  # reference or torch absent: ours-only metrics
        out["note"] = f"torch reference unavailable ({type(e).__name__})"
    print(json.dumps(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", required=True)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--output", default="reconstruction.jpg")
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--golden-json", action="store_true",
                    help="emit a one-line JSON fidelity report (index-match "
                         "rate vs the torch reference when available, PSNR)")
    ap.add_argument("--ref-path",
                    default=os.environ.get("ATTN_REF_PATH",
                                           "/root/reference"),
                    help="PyTorch reference checkout for --golden-json")
    args = ap.parse_args()

    import jax

    # this CLI is the golden-fidelity path: TPU fp32 matmuls default to
    # reduced precision, which costs ~2% of codebook indices vs the torch
    # reference — force true fp32 so indices bit-match
    jax.config.update("jax_default_matmul_precision", "highest")
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
    if args.golden_json:
        golden_json(model, variables, np.asarray(imgs),
                    np.asarray(indices), np.asarray(rec, np.float32),
                    args.ckpt, args.ref_path)


if __name__ == "__main__":
    main()
