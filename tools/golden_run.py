"""One-command golden fidelity run against released pretrained artifacts.

The framework's fidelity north star is the released ``VitVQGAN.pt``
(BASELINE.md; /root/reference/README.md:43-45), plus real CLIP text weights,
the pretrained LPIPS VGG16, and an Inception checkpoint for published-scale
FID — none of which exist in the offline build environment. This tool is the
HAIR-TRIGGER: point it at a directory holding any subset of those artifacts
and it converts each one, runs its fidelity protocol, and emits ONE JSON
block (VERDICT r2 #9).

    python tools/golden_run.py --artifacts DIR [--image x.jpg] [--out r.json]

Artifact discovery is by state_dict KEY SNIFFING (not filename), over every
``*.pt/*.pth/*.bin/*.ckpt`` under DIR (recursive):

- ViTVQGAN checkpoint  → encode/decode round-trip; codebook index bit-match
  vs the torch reference (when /root/reference is importable), PSNR, and —
  when LPIPS weights were also found — the PUBLISHED LPIPS metric
- CLIP text tower      → convert_hf_clip_text; forward parity (cosine) vs
  the torch CLIPTextModel loaded from the same weights
- VGG16 (+ LPIPS lins) → convert_vgg16_lpips; distance on a fixed image pair
- InceptionV3          → convert_inception_fid; pool3 features + a smoke FID
  (real-vs-noised) proving the published-FID path is live

Everything degrades gracefully: missing artifacts are listed under
``missing`` and their sections skipped.
"""

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _load_sd(path):
    import torch

    try:
        # discovery sniffs EVERY .pt under --artifacts: don't let a stray
        # malicious pickle execute code during mere key-sniffing
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        log(f"  {path}: not loadable with weights_only=True; falling back "
            f"to full unpickling (trusting --artifacts dir)")
        obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        for key in ("state_dict", "model", "weights"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    return obj if isinstance(obj, dict) else None


def classify(sd) -> str | None:
    keys = set(sd.keys())
    if any(k.startswith("Mixed_5b.") for k in keys):
        return "inception"
    if any(k.startswith("text_model.encoder.layers.0.") for k in keys):
        return "clip"
    if any(k.startswith("encoder.transformer") or k.startswith("pre_quant")
           for k in keys):
        return "vitvqgan"
    if "features.0.weight" in keys and "features.28.weight" in keys:
        return "vgg16"
    if "lin0.model.1.weight" in keys:
        return "lpips_lins"
    return None


def discover(root: str) -> dict:
    found: dict = {}
    pats = ("*.pt", "*.pth", "*.bin", "*.ckpt")
    files = sorted(
        f for p in pats
        for f in glob.glob(os.path.join(root, "**", p), recursive=True)
    )
    for f in files:
        try:
            sd = _load_sd(f)
        except Exception as e:  # noqa: BLE001 — skip unreadable files
            log(f"skip {f}: {type(e).__name__}: {e}")
            continue
        if sd is None:
            continue
        kind = classify(sd)
        if kind and kind not in found:
            found[kind] = (f, sd)
            log(f"{kind}: {f} ({len(sd)} tensors)")
    return found


def _test_image(path: str | None, resolution: int) -> np.ndarray:
    """(1, 3, R, R) float32 in [0,1]: the --image file, or a deterministic
    synthetic gradient+texture image."""
    if path:
        from PIL import Image

        img = Image.open(path).convert("RGB").resize(
            (resolution, resolution), Image.BILINEAR)
        return np.transpose(
            np.asarray(img, np.float32) / 255.0, (2, 0, 1))[None]
    yy, xx = np.mgrid[0:resolution, 0:resolution].astype(np.float32)
    r = 0.5 + 0.5 * np.sin(xx / 9.0) * np.cos(yy / 13.0)
    g = (xx + yy) / (2 * resolution)
    b = 0.5 + 0.5 * np.cos(xx * yy / 700.0)
    return np.clip(np.stack([r, g, b])[None], 0, 1).astype(np.float32)


def _trained_diagnostic(path) -> dict:
    """Has this checkpoint ever seen an optimizer step? Three independent
    fingerprints of torch's init values, all destroyed by training:
    LayerNorm weights exactly 1.0 (std 0), pos_enc = uncorrelated randn
    (neighboring patch embeddings of a TRAINED ViT correlate), codebook
    rows at normal_() scale. The 2026-08 released VitVQGAN.pt fails all
    three (every LN weight bit-exactly 1.0) — it is an UNTRAINED init, so
    its noise reconstructions are the reference's own behavior, bit-matched
    here, not a conversion defect."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = sd.get("state_dict", sd)
    ln_stds = [float(v.float().std()) for k, v in sd.items()
               if k.endswith("norm1.weight") or k.endswith("pre_norm.weight")]
    pe = sd.get("encoder.pos_enc")
    corr = None
    if pe is not None:
        a = pe[0].float().numpy()
        x, y = a[:-1].ravel(), a[1:].ravel()
        corr = float(np.corrcoef(x, y)[0, 1])
    looks_trained = bool(ln_stds and max(ln_stds) > 1e-6)
    return {
        "layernorm_weight_std_max": round(max(ln_stds), 8) if ln_stds else None,
        "pos_enc_neighbor_corr": round(corr, 6) if corr is not None else None,
        "looks_trained": looks_trained,
    }


def _safe_trained_diagnostic(path) -> dict:
    """The diagnostic is advisory — a checkpoint that torch can't load with
    weights_only=True (or with odd key layouts) must not sink the section's
    already-computed recon/bit-match metrics (ADVICE r4)."""
    try:
        return _trained_diagnostic(path)
    except Exception as e:  # noqa: BLE001 — advisory only
        return {"error": f"{type(e).__name__}: {e}"}


def section_vitvqgan(path, imgs, ref_path, lpips_params):
    import jax
    import jax.numpy as jnp

    from attention_models_tpu.models.factory import load_vq_checkpoint
    from attention_models_tpu.models.vitvqgan import ViTVQGAN, vitvqgan_base
    from attention_models_tpu.utils.eval_metrics import psnr

    res = imgs.shape[-1]
    model = vitvqgan_base(img_size=res)
    params = load_vq_checkpoint(path, depth=6)
    variables = {"params": params}
    indices = np.asarray(jax.jit(
        lambda v, x: model.apply(v, x, method=ViTVQGAN.encode_imgs)
    )(variables, jnp.asarray(imgs)))
    rec = np.asarray(jax.jit(
        lambda v, i: model.apply(v, i, method=ViTVQGAN.decode_indices)
    )(variables, jnp.asarray(indices)), np.float32)

    out = {
        "ckpt": path,
        "psnr_recon_db": round(float(jnp.mean(psnr(
            jnp.clip(jnp.asarray(rec), 0, 1), jnp.asarray(imgs)))), 3),
        "unique_codes": int(len(np.unique(indices))),
        "weights_diagnostic": _safe_trained_diagnostic(path),
    }
    if lpips_params is not None:
        from attention_models_tpu.training.losses import LPIPS

        d = LPIPS().apply(lpips_params, jnp.clip(jnp.asarray(rec), 0, 1),
                          jnp.asarray(imgs))
        out["lpips_pretrained"] = round(float(np.mean(np.asarray(d))), 5)

    # torch-reference bit-match protocol (SURVEY.md §3.4)
    try:
        import torch

        from attention_models_tpu.utils.torch_convert import (
            load_reference_vitvqgan,
        )

        vit_params = dict(dim=512, img_size=res, patch_size=8, n_heads=8,
                          d_head=64, depth=6, mlp_dim=2048, dropout=0.0)
        m = load_reference_vitvqgan(
            ref_path, vit_params, dict(codebook_dim=32, codebook_size=8192))
        sd = torch.load(path, map_location="cpu", weights_only=False)
        sd = sd.get("state_dict", sd)
        m.load_state_dict(sd, strict=False)
        with torch.no_grad():
            idx_ref = m.encode_imgs(torch.from_numpy(imgs))
        out["index_match_rate"] = round(float(np.mean(
            indices.reshape(-1) == idx_ref.numpy().reshape(-1))), 6)
    except Exception as e:  # noqa: BLE001
        out["index_match_rate"] = None
        out["note"] = f"torch reference unavailable ({type(e).__name__})"
    return out


def section_clip(path, sd):
    import jax
    import jax.numpy as jnp

    from attention_models_tpu.models.text_encoder import ClipTextModel
    from attention_models_tpu.utils.torch_convert import (
        convert_hf_clip_text,
        state_dict_to_numpy,
    )

    nsd = state_dict_to_numpy(sd)
    layers = 1 + max(
        int(k.split(".")[3]) for k in nsd
        if k.startswith("text_model.encoder.layers.")
    )
    tok_w = nsd["text_model.embeddings.token_embedding.weight"]
    vocab, width = tok_w.shape
    max_len = nsd["text_model.embeddings.position_embedding.weight"].shape[0]
    heads = width // 64
    params = convert_hf_clip_text(nsd, layers=layers)
    tower = ClipTextModel(width=width, heads=heads, layers=layers,
                          vocab_size=vocab, max_length=max_len)
    ids = np.zeros((1, max_len), np.int64)
    ids[0, : min(8, max_len)] = np.arange(1, min(8, max_len) + 1) * 37 % vocab
    ours = np.asarray(tower.apply({"params": params}, jnp.asarray(ids)))
    out = {"ckpt": path, "layers": layers, "width": width, "vocab": vocab}
    try:
        import torch
        from transformers import CLIPTextConfig, CLIPTextModel as TorchClip

        cfg = CLIPTextConfig(
            vocab_size=vocab, hidden_size=width, num_hidden_layers=layers,
            num_attention_heads=heads, max_position_embeddings=max_len,
            intermediate_size=width * 4, hidden_act="quick_gelu",
        )
        tm = TorchClip(cfg).eval()
        tm.load_state_dict(sd, strict=False)
        with torch.no_grad():
            theirs = tm(torch.from_numpy(ids)).last_hidden_state.numpy()
        a, b = ours.ravel(), theirs.ravel()
        out["parity_cosine"] = round(float(
            (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        ), 6)
        out["parity_max_abs"] = round(float(np.abs(a - b).max()), 6)
    except Exception as e:  # noqa: BLE001
        out["note"] = f"torch CLIP comparison unavailable ({type(e).__name__})"
    return out


def convert_lpips(found):
    """(LPIPS variable dict | None) from found vgg16 (+ optional lin) sds."""
    if "vgg16" not in found:
        return None
    from attention_models_tpu.utils.torch_convert import (
        convert_vgg16_lpips,
        state_dict_to_numpy,
    )

    vgg_sd = state_dict_to_numpy(found["vgg16"][1])
    lin_sd = (state_dict_to_numpy(found["lpips_lins"][1])
              if "lpips_lins" in found else None)
    return {"params": convert_vgg16_lpips(vgg_sd, lin_sd)}


def section_lpips(found, imgs, params):
    import jax.numpy as jnp

    from attention_models_tpu.training.losses import LPIPS

    noisy = np.clip(
        imgs + 0.1 * np.random.RandomState(0).randn(*imgs.shape), 0, 1
    ).astype(np.float32)
    d_same = float(np.mean(np.asarray(
        LPIPS().apply(params, jnp.asarray(imgs), jnp.asarray(imgs)))))
    d_noisy = float(np.mean(np.asarray(
        LPIPS().apply(params, jnp.asarray(imgs), jnp.asarray(noisy)))))
    return {
        "ckpt": found["vgg16"][0],
        "has_lin_heads": "lpips_lins" in found,
        "d_identical": round(d_same, 6),
        "d_noisy": round(d_noisy, 6),
        "sane": bool(d_noisy > d_same),
    }


def section_inception(path, sd, imgs):
    import jax.numpy as jnp

    from attention_models_tpu.utils.eval_metrics import (
        fid_score,
        inception_fid_features,
    )
    from attention_models_tpu.utils.torch_convert import convert_inception_fid

    variables = convert_inception_fid(sd)
    feats = np.asarray(inception_fid_features(variables, jnp.asarray(imgs)))
    noisy = np.clip(
        imgs + 0.2 * np.random.RandomState(1).randn(*imgs.shape), 0, 1
    ).astype(np.float32)
    feats_noisy = np.asarray(
        inception_fid_features(variables, jnp.asarray(noisy)))
    return {
        "ckpt": path,
        "pool3_dim": int(feats.shape[-1]),
        "fid_self": round(fid_score(feats, feats), 4),
        "fid_vs_noised": round(fid_score(feats, feats_noisy), 4),
        "published_fid_ready": True,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifacts", required=True,
                    help="directory holding released checkpoints (scanned "
                         "recursively; artifacts identified by key sniffing)")
    ap.add_argument("--image", default=None,
                    help="fidelity test image (default: synthetic)")
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--ref-path",
                    default=os.environ.get("ATTN_REF_PATH", "/root/reference"))
    ap.add_argument("--out", default=None, help="also write the JSON here")
    args = ap.parse_args(argv)

    import jax

    # bit-match protocol needs true fp32 matmuls (inference/vitvqgan.py)
    jax.config.update("jax_default_matmul_precision", "highest")

    found = discover(args.artifacts)
    imgs = _test_image(args.image, args.resolution)
    report = {
        "metric": "golden_fidelity_run",
        "artifacts_dir": args.artifacts,
        "found": {k: v[0] for k, v in found.items()},
        "missing": sorted(
            {"vitvqgan", "clip", "vgg16", "inception"} - set(found)),
    }
    lpips_params = convert_lpips(found)
    if "vitvqgan" in found:
        report["vitvqgan"] = section_vitvqgan(
            found["vitvqgan"][0], imgs, args.ref_path, lpips_params)
    if "clip" in found:
        report["clip"] = section_clip(*found["clip"])
    if "vgg16" in found:
        report["lpips"] = section_lpips(found, imgs, lpips_params)
    if "inception" in found:
        report["inception"] = section_inception(*found["inception"], imgs)

    blob = json.dumps(report, indent=2)
    print(blob)
    if args.out:
        with open(args.out, "w") as f:
            f.write(blob + "\n")
    return report


if __name__ == "__main__":
    main()
