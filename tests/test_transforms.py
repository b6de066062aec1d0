"""Host-side Transform must reproduce the reference composition
(/root/reference/datasets/transforms.py:12-35): T.Resize(pair(int(size/
scale))) — an EXACT-SQUARE, aspect-distorting resize (the reference passes
a (n, n) tuple, not an int) — then crops, then ToTensor scaling. A
shorter-side resize here would silently evaluate reference-trained weights
on differently-preprocessed pixels."""

import numpy as np
from PIL import Image

from attention_models_tpu.data.transforms import get_transform
from attention_models_tpu.utils.config import Config


def _cfg(**pp):
    base = {"resolution": 48, "scale": 0.75, "random_crop": False,
            "random_flip": False, "center_crop": False,
            "mean": None, "std": None}
    base.update(pp)
    return Config({"dataset": {"preprocessing": base}})


def test_transform_square_resize_matches_reference_composition():
    rs = np.random.RandomState(0)
    img = Image.fromarray((rs.rand(96, 128, 3) * 255).astype(np.uint8))

    # reference (eval): Resize((48, 48)) -> CenterCrop(48) -> ToTensor
    ref = np.asarray(
        img.convert("RGB").resize((48, 48), Image.BILINEAR), np.uint8
    ).astype(np.float32) / 255.0
    ref = np.transpose(ref, (2, 0, 1))

    out = get_transform(_cfg(), is_train=False)(img)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_transform_train_scale_then_center_crop():
    """Train with scale=0.75: resize to the 64x64 square then CenterCrop 48
    (reference order with center_crop: true)."""
    rs = np.random.RandomState(1)
    img = Image.fromarray((rs.rand(200, 100, 3) * 255).astype(np.uint8))

    r = np.asarray(
        img.convert("RGB").resize((64, 64), Image.BILINEAR), np.uint8
    )
    ref = r[8:56, 8:56].astype(np.float32) / 255.0
    ref = np.transpose(ref, (2, 0, 1))

    out = get_transform(_cfg(center_crop=True), is_train=True)(img)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_transform_normalize_applied():
    rs = np.random.RandomState(2)
    img = Image.fromarray((rs.rand(64, 64, 3) * 255).astype(np.uint8))
    cfg = _cfg(mean=[0.5, 0.5, 0.5], std=[0.5, 0.5, 0.5])
    out = get_transform(cfg, is_train=False)(img)
    plain = get_transform(_cfg(), is_train=False)(img)
    np.testing.assert_allclose(out, (plain - 0.5) / 0.5, atol=1e-6)
