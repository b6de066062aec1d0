"""InceptionV3 pool3 feature tower for published-scale FID.

The canonical FID (Heusel et al. 2017) uses the TF-Inception pool3 (2048-d)
features; the shipped eval metric is a VGG-FID stand-in because no Inception
checkpoint exists offline (utils/eval_metrics.py). This module is the
hair-trigger for the moment weights land: a flax implementation of
**pytorch-fid's InceptionV3 variant** (torchvision inception_v3 graph with
pytorch-fid's three FID-specific patches) plus a state_dict converter, so

    tools/golden_run.py --artifacts DIR      # DIR holds pt_inception*.pth

swaps ``val_fid_vgg`` for the published-comparable Inception FID.

Architecture notes (vs torchvision, matching pytorch-fid):
- every in-branch average pool uses ``count_include_pad=False``
- Mixed_7c's (the second InceptionE) pool branch uses MAX pooling
- input is bilinearly resized to 299x299 and scaled to [-1, 1]

No pretrained weights ship here — the tower is tested for shape/determinism
and converter key-coverage with synthetic state_dicts; feature values become
published-comparable only with the real checkpoint. (The reference has no
FID at all — its eval renders image grids only,
/root/reference/trainers/vitgqgan.py:211-231.)
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _avg_pool_nopad_count(x, window: int = 3):
    """3x3 stride-1 SAME average pool with ``count_include_pad=False``
    (pytorch-fid's patched branches): divide by the number of REAL elements
    under the window, not window**2. NHWC."""
    dims = (1, window, window, 1)
    strides = (1, 1, 1, 1)
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, dims, strides, "SAME"
    )
    counts = jax.lax.reduce_window(
        jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None],
        0.0, jax.lax.add, dims, strides, "SAME",
    )
    return summed / counts


def _max_pool(x, window: int = 3, stride: int = 2, pad: str | Sequence = "VALID"):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1),
        (1, stride, stride, 1), pad,
    )


class BasicConv2d(nn.Module):
    """Conv (no bias) + BatchNorm(eps=1e-3) + ReLU — torchvision's
    BasicConv2d. Inference-only: BN uses the converted running stats."""

    features: int
    kernel: tuple
    stride: int = 1
    padding: tuple | str = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel,
                    strides=(self.stride, self.stride),
                    padding=self.padding, use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         momentum=0.9, name="bn")(x)
        return nn.relu(x)


def _pad(a: int, b: int | None = None):
    b = a if b is None else b
    return ((a, a), (b, b))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=_pad(2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=_pad(1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=_pad(1), name="branch3x3dbl_3")(b3)
        bp = _avg_pool_nopad_count(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=_pad(1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=_pad(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=_pad(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=_pad(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=_pad(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=_pad(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=_pad(0, 3), name="branch7x7dbl_5")(bd)
        bp = _avg_pool_nopad_count(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=_pad(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=_pad(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    # pytorch-fid: Mixed_7b pools with count-exclude-pad AVG, Mixed_7c with MAX
    pool_mode: str = "avg"

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=_pad(0, 1), name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=_pad(1, 0), name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=_pad(1), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=_pad(0, 1), name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=_pad(1, 0), name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        if self.pool_mode == "max":
            bp = _max_pool(x, 3, 1, [(0, 0), (1, 1), (1, 1), (0, 0)])
        else:
            bp = _avg_pool_nopad_count(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """Input: NCHW float in [0, 1] (the trainers' image convention).
    Output: (b, 2048) pool3 features."""

    resize_input: bool = True

    @nn.compact
    def __call__(self, x):
        x = jnp.transpose(x.astype(jnp.float32), (0, 2, 3, 1))  # NHWC
        if self.resize_input:
            x = jax.image.resize(
                x, (x.shape[0], 299, 299, x.shape[3]), method="bilinear"
            )
        x = x * 2.0 - 1.0  # pytorch-fid normalize_input

        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=_pad(1), name="Conv2d_2b_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> (b, 2048)
