"""GAN / reconstruction losses for the VQGAN trainer (API parity with
/root/reference/trainers/vitgqgan.py:32-42, 115-131, 166-181).

LPIPS: the reference uses the lpips package's pretrained VGG16
(vitgqgan.py:80-82). This build implements the LPIPS architecture natively in
flax (``VGG16Features`` + per-layer 1x1 linear heads on unit-normalized
activations). Pretrained torchvision-VGG16 + LPIPS-lin weights can be
converted with ``utils.torch_convert`` when available; in fully-offline
environments the perceptual tower falls back to a FIXED random-init backbone
(deterministic seed) — still a meaningful multi-scale structural loss, but
NOT the published LPIPS metric (documented; see README).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


def hinge_d_loss(fake_logits, real_logits):
    """0.5·(mean(relu(1+fake)) + mean(relu(1−real))) — vitgqgan.py:32-36."""
    loss_fake = jnp.mean(nn.relu(1.0 + fake_logits))
    loss_real = jnp.mean(nn.relu(1.0 - real_logits))
    return 0.5 * (loss_real + loss_fake)


def g_nonsaturating_loss(fake_logits):
    """mean(softplus(−fake)) — vitgqgan.py:39-42."""
    return jnp.mean(nn.softplus(-fake_logits))


def gradient_penalty(discr_fn, rng, real, fake, lambda_term: float = 10.0):
    """WGAN-GP with the reference's exact (quirky) norm: gradients wrt the
    interpolated images, L2 norm over the CHANNEL dim only
    (vitgqgan.py:115-131 ``gradients.norm(2, dim=1)``), mean((‖g‖−1)²)·λ."""
    b = real.shape[0]
    eta = jax.random.uniform(rng, (b, 1, 1, 1), dtype=real.dtype)
    interp = eta * real + (1.0 - eta) * fake

    grads = jax.grad(lambda x: jnp.sum(discr_fn(x)))(interp)
    norm = jnp.sqrt(jnp.sum(jnp.square(grads), axis=1) + 1e-12)  # over C
    return jnp.mean((norm - 1.0) ** 2) * lambda_term


# --------------------------------------------------------------------------- #
# LPIPS (perceptual loss)
# --------------------------------------------------------------------------- #

# VGG16 conv plan: (out_channels, pool_before). LPIPS taps after each ReLU
# block: relu1_2, relu2_2, relu3_3, relu4_3, relu5_3.
_VGG16_PLAN = [
    (64, False), (64, False),
    (128, True), (128, False),
    (256, True), (256, False), (256, False),
    (512, True), (512, False), (512, False),
    (512, True), (512, False), (512, False),
]
_TAP_AFTER = {1, 3, 6, 9, 12}  # conv indices whose ReLU output is tapped
_SHIFT = jnp.array([-0.030, -0.088, -0.188])
_SCALE = jnp.array([0.458, 0.448, 0.450])


class VGG16Features(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # NHWC in [-1, 1] after LPIPS scaling
        taps = []
        for i, (ch, pool) in enumerate(_VGG16_PLAN):
            if pool:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                        name=f"conv{i}")(x)
            x = nn.relu(x)
            if i in _TAP_AFTER:
                taps.append(x)
        return taps


class LPIPS(nn.Module):
    """lpips.LPIPS(net='vgg') equivalent: unit-normalize tapped features,
    squared diff, 1x1 linear head per tap, spatial mean, sum over taps.
    Inputs are NCHW images in [0, 1] (matching how the reference trainer
    feeds it, images unnormalized per cfg mean:null)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        def prep(img):
            img = jnp.transpose(img, (0, 2, 3, 1))  # NHWC
            img = img * 2.0 - 1.0  # [0,1] -> [-1,1] (lpips im2tensor range)
            return (img - _SHIFT.astype(img.dtype)) / _SCALE.astype(img.dtype)

        vgg = VGG16Features(dtype=self.dtype, name="vgg")
        fx, fy = vgg(prep(x)), vgg(prep(y))
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            an = a / jnp.sqrt(jnp.sum(a * a, -1, keepdims=True) + 1e-10)
            bn = b / jnp.sqrt(jnp.sum(b * b, -1, keepdims=True) + 1e-10)
            d = (an - bn) ** 2
            lin = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                          name=f"lin{i}")(d)
            total = total + jnp.mean(lin, axis=(1, 2, 3))
        return total  # (b,)
