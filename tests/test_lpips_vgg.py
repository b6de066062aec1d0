"""LPIPS tower parity: the flax VGG16 feature extractor must match
torchvision's vgg16 at the five LPIPS tap points (random-init weights
converted via convert_vgg16_lpips — the same path pretrained weights take)."""

import numpy as np
import pytest
import torch

torchvision = pytest.importorskip("torchvision")

import jax.numpy as jnp  # noqa: E402

from attention_models_tpu.training.losses import VGG16Features  # noqa: E402
from attention_models_tpu.utils.torch_convert import (  # noqa: E402
    convert_vgg16_lpips,
    state_dict_to_numpy,
)


def test_vgg16_taps_match_torchvision():
    torch.manual_seed(0)
    tv = torchvision.models.vgg16(weights=None).features.eval()
    x = torch.rand(1, 3, 64, 64)

    # torch tap indices AFTER relu: 3, 8, 15, 22, 29
    taps_ref = []
    h = x
    with torch.no_grad():
        for i, layer in enumerate(tv):
            h = layer(h)
            if i in (3, 8, 15, 22, 29):
                taps_ref.append(h.numpy())

    sd = {f"features.{k}": v for k, v in
          state_dict_to_numpy(tv.state_dict()).items()}
    params = convert_vgg16_lpips(sd)
    ours = VGG16Features()
    xj = jnp.transpose(jnp.array(x.numpy()), (0, 2, 3, 1))
    taps = ours.apply({"params": params["vgg"]}, xj)

    assert len(taps) == 5
    for got, ref in zip(taps, taps_ref):
        got_nchw = np.transpose(np.asarray(got), (0, 3, 1, 2))
        np.testing.assert_allclose(got_nchw, ref, atol=1e-4, rtol=1e-3)
