"""PatchGAN discriminator (pix2pix lineage; API parity with
/root/reference/models/utils/discriminator.py:6-54): 4×4 convs, stride-2
ladder, BatchNorm, LeakyReLU(0.2), 1-channel logit map. NCHW in/out like the
reference; NHWC inside."""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn


class NLayerDiscriminator(nn.Module):
    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, imgs, train: bool = False):
        x = jnp.transpose(imgs, (0, 2, 3, 1))  # NHWC
        kw, padw = 4, 1
        x = nn.Conv(self.ndf, (kw, kw), strides=2, padding=padw,
                    dtype=self.dtype, name="conv0")(x)
        x = nn.leaky_relu(x, 0.2)
        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2 ** n, 8)
            x = nn.Conv(self.ndf * nf_mult, (kw, kw), strides=2, padding=padw,
                        use_bias=False, dtype=self.dtype, name=f"conv{n}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name=f"bn{n}")(x)
            x = nn.leaky_relu(x, 0.2)
        nf_mult = min(2 ** self.n_layers, 8)
        x = nn.Conv(self.ndf * nf_mult, (kw, kw), strides=1, padding=padw,
                    use_bias=False, dtype=self.dtype,
                    name=f"conv{self.n_layers}")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         name=f"bn{self.n_layers}")(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(1, (kw, kw), strides=1, padding=padw, dtype=self.dtype,
                    name="conv_out")(x)
        return jnp.transpose(x, (0, 3, 1, 2))
