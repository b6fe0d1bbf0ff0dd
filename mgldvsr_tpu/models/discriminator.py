"""PatchGAN discriminator (the taming NLayerDiscriminator used by the
stage-2 VAE GAN loss, /root/reference/ldm/modules/losses/contperceptual.py:132).

Structure: Conv(3->64, k4 s2) LeakyReLU(0.2); n_layers of
Conv(k4 s2/s1) + BatchNorm + LeakyReLU with channel doubling (cap 8x);
final Conv(->1, k4 s1). BatchNorm carries batch statistics — train with
``mutable=['batch_stats']``.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class NLayerDiscriminator(nn.Module):
    ndf: int = 64
    n_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        lrelu = lambda z: nn.leaky_relu(z, negative_slope=0.2)
        kw = (4, 4)
        x = nn.Conv(self.ndf, kw, strides=(2, 2), padding=1,
                    param_dtype=jnp.float32, dtype=self.dtype, name="conv0")(x)
        x = lrelu(x)
        mult = 1
        for n in range(1, self.n_layers + 1):
            mult = min(2**n, 8)
            stride = 2 if n < self.n_layers else 1
            x = nn.Conv(self.ndf * mult, kw, strides=(stride, stride),
                        padding=1, use_bias=False, param_dtype=jnp.float32,
                        dtype=self.dtype, name=f"conv{n}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             param_dtype=jnp.float32, name=f"bn{n}")(x)
            x = lrelu(x)
        return nn.Conv(1, kw, strides=(1, 1), padding=1,
                       param_dtype=jnp.float32, dtype=self.dtype,
                       name="conv_out")(x)
