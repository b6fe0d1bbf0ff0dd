"""LPIPS perceptual distance (VGG16 backbone + learned linear heads).

Capability parity with the ``taming`` LPIPS used by the stage-2 VAE loss
(/root/reference/ldm/modules/losses/contperceptual.py:122): inputs in
[-1,1] are shift/scaled, VGG16 features are channel-normalized at
relu{1_2,2_2,3_3,4_3,5_3}, squared differences go through 1x1 'lin' heads,
and spatial means are summed over the five taps.

Weights (torchvision VGG16 + LPIPS lin heads) load through
``mgldvsr_tpu.io.ckpt_convert.convert_lpips``; random init is only useful
for tests.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

# taming/lpips normalization constants
_SHIFT = jnp.asarray([-0.030, -0.088, -0.188], dtype=jnp.float32)
_SCALE = jnp.asarray([0.458, 0.448, 0.450], dtype=jnp.float32)

_VGG_CFG = (
    (2, 64),   # conv1_1, conv1_2 -> relu1_2
    (2, 128),  # conv2_* -> relu2_2
    (3, 256),  # conv3_* -> relu3_3
    (3, 512),  # conv4_* -> relu4_3
    (3, 512),  # conv5_* -> relu5_3
)


class VGG16Features(nn.Module):
    """VGG16 feature extractor returning the five LPIPS tap activations."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Sequence[jnp.ndarray]:
        taps = []
        for stage, (n_convs, ch) in enumerate(_VGG_CFG):
            for i in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                            param_dtype=jnp.float32,
                            name=f"conv{stage + 1}_{i + 1}")(x)
                x = nn.relu(x)
            taps.append(x)
            if stage < len(_VGG_CFG) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


def _normalize_tensor(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS(nn.Module):
    """lpips(a, b) -> [N] perceptual distances. Inputs NHWC in [-1, 1]."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, a, b):
        vgg = VGG16Features(self.dtype, name="vgg")
        scale_in = lambda x: (x - _SHIFT) / _SCALE
        fa = vgg(scale_in(a))
        fb = vgg(scale_in(b))
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            d = (_normalize_tensor(xa) - _normalize_tensor(xb)) ** 2
            lin = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                          param_dtype=jnp.float32, name=f"lin{i}")
            total = total + jnp.mean(lin(d), axis=(1, 2, 3))
        return total
