"""SPADE spatially-adaptive normalization driven by struct-cond features.

Capability parity: /root/reference/ldm/modules/spade.py:68-111. The
struct-cond encoder emits a dict of feature maps keyed by spatial size; each
ResBlockDual picks the feature matching its own resolution and modulates its
normalized activations with per-pixel gamma/beta.

TPU note: the reference's parameter-free norm is GroupNorm(32) (its
``normalization``); gamma/beta come from two 3x3 convs over a shared ReLU
feature. Everything fuses under XLA.
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from mgldvsr_tpu.models.layers import conv3x3, group_norm

Dtype = Any


class SPADE(nn.Module):
    norm_channels: int
    hidden: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, segmap_dict: Dict[str, jnp.ndarray]):
        segmap = segmap_dict[str(x.shape[-2])]  # keyed by spatial width
        normalized = group_norm(dtype=self.dtype)(x)
        actv = conv3x3(self.hidden, self.dtype, name="mlp_shared")(segmap)
        actv = nn.relu(actv)
        gamma = conv3x3(self.norm_channels, self.dtype, name="mlp_gamma")(actv)
        beta = conv3x3(self.norm_channels, self.dtype, name="mlp_beta")(actv)
        return normalized * (1 + gamma) + beta
