"""SpyNet coarse-to-fine optical flow (used by the stage-2 video-VAE
training loss).

Capability parity: /root/reference/basicsr/archs/spynet_arch.py:10-103 —
6 levels of a 5-conv (7x7) module over [ref, warp(supp, up_flow), up_flow],
ImageNet-normalised inputs, bilinear /32 pre-resize with flow rescaling.

TPU-first: channels-last; the pyramid and level loop unroll statically at
trace time; warping reuses the shared gather-based ``flow_warp``.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from mgldvsr_tpu.ops.resize import resize2d
from mgldvsr_tpu.ops.warp import flow_warp

_MEAN = jnp.asarray([0.485, 0.456, 0.406], dtype=jnp.float32)
_STD = jnp.asarray([0.229, 0.224, 0.225], dtype=jnp.float32)


class BasicModule(nn.Module):
    """conv(8->32)->ReLU->...->conv(16->2), all 7x7."""

    @nn.compact
    def __call__(self, x):
        for i, ch in enumerate([32, 64, 32, 16]):
            x = nn.relu(
                nn.Conv(ch, (7, 7), padding=3, name=f"conv{i}",
                        param_dtype=jnp.float32)(x)
            )
        return nn.Conv(2, (7, 7), padding=3, name="conv4",
                       param_dtype=jnp.float32)(x)


class SpyNet(nn.Module):
    """ref, supp: [N, H, W, 3] in [0, 1]. Returns flow [N, H, W, 2]."""

    levels: int = 6

    @nn.compact
    def __call__(self, ref, supp):
        n, h, w, _ = ref.shape
        # bilinear pre-resize to /32 multiples (align_corners=False)
        h32 = -(-h // 32) * 32
        w32 = -(-w // 32) * 32
        ref_r = resize2d(ref, (h32, w32), method="bilinear")
        supp_r = resize2d(supp, (h32, w32), method="bilinear")

        ref_pyr = [(ref_r - _MEAN) / _STD]
        supp_pyr = [(supp_r - _MEAN) / _STD]
        for _ in range(self.levels - 1):
            ref_pyr.insert(0, nn.avg_pool(ref_pyr[0], (2, 2), strides=(2, 2)))
            supp_pyr.insert(0, nn.avg_pool(supp_pyr[0], (2, 2), strides=(2, 2)))

        h0, w0 = ref_pyr[0].shape[1:3]
        # clamp to >=1 so tiny (test-size) inputs don't produce a 0-size init
        flow = jnp.zeros((n, max(h0 // 2, 1), max(w0 // 2, 1), 2),
                         dtype=jnp.float32)
        for level in range(self.levels):
            hl, wl = ref_pyr[level].shape[1:3]
            up = 2.0 * resize2d(flow, (hl, wl), method="bilinear",
                                align_corners=True)
            warped = flow_warp(supp_pyr[level], up, padding_mode="border")
            inp = jnp.concatenate([ref_pyr[level], warped, up], axis=-1)
            flow = BasicModule(name=f"basic_module{level}")(inp) + up

        flow = resize2d(flow, (h, w), method="bilinear")
        scale = jnp.asarray([w / w32, h / h32], dtype=jnp.float32)
        return flow * scale
