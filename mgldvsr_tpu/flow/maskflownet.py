"""MaskFlownet_S: PWC-style coarse-to-fine flow with learned occlusion masks.

Capability parity (structure studied, rebuilt TPU-first / NHWC / flax):
/root/reference/basicsr/archs/maskflownet_arch.py:91-440 — the commented-out
alternate flownet of the MGLD configs. The reference needs two external CUDA
ops; here both are XLA-native:

- ``mmcv.ops.Correlation`` (kernel 1, max_displacement 4) becomes
  :func:`local_correlation` — 81 shifted elementwise products reduced over
  channels, fully fusable by XLA (no scatter/gather).
- ``torchvision.ops.DeformConv2d`` with the flow replicated across all nine
  taps (maskflownet_arch.py:308-312) becomes our gather-based
  :func:`mgldvsr_tpu.ops.dcn.modulated_deform_conv2d` with ``mask=None``
  (plain DCNv1 semantics).

Conventions: feature maps are NHWC; *internal* flows keep the reference's
(y, x) channel order so they can feed the deformable offsets directly; the
public ``__call__`` returns the usual (x, y) flow at input resolution, scaled
like the reference's ``flow.flip(1) * scale`` output (maskflownet_arch.py:395,
434-438).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mgldvsr_tpu.ops.dcn import modulated_deform_conv2d
from mgldvsr_tpu.ops.resize import resize2d

Dtype = Any


# ---------------------------------------------------------------------------
# Pure helpers (triangle-kernel resampling, local correlation)
# ---------------------------------------------------------------------------


def _triangle_up_kernel(w: int) -> np.ndarray:
    c = w // 2
    k = 1.0 - np.abs(c - np.arange(w, dtype=np.float32)) / (c + 1)
    return np.outer(k, k)


def _triangle_down_kernel(w: int) -> np.ndarray:
    k = ((w + 1) - np.abs(w - np.arange(w * 2 + 1, dtype=np.float32))) / (2 * w + 1)
    return np.outer(k, k)


def upsample2d(img: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Triangle-kernel (bilinear-like) upsample of NHWC by ``factor``
    (maskflownet_arch.py:64-74: replicate-pad, transposed conv, crop)."""
    if factor == 1:
        return img
    n, h, w, c = img.shape
    x = img.transpose(0, 3, 1, 2).reshape(n * c, h, w, 1)
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)), mode="edge")
    kw = factor * 2 - 1
    kern = jnp.asarray(_triangle_up_kernel(kw))[:, :, None, None]
    y = jax.lax.conv_transpose(
        x, kern, strides=(factor, factor),
        padding=((factor - 1, factor - 1), (factor - 1, factor - 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y[:, :-1, :-1, :]
    hu, wu = y.shape[1], y.shape[2]
    return y.reshape(n, c, hu, wu).transpose(0, 2, 3, 1)


def downsample2d(img: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Normalized triangle-kernel downsample of NHWC by ``factor``
    (maskflownet_arch.py:77-88)."""
    if factor == 1:
        return img
    n, h, w, c = img.shape
    x = img.transpose(0, 3, 1, 2).reshape(n * c, h, w, 1)
    kern = jnp.asarray(_triangle_down_kernel(factor // 2))[:, :, None, None]
    pad = factor // 2
    dn = ("NHWC", "HWIO", "NHWC")
    y = jax.lax.conv_general_dilated(
        x, kern, window_strides=(factor, factor),
        padding=((pad, pad), (pad, pad)), dimension_numbers=dn)
    ones = jnp.ones_like(x)
    nom = jax.lax.conv_general_dilated(
        ones, kern, window_strides=(factor, factor),
        padding=((pad, pad), (pad, pad)), dimension_numbers=dn)
    y = y / nom
    hd, wd = y.shape[1], y.shape[2]
    return y.reshape(n, c, hd, wd).transpose(0, 2, 3, 1)


def local_correlation(f1: jnp.ndarray, f2: jnp.ndarray, md: int = 4) -> jnp.ndarray:
    """Cost volume over a (2md+1)^2 displacement window, mean over channels.

    corr[..., k] = mean_c f1[y, x, c] * f2[y+dy, x+dx, c] with
    k = (dy+md)*(2md+1) + (dx+md); out-of-bounds samples are zero. Matches
    mmcv Correlation(kernel_size=1, max_displacement=md) followed by the
    reference's /C normalization (maskflownet_arch.py:230-234). Built from
    shifted slices + reductions — no gather, fully XLA-fusable.
    """
    n, h, w, c = f1.shape
    side = 2 * md + 1
    f2p = jnp.pad(f2, ((0, 0), (md, md), (md, md), (0, 0)))
    outs = []
    for dy in range(-md, md + 1):
        for dx in range(-md, md + 1):
            sl = jax.lax.dynamic_slice(
                f2p, (0, dy + md, dx + md, 0), (n, h, w, c))
            outs.append(jnp.mean(f1 * sl, axis=-1))
    return jnp.stack(outs, axis=-1)


def centralize(img1: jnp.ndarray, img2: jnp.ndarray):
    """Subtract the joint per-sample RGB mean (maskflownet_arch.py:16-20)."""
    mean = jnp.concatenate([img1, img2], axis=1).mean(axis=(1, 2), keepdims=True)
    return img1 - mean, img2 - mean, mean


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------


def _lrelu(x):
    return nn.leaky_relu(x, 0.1)


class _Conv(nn.Module):
    features: int
    stride: int = 1
    dilation: int = 1
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dilation
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=d, kernel_dilation=(d, d), dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(x)
        return _lrelu(y) if self.act else y


class _Deconv(nn.Module):
    """Learned 2x upsampling (torch ConvTranspose2d k4 s2 p1 counterpart;
    flax 'SAME' transpose padding yields the same exact-2x output size)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(
            self.features, (4, 4), strides=(2, 2), padding="SAME",
            dtype=self.dtype, param_dtype=jnp.float32, name="deconv")(x)


class _DeformBlend(nn.Module):
    """DeformConv2d(c, c) whose nine taps all share the flow offset."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, flow_yx):
        n, h, w, _ = feat.shape
        weight = self.param(
            "weight", nn.initializers.kaiming_normal(),
            (3, 3, feat.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        offset = jnp.tile(flow_yx, (1, 1, 1, 9))  # [k,(y,x)] x 9 taps
        return modulated_deform_conv2d(
            feat.astype(self.dtype), offset.astype(self.dtype), None,
            weight, bias)


class _DenseHead(nn.Module):
    """The dense conv stack conv*_0..4 with concat (DenseNet) connections."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, ch in enumerate((128, 128, 96, 64, 32)):
            x = jnp.concatenate(
                [_Conv(ch, dtype=self.dtype, name=f"conv_{i}")(x), x], axis=-1)
        return x


@dataclasses.dataclass(frozen=True)
class MaskFlownetConfig:
    md: int = 4
    scale: float = 20.0
    strides: Sequence[int] = (64, 32, 16, 8, 4)
    upfeat_ch: int = 16
    dtype: Any = jnp.float32


class MaskFlownetS(nn.Module):
    """forward(ref, sup) -> flow [N, H, W, 2] in (x, y) order, pixel units."""

    cfg: MaskFlownetConfig = MaskFlownetConfig()

    @nn.compact
    def __call__(self, ref: jnp.ndarray, sup: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        dt = cfg.dtype
        ref, sup, _ = centralize(ref, sup)
        h, w = ref.shape[1], ref.shape[2]
        h64 = -(-h // 64) * 64
        w64 = -(-w // 64) * 64
        ref = resize2d(ref, (h64, w64), method="bilinear")
        sup = resize2d(sup, (h64, w64), method="bilinear")

        flow2_yx = self._process(ref.astype(dt), sup.astype(dt))

        flow = upsample2d(flow2_yx, 4)
        flow = resize2d(flow, (h, w), method="bilinear")
        fy = flow[..., 0] * (float(h) / float(h64))
        fx = flow[..., 1] * (float(w) / float(w64))
        return jnp.stack([fx, fy], axis=-1).astype(jnp.float32) * cfg.scale

    def _pyramid(self, img, chans=(16, 32, 64, 96, 128, 196)):
        feats = []
        x = img
        for lvl, ch in enumerate(chans):
            x = _Conv(ch, stride=2, dtype=self.cfg.dtype, name=f"enc{lvl}a")(x)
            x = _Conv(ch, dtype=self.cfg.dtype, name=f"enc{lvl}b")(x)
            x = _Conv(ch, dtype=self.cfg.dtype, name=f"enc{lvl}c")(x)
            feats.append(x)
        return feats

    def _process(self, im1, im2):
        """Coarse-to-fine decode; returns the finest internal flow (level 2,
        1/4 resolution) in (y, x) channel order."""
        cfg = self.cfg
        dt = cfg.dtype
        md = cfg.md

        # Shared-weight twin pyramids: run both frames through one stack as a
        # doubled batch (weight sharing by construction, 2x MXU batch).
        both = self._pyramid(jnp.concatenate([im1, im2], axis=0))
        n = im1.shape[0]
        c1 = [f[:n] for f in both]
        c2 = [f[n:] for f in both]
        # indices: c1[0]=1/2 res (16ch) ... c1[5]=1/64 res (196ch)

        # level 6 (coarsest)
        corr6 = _lrelu(local_correlation(c1[5], c2[5], md))
        x = _DenseHead(dt, name="head6")(corr6)
        flow = nn.Conv(2, (3, 3), padding=1, dtype=dt, param_dtype=jnp.float32,
                       name="pred_flow6")(x)
        mask = nn.Conv(1, (3, 3), padding=1, dtype=dt, param_dtype=jnp.float32,
                       name="pred_mask6")(x)

        # levels 5..2 share the same refinement recipe
        lvl_feat_ch = {4: 128, 3: 96, 2: 64, 1: 32}
        for step, lvl in enumerate((4, 3, 2, 1)):  # pyramid indices (1/32..1/4)
            stride = cfg.strides[step + 1]
            feat = _lrelu(_Deconv(cfg.upfeat_ch, dt,
                                  name=f"upfeat{lvl}")(x))
            flow = upsample2d(flow, 2)
            mask = upsample2d(mask, 2)
            warped = _DeformBlend(lvl_feat_ch[lvl], dt, name=f"deform{lvl}")(
                c2[lvl], flow * (cfg.scale / stride))
            tradeoff = nn.Conv(lvl_feat_ch[lvl], (3, 3), padding=1, dtype=dt,
                               param_dtype=jnp.float32,
                               name=f"convf{lvl}")(feat)
            warped = _lrelu(warped * jax.nn.sigmoid(mask) + tradeoff)
            corr = _lrelu(local_correlation(c1[lvl], warped, md))
            x = jnp.concatenate([corr, c1[lvl], feat, flow], axis=-1)
            x = _DenseHead(dt, name=f"head{lvl}")(x)
            flow = flow + nn.Conv(2, (3, 3), padding=1, dtype=dt,
                                  param_dtype=jnp.float32,
                                  name=f"pred_flow{lvl}")(x)
            if lvl != 1:
                mask = nn.Conv(1, (3, 3), padding=1, dtype=dt,
                               param_dtype=jnp.float32,
                               name=f"pred_mask{lvl}")(x)

        # dilated context network refines the finest flow
        y = x
        for i, (ch, dil) in enumerate(
                ((128, 1), (128, 2), (128, 4), (96, 8), (64, 16), (32, 1))):
            y = _Conv(ch, dilation=dil, dtype=dt, name=f"dc{i}")(y)
        flow = flow + nn.Conv(2, (3, 3), padding=1, dtype=dt,
                              param_dtype=jnp.float32, name="dc_flow")(y)
        return flow
