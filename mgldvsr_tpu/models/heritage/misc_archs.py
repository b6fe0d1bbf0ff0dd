"""Remaining BasicSR-heritage architectures: RCAN, TOF, DUF, ECBSR, RIDNet.

Capability parity (structure studied, rebuilt channels-last flax):
- RCAN (basicsr/archs/rcan_arch.py): residual groups of RCAB channel-
  attention blocks + pixel-shuffle upsampler.
- TOFlow (basicsr/archs/tof_arch.py): SpyNet-style flow + warp + fusion
  for 7-frame interpolation-free VSR.
- DUF (basicsr/archs/duf_arch.py): dynamic upsampling filters — 3D conv
  trunk predicting per-pixel 5x5 filters + residual; the filter apply is
  an einsum (MXU) instead of a gather.
- ECBSR (basicsr/archs/ecbsr_arch.py): edge-oriented conv block (training
  multi-branch, deploy-time collapsible) — implemented in deploy form.
- RIDNet (basicsr/archs/ridnet_arch.py): feature attention denoiser (EAM
  blocks), compact form.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mgldvsr_tpu.models.heritage.sr_archs import (
    RCAB,
    ResidualBlockNoBN,
    pixel_shuffle,
)
from mgldvsr_tpu.ops.resize import resize2d
from mgldvsr_tpu.ops.warp import flow_warp


def _conv(f, k=3, name=None, s=1, dilation=1):
    return nn.Conv(f, (k, k), strides=(s, s), padding=(k // 2) * dilation,
                   kernel_dilation=(dilation, dilation), name=name,
                   param_dtype=jnp.float32)


class ResidualGroup(nn.Module):
    num_feat: int
    num_block: int
    squeeze_factor: int = 16

    @nn.compact
    def __call__(self, x):
        h = x
        for i in range(self.num_block):
            h = RCAB(self.num_feat, self.squeeze_factor, name=f"rcab_{i}")(h)
        h = _conv(self.num_feat, name="conv")(h)
        return x + h


class RCAN(nn.Module):
    num_out_ch: int = 3
    num_feat: int = 64
    num_group: int = 10
    num_block: int = 16
    squeeze_factor: int = 16
    upscale: int = 4
    img_range: float = 255.0

    @nn.compact
    def __call__(self, x):
        mean = jnp.asarray([0.4488, 0.4371, 0.4040])
        x = (x - mean) * self.img_range
        feat = _conv(self.num_feat, name="conv_first")(x)
        body = feat
        for g in range(self.num_group):
            body = ResidualGroup(self.num_feat, self.num_block,
                                 self.squeeze_factor, name=f"group_{g}")(body)
        feat = feat + _conv(self.num_feat, name="conv_after_body")(body)
        up = self.upscale
        while up > 1:
            r = 3 if up % 3 == 0 else 2
            feat = pixel_shuffle(
                _conv(self.num_feat * r * r, name=f"up_x{up}")(feat), r)
            up //= r
        out = _conv(self.num_out_ch, name="conv_last")(feat)
        return out / self.img_range + mean


class _FrozenBN(nn.Module):
    """Inference BatchNorm folded to scale/shift (works on any rank:
    normalizes the trailing channel axis)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return x * inv + (bias - mean * inv)


class TOFBasicModule(nn.Module):
    """SPyNetTOF level module (tof_arch.py:9-39): 4x (7x7 conv bias-free +
    BN + relu) + a final biased 7x7 conv to 2 flow channels."""

    @nn.compact
    def __call__(self, x):  # [B,H,W,8]
        chans = (32, 64, 32, 16)
        for i, ch in enumerate(chans):
            x = nn.Conv(ch, (7, 7), padding=3, use_bias=False,
                        name=f"conv{i}", param_dtype=jnp.float32)(x)
            x = nn.relu(_FrozenBN(ch, name=f"bn{i}")(x))
        return _conv(2, 7, name="conv4")(x)


class SPyNetTOF(nn.Module):
    """4-level coarse-to-fine flow (tof_arch.py:42-93); inputs already
    normalized by TOFlow."""

    @nn.compact
    def __call__(self, ref, supp):  # [B,H,W,3] x2 -> flow [B,H,W,2]
        b, h, w, _ = ref.shape
        refs, supps = [ref], [supp]
        for _ in range(3):
            refs.insert(0, nn.avg_pool(refs[0], (2, 2), (2, 2)))
            supps.insert(0, nn.avg_pool(supps[0], (2, 2), (2, 2)))
        flow = jnp.zeros((b, h // 16, w // 16, 2), ref.dtype)
        for i in range(4):
            hh, ww = refs[i].shape[1:3]
            flow_up = 2.0 * resize2d(flow, (hh, ww), "bilinear",
                                     align_corners=True)
            inp = jnp.concatenate(
                [refs[i], flow_warp(supps[i], flow_up), flow_up], -1)
            flow = flow_up + TOFBasicModule(name=f"basic_module_{i}")(inp)
        return flow


IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class TOFlow(nn.Module):
    """TOFlow (tof_arch.py:96-172): normalize, SPyNetTOF-align the 6
    neighbors to the reference frame, 7-frame concat reconstruction.
    ``adapt_official_weights`` selects reference index 0 (official) or 3."""

    adapt_official_weights: bool = False

    @nn.compact
    def __call__(self, lrs):  # [B,7,H,W,3]
        ref_idx = 0 if self.adapt_official_weights else 3
        if self.adapt_official_weights:
            lrs = lrs[:, jnp.asarray([3, 0, 1, 2, 4, 5, 6])]
        mean = jnp.asarray(IMAGENET_MEAN, lrs.dtype)
        std = jnp.asarray(IMAGENET_STD, lrs.dtype)
        lrs = (lrs - mean) / std
        spynet = SPyNetTOF(name="spynet")
        lr_ref = lrs[:, ref_idx]
        aligned = []
        for i in range(7):
            if i == ref_idx:
                aligned.append(lr_ref)
            else:
                flow = spynet(lr_ref, lrs[:, i])
                aligned.append(flow_warp(lrs[:, i], flow))
        hr = jnp.concatenate(aligned, axis=-1)
        hr = nn.relu(_conv(64, 9, name="conv_1")(hr))
        hr = nn.relu(_conv(64, 9, name="conv_2")(hr))
        hr = nn.relu(_conv(64, 1, name="conv_3")(hr))
        hr = _conv(3, 1, name="conv_4")(hr) + lr_ref
        return hr * std + mean


class _DUFDenseUnit(nn.Module):
    """BN-relu-conv1x1x1-BN-relu-conv3x3x3 (duf_arch.py DenseBlocks entry);
    ``t_pad`` pads time by 1 (DenseBlocks) or crops (TemporalReduce)."""

    mid: int
    grow: int
    t_pad: bool

    @nn.compact
    def __call__(self, x):  # [B,T,H,W,C]
        y = nn.relu(_FrozenBN(x.shape[-1], name="bn0")(x))
        y = nn.Conv(self.mid, (1, 1, 1), name="conv0",
                    param_dtype=jnp.float32)(y)
        y = nn.relu(_FrozenBN(self.mid, name="bn1")(y))
        pad_t = (1, 1) if self.t_pad else (0, 0)
        y = nn.Conv(self.grow, (3, 3, 3),
                    padding=(pad_t, (1, 1), (1, 1)), name="conv1",
                    param_dtype=jnp.float32)(y)
        return y


class DUF(nn.Module):
    """DUF (duf_arch.py:181-276): 3-D dense trunk over 7 frames, per-pixel
    dynamic 5x5 upsampling filters applied to the center frame + residual,
    pixel-shuffle to x``scale``. num_layer in {16, 28, 52}."""

    scale: int = 4
    num_layer: int = 52

    @nn.compact
    def __call__(self, x):  # [B,7,H,W,3]
        b, t, h, w, _ = x.shape
        num_block, grow = {16: (3, 32), 28: (9, 16), 52: (21, 16)}[
            self.num_layer]
        x_center = x[:, t // 2]

        feat = nn.Conv(64, (1, 3, 3), padding=((0, 0), (1, 1), (1, 1)),
                       name="conv3d1", param_dtype=jnp.float32)(x)
        ch = 64
        for i in range(num_block):  # DenseBlocks: T stays 7
            y = _DUFDenseUnit(ch, grow, True, name=f"dense_{i}")(feat)
            feat = jnp.concatenate([feat, y], axis=-1)
            ch += grow
        for i in range(3):  # DenseBlocksTemporalReduce: T -= 2 each
            y = _DUFDenseUnit(ch, grow, False, name=f"reduce_{i}")(feat)
            feat = jnp.concatenate([feat[:, 1:-1], y], axis=-1)
            ch += grow
        feat = nn.relu(_FrozenBN(ch, name="bn3d2")(feat))
        feat = nn.relu(nn.Conv(256, (1, 3, 3),
                               padding=((0, 0), (1, 1), (1, 1)),
                               name="conv3d2", param_dtype=jnp.float32)(feat))

        res = nn.Conv(256, (1, 1, 1), name="conv3d_r1",
                      param_dtype=jnp.float32)(feat)
        res = nn.Conv(3 * self.scale ** 2, (1, 1, 1), name="conv3d_r2",
                      param_dtype=jnp.float32)(nn.relu(res))

        filt = nn.Conv(512, (1, 1, 1), name="conv3d_f1",
                       param_dtype=jnp.float32)(feat)
        filt = nn.Conv(25 * self.scale ** 2, (1, 1, 1), name="conv3d_f2",
                       param_dtype=jnp.float32)(nn.relu(filt))
        # [B,1,H,W, 25*s2] -> softmax over the 25 taps
        filt = jax.nn.softmax(
            filt.reshape(b, h, w, 25, self.scale ** 2), axis=3)

        # dynamic filter: unfold 5x5 neighborhoods of the center frame
        cp = jnp.pad(x_center, ((0, 0), (2, 2), (2, 2), (0, 0)))
        patches = jnp.stack(
            [cp[:, dy:dy + h, dx:dx + w, :] for dy in range(5)
             for dx in range(5)], axis=-1)  # [B,H,W,3,25]
        out = jnp.einsum("bhwck,bhwkr->bhwcr", patches, filt)
        # torch layout: channels (3, upsampling_square) c-major
        out = out.reshape(b, h, w, 3 * self.scale ** 2)
        out = out + res[:, 0]
        return pixel_shuffle(out, self.scale)


class ECB(nn.Module):
    """Edge-oriented conv block, deploy (collapsed) form: a single 3x3 conv
    + PReLU (training-time multi-branch reparam collapses to this)."""

    num_feat: int

    @nn.compact
    def __call__(self, x):
        h = _conv(self.num_feat, name="conv")(x)
        a = self.param("prelu_alpha", nn.initializers.constant(0.25),
                       (self.num_feat,))
        return jnp.where(h >= 0, h, a * h)


class ECBSR(nn.Module):
    num_out_ch: int = 3
    num_feat: int = 32
    num_block: int = 4
    upscale: int = 4

    @nn.compact
    def __call__(self, x):
        h = ECB(self.num_feat, name="ecb_in")(x)
        for i in range(self.num_block):
            h = ECB(self.num_feat, name=f"ecb_{i}")(h)
        h = _conv(self.num_out_ch * self.upscale**2, name="conv_out")(h)
        out = pixel_shuffle(h, self.upscale)
        base = jnp.repeat(jnp.repeat(x, self.upscale, 1), self.upscale, 2)
        return out + base


class EAM(nn.Module):
    """Enhancement attention module (ridnet_arch.py:106-140): merge-and-run
    (dilations 1,2 | 3,4), ResidualBlockNoBN (+relu), enhanced residual
    block, channel attention."""

    num_feat: int
    squeeze_factor: int = 16

    @nn.compact
    def __call__(self, x):
        nf = self.num_feat
        # MergeRun
        b1 = nn.relu(_conv(nf, name="mr_d1_conv1")(x))
        b1 = nn.relu(_conv(nf, dilation=2, name="mr_d1_conv2")(b1))
        b2 = nn.relu(_conv(nf, dilation=3, name="mr_d2_conv1")(x))
        b2 = nn.relu(_conv(nf, dilation=4, name="mr_d2_conv2")(b2))
        h = nn.relu(_conv(nf, name="mr_agg")(
            jnp.concatenate([b1, b2], -1))) + x
        # ResidualBlockNoBN, then the paper's post-add relu
        h = nn.relu(ResidualBlockNoBN(nf, name="block1")(h))
        # EResidualBlockNoBN
        e = nn.relu(_conv(nf, name="er_conv1")(h))
        e = nn.relu(_conv(nf, name="er_conv2")(e))
        e = _conv(nf, 1, name="er_conv3")(e)
        h = nn.relu(e + h)
        # channel attention
        y = jnp.mean(h, axis=(1, 2), keepdims=True)
        y = nn.relu(nn.Conv(nf // self.squeeze_factor, (1, 1),
                            name="ca_down", param_dtype=jnp.float32)(y))
        y = jax.nn.sigmoid(nn.Conv(nf, (1, 1), name="ca_up",
                                   param_dtype=jnp.float32)(y))
        return h * y


class RIDNet(nn.Module):
    """RIDNet (ridnet_arch.py:140-185): MeanShift in/out around head ->
    EAM chain -> tail, global residual."""

    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_block: int = 4
    img_range: float = 255.0
    rgb_mean: Sequence[float] = (0.4488, 0.4371, 0.4040)
    rgb_std: Sequence[float] = (1.0, 1.0, 1.0)

    @nn.compact
    def __call__(self, x):
        mean = jnp.asarray(self.rgb_mean, x.dtype)
        std = jnp.asarray(self.rgb_std, x.dtype)
        res = (x - self.img_range * mean) / std
        res = nn.relu(_conv(self.num_feat, name="head")(res))
        for i in range(self.num_block):
            res = EAM(self.num_feat, name=f"eam_{i}")(res)
        res = _conv(self.num_out_ch, name="tail")(res)
        # MeanShift(sign=+1) is also a 1x1 conv with eye(3)/std weights:
        # it divides by std rather than multiplying (ridnet_arch.py:8-28)
        res = res / std + self.img_range * mean / std
        return x + res


class DEResNet(nn.Module):
    """Degradation estimator (basicsr/archs/degradat_arch.py:7-90): one
    independent ResNetNoBN branch per estimated degradation (default 2:
    blur + noise), each ending in global average pool + a 512-hidden MLP
    with sigmoid/tanh degree head. Returns a list of [B] degree tensors."""

    num_in_ch: int = 3
    num_degradation: int = 2
    degree_actv: str = "sigmoid"
    num_feats: Sequence[int] = (64, 128, 256, 512)
    num_blocks: Sequence[int] = (2, 2, 2, 2)
    downscales: Sequence[int] = (2, 2, 2, 1)

    @nn.compact
    def __call__(self, x):
        assert len(self.num_feats) == len(self.num_blocks) == len(
            self.downscales)
        n_stage = len(self.num_feats)
        degrees = []
        for d in range(self.num_degradation):
            h = _conv(self.num_feats[0], name=f"first_{d}")(x)
            for stage in range(n_stage):
                for b in range(self.num_blocks[stage]):
                    h = ResidualBlockNoBN(
                        self.num_feats[stage], name=f"body_{d}_{stage}_{b}")(h)
                if self.downscales[stage] == 2:
                    nxt = self.num_feats[min(stage + 1, n_stage - 1)]
                    h = _conv(nxt, s=2, name=f"down_{d}_{stage}")(h)
                elif (stage < n_stage - 1
                      and self.num_feats[stage] != self.num_feats[stage + 1]):
                    h = _conv(self.num_feats[stage + 1],
                              name=f"down_{d}_{stage}")(h)
            feat = jnp.mean(h, axis=(1, 2))
            y = nn.Dense(512, name=f"fc1_{d}")(feat)
            y = nn.Dense(1, name=f"fc2_{d}")(nn.relu(y))
            y = (jnp.tanh(y) if self.degree_actv == "tanh"
                 else jax.nn.sigmoid(y))
            degrees.append(y[:, 0])
        return degrees
