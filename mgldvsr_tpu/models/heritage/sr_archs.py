"""Single-image SR backbones: RRDBNet, MSRResNet, SRVGG, RCAN-style CA,
and the RealESRGAN U-Net discriminator.

Capability parity (structure studied, rebuilt channels-last flax):
- RRDBNet (/root/reference/basicsr/archs/rrdbnet_arch.py): conv_first ->
  N RRDB blocks (each 3 residual dense blocks, 0.2 residual scaling) ->
  trunk conv -> 2x nearest+conv upsamples -> HR convs.
- MSRResNet (basicsr/archs/srresnet_arch.py): residual blocks without BN +
  pixel-shuffle upsampling + global bilinear skip.
- SRVGGNetCompact (basicsr/archs/srvgg_arch.py): plain conv+act body with a
  pixel-shuffle tail and nearest-neighbor residual.
- UNetDiscriminatorSN (basicsr/archs/discriminator_arch.py): U-Net
  discriminator with spectral norm (RealESRGAN).
- ChannelAttention/RCAB (basicsr/archs/rcan_arch.py).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from mgldvsr_tpu.models.vae import ResidualDenseBlock

Dtype = Any


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """[N,H,W,C*r^2] -> [N,H*r,W*r,C] with torch channel ordering (C-major),
    so converted torch weights produce identical outputs."""
    n, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(n, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(n, h * r, w * r, c)


def _conv(f, k=3, name=None, s=1):
    return nn.Conv(f, (k, k), strides=(s, s), padding=k // 2, name=name,
                   param_dtype=jnp.float32)


class RRDB(nn.Module):
    num_feat: int
    num_grow_ch: int = 32

    @nn.compact
    def __call__(self, x):
        h = x
        for i in range(3):
            h = ResidualDenseBlock(self.num_feat, self.num_grow_ch,
                                   name=f"rdb{i + 1}")(h)
        return x + 0.2 * h


class RRDBNet(nn.Module):
    """x4 (default) ESRGAN generator; scale in (1,2,4) via pre-unshuffle."""

    num_out_ch: int = 3
    scale: int = 4
    num_feat: int = 64
    num_block: int = 23
    num_grow_ch: int = 32

    @nn.compact
    def __call__(self, x):
        if self.scale == 2:
            x = jnp.concatenate(
                [x[:, i::2, j::2] for i in range(2) for j in range(2)], -1)
        elif self.scale == 1:
            x = jnp.concatenate(
                [x[:, i::4, j::4] for i in range(4) for j in range(4)], -1)
        feat = _conv(self.num_feat, name="conv_first")(x)
        body = feat
        for i in range(self.num_block):
            body = RRDB(self.num_feat, self.num_grow_ch, name=f"body_{i}")(body)
        feat = feat + _conv(self.num_feat, name="conv_body")(body)
        lrelu = lambda z: nn.leaky_relu(z, 0.2)
        up = lambda z: jnp.repeat(jnp.repeat(z, 2, 1), 2, 2)
        feat = lrelu(_conv(self.num_feat, name="conv_up1")(up(feat)))
        feat = lrelu(_conv(self.num_feat, name="conv_up2")(up(feat)))
        feat = lrelu(_conv(self.num_feat, name="conv_hr")(feat))
        return _conv(self.num_out_ch, name="conv_last")(feat)


class ResidualBlockNoBN(nn.Module):
    num_feat: int = 64
    res_scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        h = nn.relu(_conv(self.num_feat, name="conv1")(x))
        h = _conv(self.num_feat, name="conv2")(h)
        return x + h * self.res_scale


class MSRResNet(nn.Module):
    num_out_ch: int = 3
    num_feat: int = 64
    num_block: int = 16
    upscale: int = 4

    @nn.compact
    def __call__(self, x):
        lrelu = lambda z: nn.leaky_relu(z, 0.1)
        feat = lrelu(_conv(self.num_feat, name="conv_first")(x))
        body = feat
        for i in range(self.num_block):
            body = ResidualBlockNoBN(self.num_feat, name=f"body_{i}")(body)
        if self.upscale in (2, 3):
            body = pixel_shuffle(
                _conv(self.num_feat * self.upscale**2, name="upconv1")(body),
                self.upscale)
            body = lrelu(body)
        else:  # x4: two x2 shuffles
            body = lrelu(pixel_shuffle(
                _conv(self.num_feat * 4, name="upconv1")(body), 2))
            body = lrelu(pixel_shuffle(
                _conv(self.num_feat * 4, name="upconv2")(body), 2))
        body = lrelu(_conv(self.num_feat, name="conv_hr")(body))
        out = _conv(self.num_out_ch, name="conv_last")(body)
        n, h, w, c = x.shape
        from mgldvsr_tpu.ops.resize import resize2d

        base = resize2d(x, (h * self.upscale, w * self.upscale), "bilinear")
        return out + base


class SRVGGNetCompact(nn.Module):
    num_out_ch: int = 3
    num_feat: int = 64
    num_conv: int = 16
    upscale: int = 4
    act_type: str = "prelu"

    @nn.compact
    def __call__(self, x):
        def act(z, name):
            if self.act_type == "prelu":
                a = self.param(f"{name}_alpha", nn.initializers.constant(0.25),
                               (z.shape[-1],))
                return jnp.where(z >= 0, z, a * z)
            return nn.leaky_relu(z, 0.1)

        h = act(_conv(self.num_feat, name="conv_first")(x), "act0")
        for i in range(self.num_conv):
            h = act(_conv(self.num_feat, name=f"body_{i}")(h), f"act{i + 1}")
        h = pixel_shuffle(
            _conv(self.num_out_ch * self.upscale**2, name="conv_last")(h),
            self.upscale)
        base = jnp.repeat(jnp.repeat(x, self.upscale, 1), self.upscale, 2)
        return h + base


class ChannelAttention(nn.Module):
    num_feat: int
    squeeze_factor: int = 16

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = nn.relu(nn.Conv(self.num_feat // self.squeeze_factor, (1, 1),
                            name="down")(y))
        y = jax.nn.sigmoid(nn.Conv(self.num_feat, (1, 1), name="up")(y))
        return x * y


class RCAB(nn.Module):
    """Residual channel-attention block (RCAN)."""

    num_feat: int
    squeeze_factor: int = 16
    res_scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        h = nn.relu(_conv(self.num_feat, name="conv1")(x))
        h = _conv(self.num_feat, name="conv2")(h)
        h = ChannelAttention(self.num_feat, self.squeeze_factor, name="ca")(h)
        return x + h * self.res_scale


def _l2_normalize(v, eps=1e-12):
    return v / (jnp.linalg.norm(v) + eps)


class SpectralConv(nn.Module):
    """Conv with 1-step power-iteration spectral normalization (inference
    uses the stored u vector; training updates it via mutable collection)."""

    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, update_sv: bool = False):
        cin = x.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.kernel, self.kernel, cin, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        u = self.variable("spectral", "u",
                          lambda: jax.random.normal(
                              jax.random.PRNGKey(0), (self.features,)))
        wm = w.reshape(-1, self.features)
        v = _l2_normalize(wm @ u.value)
        u_new = _l2_normalize(wm.T @ v)
        sigma = v @ wm @ u_new
        if update_sv and not self.is_initializing():
            u.value = u_new
        wn = w / sigma
        pad = (self.kernel - 1) // 2  # torch conv(k=4,s=2,p=1) semantics
        return jax.lax.conv_general_dilated(
            x, wn.astype(x.dtype), (self.stride, self.stride),
            [(pad, pad)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b


class UNetDiscriminatorSN(nn.Module):
    """RealESRGAN U-Net discriminator with spectral norm and skip adds."""

    num_feat: int = 64

    @nn.compact
    def __call__(self, x, *, update_sv: bool = False):
        lrelu = lambda z: nn.leaky_relu(z, 0.2)
        sc = lambda f, k, s, name: SpectralConv(f, k, s, name=name)
        up = lambda z: jax.image.resize(
            z, (z.shape[0], z.shape[1] * 2, z.shape[2] * 2, z.shape[3]),
            "bilinear")

        x0 = lrelu(nn.Conv(self.num_feat, (3, 3), padding=1, name="conv0")(x))
        x1 = lrelu(sc(self.num_feat * 2, 4, 2, "conv1")(x0, update_sv=update_sv))
        x2 = lrelu(sc(self.num_feat * 4, 4, 2, "conv2")(x1, update_sv=update_sv))
        x3 = lrelu(sc(self.num_feat * 8, 4, 2, "conv3")(x2, update_sv=update_sv))
        y = lrelu(sc(self.num_feat * 4, 3, 1, "conv4")(up(x3), update_sv=update_sv)) + x2
        y = lrelu(sc(self.num_feat * 2, 3, 1, "conv5")(up(y), update_sv=update_sv)) + x1
        y = lrelu(sc(self.num_feat, 3, 1, "conv6")(up(y), update_sv=update_sv)) + x0
        y = lrelu(sc(self.num_feat, 3, 1, "conv7")(y, update_sv=update_sv))
        y = lrelu(sc(self.num_feat, 3, 1, "conv8")(y, update_sv=update_sv))
        return nn.Conv(1, (3, 3), padding=1, name="conv9")(y)
