"""StyleGAN2 generator/discriminator on the TPU-native resample ops.

Structure-exact rebuild of basicsr's StyleGAN2
(/root/reference/basicsr/archs/stylegan2_arch.py, 799 LoC): equalized-lr
linears/convs, modulated+demodulated styled convs (the upsample branch is
the reference's grouped conv_transpose + FIR smooth, not a pre-upsample),
noise injection, ToRGB skip pyramid, and the residual discriminator with
grouped minibatch-stddev. The reference's CUDA ``fused_act``/``upfirdn2d``
extensions are the XLA-fusable ops in ``mgldvsr_tpu.ops.stylegan_ops``.

Weights load via ``io.ckpt_convert.convert_stylegan2{,_discriminator}``.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mgldvsr_tpu.ops.stylegan_ops import (
    fused_leaky_relu,
    make_resample_kernel,
    upfirdn2d,
)

_FIR_TAPS = (1, 3, 3, 1)


def generator_channels(channel_multiplier: int = 2,
                       narrow: float = 1.0) -> Dict[str, int]:
    """stylegan2_arch.py:430-441 channel schedule."""
    return {
        "4": int(512 * narrow), "8": int(512 * narrow),
        "16": int(512 * narrow), "32": int(512 * narrow),
        "64": int(256 * channel_multiplier * narrow),
        "128": int(128 * channel_multiplier * narrow),
        "256": int(64 * channel_multiplier * narrow),
        "512": int(32 * channel_multiplier * narrow),
        "1024": int(16 * channel_multiplier * narrow),
    }


def _fir(upsample_factor: int = 1) -> np.ndarray:
    k = make_resample_kernel(_FIR_TAPS)
    return k * (upsample_factor ** 2) if upsample_factor > 1 else k


def upfirdn_upsample(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """UpFirDnUpsample (stylegan2_arch.py:43-69)."""
    k = _fir(factor)
    pad = k.shape[0] - factor
    return upfirdn2d(x, jnp.asarray(k), up=factor, down=1,
                     pad=((pad + 1) // 2 + factor - 1, pad // 2))


def upfirdn_downsample(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """UpFirDnDownsample (stylegan2_arch.py:72-94)."""
    k = _fir()
    pad = k.shape[0] - factor
    return upfirdn2d(x, jnp.asarray(k), up=1, down=factor,
                     pad=((pad + 1) // 2, pad // 2))


def upfirdn_smooth(x: jnp.ndarray, upsample_factor: int = 1,
                   downsample_factor: int = 1,
                   kernel_size: int = 1) -> jnp.ndarray:
    """UpFirDnSmooth (stylegan2_arch.py:97-131): FIR-only pass whose
    padding absorbs the adjacent strided (transpose-)conv's geometry."""
    k = _fir(upsample_factor)
    if upsample_factor > 1:
        pad = (k.shape[0] - upsample_factor) - (kernel_size - 1)
        p = ((pad + 1) // 2 + upsample_factor - 1, pad // 2 + 1)
    elif downsample_factor > 1:
        pad = (k.shape[0] - downsample_factor) + (kernel_size - 1)
        p = ((pad + 1) // 2, pad // 2)
    else:
        raise NotImplementedError
    return upfirdn2d(x, jnp.asarray(k), up=1, down=1, pad=p)


class EqualLinear(nn.Module):
    """Equalized-lr linear (stylegan2_arch.py:134-179)."""

    features: int
    lr_mul: float = 1.0
    bias_init: float = 0.0
    activate: bool = False  # 'fused_lrelu'

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        scale = (1 / math.sqrt(cin)) * self.lr_mul
        w = self.param("weight", nn.initializers.normal(1.0 / self.lr_mul),
                       (cin, self.features))
        b = self.param("bias",
                       nn.initializers.constant(self.bias_init),
                       (self.features,))
        if self.activate:
            return fused_leaky_relu(x @ (w * scale), b * self.lr_mul)
        return x @ (w * scale) + b * self.lr_mul


class EqualConv2d(nn.Module):
    """Equalized-lr conv (stylegan2_arch.py:605-651)."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k = self.kernel
        scale = 1 / math.sqrt(cin * k * k)
        w = self.param("weight", nn.initializers.normal(1.0),
                       (k, k, cin, self.features))
        out = jax.lax.conv_general_dilated(
            x, (w * scale).astype(x.dtype), (self.stride, self.stride),
            [(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (self.features,))
        return out


class ConvLayer(nn.Module):
    """[optional FIR-smooth downsample] + EqualConv2d + activation
    (stylegan2_arch.py:654-701)."""

    features: int
    kernel: int = 3
    downsample: bool = False
    use_bias: bool = True
    activate: bool = True

    @nn.compact
    def __call__(self, x):
        if self.downsample:
            x = upfirdn_smooth(x, 1, 2, self.kernel)
            stride, padding = 2, 0
        else:
            stride, padding = 1, self.kernel // 2
        # with activation the bias lives in fused_leaky_relu
        conv = EqualConv2d(self.features, self.kernel, stride, padding,
                           use_bias=self.use_bias and not self.activate,
                           name="conv")
        out = conv(x)
        if self.activate:
            if self.use_bias:
                b = self.param("bias", nn.initializers.zeros,
                               (self.features,))
                out = fused_leaky_relu(out, b)
            else:
                out = jax.nn.leaky_relu(out, 0.2) * math.sqrt(2)
        return out


class ModulatedConv2d(nn.Module):
    """stylegan2_arch.py:182-285 — per-sample modulated grouped conv; the
    'upsample' branch is grouped conv_transpose(stride 2) + FIR smooth, the
    'downsample' branch FIR smooth + stride-2 conv."""

    features: int
    kernel: int = 3
    demodulate: bool = True
    sample_mode: Optional[str] = None
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x, style):
        n, h, w, cin = x.shape
        k = self.kernel
        weight = self.param("weight", nn.initializers.normal(1.0),
                            (k, k, cin, self.features))
        scale = 1 / math.sqrt(cin * k * k)
        s = EqualLinear(cin, bias_init=1.0, name="modulation")(style)
        # [N, k, k, cin, cout]
        wmod = weight[None] * scale * s[:, None, None, :, None]
        if self.demodulate:
            demod = jax.lax.rsqrt(
                jnp.sum(wmod ** 2, axis=(1, 2, 3), keepdims=True) + self.eps)
            wmod = wmod * demod

        if self.sample_mode == "upsample":
            # grouped conv_transpose(stride 2, padding 0) expressed as an
            # input-dilated forward conv with the spatially-flipped kernel
            xg = x.transpose(1, 2, 0, 3).reshape(1, h, w, n * cin)
            wt = wmod[:, ::-1, ::-1]
            wg = wt.transpose(1, 2, 3, 0, 4).reshape(
                k, k, cin, n * self.features)
            out = jax.lax.conv_general_dilated(
                xg, wg, (1, 1), [(k - 1, k - 1)] * 2,
                lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=n)
            ho, wo = out.shape[1:3]
            out = out.reshape(ho, wo, n, self.features).transpose(2, 0, 1, 3)
            return upfirdn_smooth(out, 2, 1, k)

        if self.sample_mode == "downsample":
            x = upfirdn_smooth(x, 1, 2, k)
            h, w = x.shape[1:3]
            xg = x.transpose(1, 2, 0, 3).reshape(1, h, w, n * cin)
            wg = wmod.transpose(1, 2, 3, 0, 4).reshape(
                k, k, cin, n * self.features)
            out = jax.lax.conv_general_dilated(
                xg, wg, (2, 2), [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=n)
            ho, wo = out.shape[1:3]
            return out.reshape(ho, wo, n, self.features).transpose(2, 0, 1, 3)

        xg = x.transpose(1, 2, 0, 3).reshape(1, h, w, n * cin)
        wg = wmod.transpose(1, 2, 3, 0, 4).reshape(k, k, cin, n * self.features)
        out = jax.lax.conv_general_dilated(
            xg, wg, (1, 1), [(k // 2, k // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=n)
        return out.reshape(h, w, n, self.features).transpose(2, 0, 1, 3)


class StyleConv(nn.Module):
    """ModulatedConv2d + noise injection + FusedLeakyReLU
    (stylegan2_arch.py:288-333)."""

    features: int
    sample_mode: Optional[str] = None

    @nn.compact
    def __call__(self, x, style, noise=None, rng_noise=None):
        y = ModulatedConv2d(self.features, sample_mode=self.sample_mode,
                            name="modulated_conv")(x, style)
        noise_w = self.param("noise_weight", nn.initializers.zeros, ())
        if noise is None and rng_noise is not None:
            noise = jax.random.normal(rng_noise, y.shape[:3] + (1,), y.dtype)
        if noise is not None:
            y = y + noise_w * noise
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return fused_leaky_relu(y, b)


class ToRGB(nn.Module):
    """stylegan2_arch.py:336-374."""

    upsample: bool = True

    @nn.compact
    def __call__(self, x, style, skip=None):
        y = ModulatedConv2d(3, kernel=1, demodulate=False,
                            name="modulated_conv")(x, style)
        y = y + self.param("bias", nn.initializers.zeros, (3,))
        if skip is not None:
            if self.upsample:
                skip = upfirdn_upsample(skip, 2)
            y = y + skip
        return y


class StyleGAN2Generator(nn.Module):
    """stylegan2_arch.py:395-586. ``noises``: optional per-layer noise maps
    ([1,res,res,1]); ``rng``: randomize noise instead."""

    out_size: int = 64
    num_style_feat: int = 512
    num_mlp: int = 8
    channel_multiplier: int = 2
    narrow: float = 1.0

    @nn.compact
    def __call__(self, styles, input_is_latent: bool = False,
                 noises: Optional[Sequence[Any]] = None,
                 rng: Optional[jax.Array] = None,
                 truncation: float = 1.0,
                 truncation_latent: Optional[jnp.ndarray] = None):
        ch = generator_channels(self.channel_multiplier, self.narrow)
        log_size = int(math.log2(self.out_size))
        num_layers = (log_size - 2) * 2 + 1
        num_latent = log_size * 2 - 2

        if not isinstance(styles, (list, tuple)):
            styles = [styles]
        if not input_is_latent:
            mapped = []
            for z in styles:
                w_lat = z * jax.lax.rsqrt(
                    jnp.mean(z ** 2, -1, keepdims=True) + 1e-8)
                for i in range(self.num_mlp):
                    w_lat = EqualLinear(
                        self.num_style_feat, lr_mul=0.01, activate=True,
                        name=f"mlp_{i}")(w_lat)
                mapped.append(w_lat)
            styles = mapped
        if truncation < 1 and truncation_latent is not None:
            styles = [truncation_latent + truncation * (s - truncation_latent)
                      for s in styles]
        # single-style path: same w at every layer (forward:555-563)
        latent = jnp.repeat(styles[0][:, None], num_latent, axis=1)

        if noises is None:
            if rng is not None:
                keys = jax.random.split(rng, num_layers)
                noises = [None] * num_layers
            else:
                keys = [None] * num_layers
        else:
            keys = [None] * num_layers

        n = latent.shape[0]
        const = self.param("constant_input", nn.initializers.normal(1.0),
                           (1, 4, 4, ch["4"]))
        x = jnp.tile(const, (n, 1, 1, 1))

        def get_noise(idx, y):
            if noises is not None and noises[idx] is not None:
                return noises[idx]
            if keys[idx] is not None:
                return jax.random.normal(keys[idx], y.shape[:3] + (1,),
                                         y.dtype)
            return None

        x = StyleConv(ch["4"], name="style_conv1")(
            x, latent[:, 0], noise=get_noise(0, x), rng_noise=None)
        skip = ToRGB(upsample=False, name="to_rgb1")(x, latent[:, 1])
        i = 1
        layer_idx = 1
        for res_log in range(3, log_size + 1):
            cout = ch[str(2 ** res_log)]
            nz1 = (noises[layer_idx] if noises is not None else None)
            x = StyleConv(cout, sample_mode="upsample",
                          name=f"style_convs_{layer_idx - 1}")(
                x, latent[:, i], noise=nz1,
                rng_noise=keys[layer_idx])
            layer_idx += 1
            nz2 = (noises[layer_idx] if noises is not None else None)
            x = StyleConv(cout, name=f"style_convs_{layer_idx - 1}")(
                x, latent[:, i + 1], noise=nz2,
                rng_noise=keys[layer_idx])
            layer_idx += 1
            skip = ToRGB(name=f"to_rgbs_{res_log - 3}")(
                x, latent[:, i + 2], skip)
            i += 2
        return skip


class ResBlock(nn.Module):
    """Discriminator residual block (stylegan2_arch.py:704-731)."""

    features: int

    @nn.compact
    def __call__(self, x):
        out = ConvLayer(x.shape[-1], 3, name="conv1")(x)
        out = ConvLayer(self.features, 3, downsample=True, name="conv2")(out)
        skip = ConvLayer(self.features, 1, downsample=True, use_bias=False,
                         activate=False, name="skip")(x)
        return (out + skip) / math.sqrt(2)


class StyleGAN2Discriminator(nn.Module):
    """stylegan2_arch.py:734-799: ConvLayer stem, log2 ResBlocks, grouped
    minibatch-stddev, final conv + two equalized linears."""

    in_size: int = 64
    num_style_feat: int = 512
    channel_multiplier: int = 2
    narrow: float = 1.0
    stddev_group: int = 4
    stddev_feat: int = 1

    @nn.compact
    def __call__(self, x):
        ch = generator_channels(self.channel_multiplier, self.narrow)
        log_size = int(math.log2(self.in_size))
        h = ConvLayer(ch[str(self.in_size)], 1, name="conv_body_0")(x)
        li = 1
        in_ch = ch[str(self.in_size)]
        for i in range(log_size, 2, -1):
            out_ch = ch[str(2 ** (i - 1))]
            h = ResBlock(out_ch, name=f"conv_body_{li}")(h)
            li += 1
            in_ch = out_ch

        b, hh, ww, c = h.shape
        group = min(b, self.stddev_group)
        stddev = h.transpose(0, 3, 1, 2).reshape(
            group, -1, self.stddev_feat, c // self.stddev_feat, hh, ww)
        stddev = jnp.sqrt(stddev.var(axis=0) + 1e-8)
        stddev = stddev.mean(axis=(2, 3, 4), keepdims=True).squeeze(2)
        stddev = jnp.tile(stddev, (group, 1, hh, ww))
        h = jnp.concatenate([h, stddev.transpose(0, 2, 3, 1)], axis=-1)

        h = ConvLayer(ch["4"], 3, name="final_conv")(h)
        # torch flattens NCHW -> (c, h, w) channel-major
        h = h.transpose(0, 3, 1, 2).reshape(b, -1)
        h = EqualLinear(ch["4"], activate=True, name="final_linear_0")(h)
        return EqualLinear(1, name="final_linear_1")(h)
