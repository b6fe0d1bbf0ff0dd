"""StyleGAN2 generator/discriminator (compact) on the TPU-native resample
ops.

Capability parity with basicsr's StyleGAN2 (basicsr/archs/stylegan2_arch.py,
799 LoC — heritage, used for face restoration backbones): mapping MLP,
modulated/demodulated styled convs with noise injection, ToRGB skips, FIR
up/down sampling (our ``ops.stylegan_ops``), and a residual discriminator
with minibatch-stddev. The reference's CUDA ``fused_act``/``upfirdn2d``
extensions are the XLA-fusable ops in ``mgldvsr_tpu.ops.stylegan_ops``.
"""
from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mgldvsr_tpu.ops.stylegan_ops import (
    downsample2x,
    fused_leaky_relu,
    make_resample_kernel,
    upsample2x,
)

_FIR = make_resample_kernel([1, 3, 3, 1])


class EqualLinear(nn.Module):
    features: int
    lr_mul: float = 1.0
    activate: bool = False

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        scale = (1 / math.sqrt(cin)) * self.lr_mul
        w = self.param("weight", nn.initializers.normal(1.0 / self.lr_mul),
                       (cin, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        y = x @ (w * scale)
        if self.activate:
            return fused_leaky_relu(y, b * self.lr_mul)
        return y + b * self.lr_mul


class ModulatedConv(nn.Module):
    features: int
    kernel: int = 3
    demodulate: bool = True
    up: bool = False

    @nn.compact
    def __call__(self, x, style):
        n, h, w, cin = x.shape
        k = self.kernel
        weight = self.param("weight", nn.initializers.normal(1.0),
                            (k, k, cin, self.features))
        scale = 1 / math.sqrt(cin * k * k)
        s = EqualLinear(cin, name="modulation")(style) + 1.0  # [N, cin]
        wmod = weight[None] * scale * s[:, None, None, :, None]
        if self.demodulate:
            demod = jax.lax.rsqrt(
                jnp.sum(wmod**2, axis=(1, 2, 3), keepdims=True) + 1e-8)
            wmod = wmod * demod
        if self.up:
            x = upsample2x(x, jnp.asarray(_FIR))
            h, w = x.shape[1:3]
        # grouped conv per sample: fold batch into channels
        xg = x.transpose(1, 2, 0, 3).reshape(1, h, w, n * cin)
        # block-diagonal grouped kernel via feature_group_count=n
        wg = wmod.transpose(1, 2, 3, 0, 4).reshape(k, k, cin, n * self.features)
        out = jax.lax.conv_general_dilated(
            xg, wg, (1, 1), [(k // 2, k // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=n,
        )
        return out.reshape(h, w, n, self.features).transpose(2, 0, 1, 3)


class StyledConv(nn.Module):
    features: int
    up: bool = False

    @nn.compact
    def __call__(self, x, style, rng_noise=None):
        y = ModulatedConv(self.features, up=self.up, name="conv")(x, style)
        noise_w = self.param("noise_weight", nn.initializers.zeros, ())
        if rng_noise is not None:
            noise = jax.random.normal(rng_noise, y.shape[:3] + (1,))
            y = y + noise_w * noise
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return fused_leaky_relu(y, b)


class ToRGB(nn.Module):
    @nn.compact
    def __call__(self, x, style, skip=None):
        y = ModulatedConv(3, kernel=1, demodulate=False, name="conv")(x, style)
        b = self.param("bias", nn.initializers.zeros, (3,))
        y = y + b
        if skip is not None:
            y = y + upsample2x(skip, jnp.asarray(_FIR))
        return y


class StyleGAN2Generator(nn.Module):
    out_size: int = 64
    style_dim: int = 512
    num_mlp: int = 8
    channel_base: int = 64

    @nn.compact
    def __call__(self, z, rng=None):
        n = z.shape[0]
        # mapping network
        w_lat = z * jax.lax.rsqrt(jnp.mean(z**2, -1, keepdims=True) + 1e-8)
        for i in range(self.num_mlp):
            w_lat = EqualLinear(self.style_dim, lr_mul=0.01, activate=True,
                                name=f"mlp_{i}")(w_lat)

        log_size = int(math.log2(self.out_size))
        channels = {
            2**i: min(self.channel_base * 2 ** (log_size - i), 512)
            for i in range(2, log_size + 1)
        }
        const = self.param("const_input", nn.initializers.normal(1.0),
                           (1, 4, 4, channels[4]))
        x = jnp.tile(const, (n, 1, 1, 1))
        keys = (jax.random.split(rng, 2 * log_size)
                if rng is not None else [None] * (2 * log_size))
        x = StyledConv(channels[4], name="conv1")(x, w_lat, keys[0])
        skip = ToRGB(name="to_rgb1")(x, w_lat)
        ki = 1
        for i in range(3, log_size + 1):
            ch = channels[2**i]
            x = StyledConv(ch, up=True, name=f"conv_up_{i}")(x, w_lat, keys[ki])
            ki += 1
            x = StyledConv(ch, name=f"conv_{i}")(x, w_lat, keys[ki])
            ki += 1
            skip = ToRGB(name=f"to_rgb_{i}")(x, w_lat, skip)
        return skip


class StyleGAN2Discriminator(nn.Module):
    in_size: int = 64
    channel_base: int = 64

    @nn.compact
    def __call__(self, x):
        log_size = int(math.log2(self.in_size))
        channels = {
            2**i: min(self.channel_base * 2 ** (log_size - i), 512)
            for i in range(2, log_size + 1)
        }
        h = fused_leaky_relu(
            nn.Conv(channels[self.in_size], (1, 1), name="from_rgb")(x))
        for i in range(log_size, 2, -1):
            cout = channels[2 ** (i - 1)]
            res = downsample2x(
                nn.Conv(cout, (1, 1), use_bias=False, name=f"skip_{i}")(h),
                jnp.asarray(_FIR))
            h = fused_leaky_relu(nn.Conv(h.shape[-1], (3, 3), padding=1,
                                         name=f"conv1_{i}")(h))
            h = downsample2x(h, jnp.asarray(_FIR))
            h = fused_leaky_relu(nn.Conv(cout, (3, 3), padding=1,
                                         name=f"conv2_{i}")(h))
            h = (h + res) / math.sqrt(2)
        # minibatch stddev
        stddev = jnp.std(h, axis=0, keepdims=True).mean()
        h = jnp.concatenate(
            [h, jnp.full(h.shape[:3] + (1,), stddev, h.dtype)], -1)
        h = fused_leaky_relu(nn.Conv(channels[4], (3, 3), padding=1,
                                     name="final_conv")(h))
        h = h.reshape(h.shape[0], -1)
        h = EqualLinear(channels[4], activate=True, name="final_linear1")(h)
        return EqualLinear(1, name="final_linear2")(h)
