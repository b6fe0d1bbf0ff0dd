"""SwinIR image restoration transformer.

Capability parity with /root/reference/basicsr/archs/swinir_arch.py
(structure studied, rebuilt channels-last flax): shallow conv feature +
deep feature of Residual Swin Transformer Blocks (window attention with
relative position bias, alternating shifted windows, MLP), conv after body,
and pixel-shuffle reconstruction with a global residual.

TPU-first: window partition is a reshape/transpose (no gathers); attention
over (win*win) tokens batches all windows — dense MXU work; shifts are
``jnp.roll``. The attention mask for shifted windows at image borders is
precomputed per static input size.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mgldvsr_tpu.models.heritage.sr_archs import pixel_shuffle


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """[B,H,W,C] -> [B*nW, ws*ws, C]."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def window_reverse(wins: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    b = wins.shape[0] // ((h // ws) * (w // ws))
    x = wins.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


def shift_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """Attention mask preventing cross-boundary attention in shifted
    windows: [nW, ws*ws, ws*ws] with 0/-100 entries."""
    img_mask = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wss in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[:, hs, wss, :] = cnt
            cnt += 1
    m = img_mask.reshape(1, h // ws, ws, w // ws, ws, 1)
    m = m.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    window_size: int
    num_heads: int

    @nn.compact
    def __call__(self, x, mask=None):
        bnw, n, c = x.shape
        ws = self.window_size
        qkv = nn.Dense(3 * self.dim, name="qkv",
                       param_dtype=jnp.float32)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = self.dim // self.num_heads

        def heads(z):
            return z.reshape(bnw, n, self.num_heads, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        scale = hd**-0.5
        attn = (q @ k.transpose(0, 1, 3, 2)) * scale

        rpb_table = self.param(
            "relative_position_bias_table",
            nn.initializers.normal(0.02),
            ((2 * ws - 1) ** 2, self.num_heads),
        )
        idx = jnp.asarray(relative_position_index(ws))
        bias = rpb_table[idx.reshape(-1)].reshape(n, n, self.num_heads)
        attn = attn + bias.transpose(2, 0, 1)[None]

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bnw // nw, nw, self.num_heads, n, n)
            attn = attn + mask[None, :, None]
            attn = attn.reshape(bnw, self.num_heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(bnw, n, self.dim)
        return nn.Dense(self.dim, name="proj", param_dtype=jnp.float32)(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 8
    shift_size: int = 0
    mlp_ratio: float = 2.0

    @nn.compact
    def __call__(self, x):  # [B,H,W,C]
        b, h, w, c = x.shape
        ws = self.window_size
        shift = self.shift_size if min(h, w) > ws else 0
        ln = lambda nm: nn.LayerNorm(epsilon=1e-5, param_dtype=jnp.float32, name=nm)

        y = ln("norm1")(x)
        if shift:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(shift_attn_mask(h, w, ws, shift))
        else:
            mask = None
        wins = window_partition(y, ws)
        wins = WindowAttention(self.dim, ws, self.num_heads, name="attn")(
            wins, mask)
        y = window_reverse(wins, ws, h, w)
        if shift:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        x = x + y

        y = ln("norm2")(x)
        hdim = int(self.dim * self.mlp_ratio)
        y = nn.Dense(hdim, name="mlp_fc1", param_dtype=jnp.float32)(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="mlp_fc2", param_dtype=jnp.float32)(y)
        return x + y


class RSTB(nn.Module):
    """Residual Swin Transformer Block: depth SwinBlocks + conv + skip."""

    dim: int
    depth: int
    num_heads: int
    window_size: int = 8

    @nn.compact
    def __call__(self, x):
        y = x
        for i in range(self.depth):
            y = SwinBlock(
                self.dim, self.num_heads, self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                name=f"block_{i}",
            )(y)
        y = nn.Conv(self.dim, (3, 3), padding=1, name="conv",
                    param_dtype=jnp.float32)(y)
        return x + y


class SwinIR(nn.Module):
    """Classical-SR flavor: x2/x4 pixel-shuffle upsampling.

    Input sizes must be multiples of window_size (pad upstream)."""

    upscale: int = 4
    embed_dim: int = 60
    depths: Sequence[int] = (2, 2)
    num_heads: Sequence[int] = (6, 6)
    window_size: int = 8
    num_out_ch: int = 3

    @nn.compact
    def __call__(self, x):  # [B,H,W,3] in [0,1]
        mean = jnp.asarray([0.4488, 0.4371, 0.4040])
        x = x - mean
        feat = nn.Conv(self.embed_dim, (3, 3), padding=1, name="conv_first",
                       param_dtype=jnp.float32)(x)
        y = nn.LayerNorm(epsilon=1e-5, param_dtype=jnp.float32,
                         name="norm_embed")(feat)
        for i, (d, nh) in enumerate(zip(self.depths, self.num_heads)):
            y = RSTB(self.embed_dim, d, nh, self.window_size,
                     name=f"layer_{i}")(y)
        y = nn.LayerNorm(epsilon=1e-5, param_dtype=jnp.float32,
                         name="norm_body")(y)
        y = nn.Conv(self.embed_dim, (3, 3), padding=1,
                    name="conv_after_body", param_dtype=jnp.float32)(y)
        feat = feat + y

        feat = nn.Conv(64, (3, 3), padding=1, name="conv_before_upsample",
                       param_dtype=jnp.float32)(feat)
        feat = nn.leaky_relu(feat, 0.01)
        up = self.upscale
        while up > 1:
            r = 3 if up % 3 == 0 else 2
            feat = pixel_shuffle(
                nn.Conv(64 * r * r, (3, 3), padding=1,
                        name=f"upsample_conv_x{up}",
                        param_dtype=jnp.float32)(feat), r)
            up //= r
        out = nn.Conv(self.num_out_ch, (3, 3), padding=1, name="conv_last",
                      param_dtype=jnp.float32)(feat)
        return out + mean
