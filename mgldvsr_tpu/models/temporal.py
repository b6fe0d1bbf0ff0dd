"""Temporal mixing modules: 3x1x1 temporal conv and temporal self-attention.

Capability parity with SpatialTemporalConv / MultiDimTemporalConv
(/root/reference/ldm/modules/diffusionmodules/util.py:291-339) and
TemporalAttention (/root/reference/ldm/modules/attention.py:124-143).

TPU-first design: inputs stay in the flattened (B*T, H, W, C) video layout
used throughout the pipeline; temporal convs reshape to (B, T, H, W, C) and
run a 1-D conv over T (XLA maps this to the MXU as a small dense contraction);
temporal attention attends over the tiny T axis with (B*H*W) as batch.

The learnable blend scalar ``alpha`` mixes the temporal branch with the
identity: out = alpha * temporal(x) + (1 - alpha) * x. The reference leaves
this parameter *uninitialised* (torch.Tensor(1)); we zero-init so fresh models
start as the identity (pretrained values flow in via the weight converter).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class _TemporalConvParams(nn.Module):
    """Holds the (3,1,1) temporal-conv weights with nn.Conv-compatible param
    names/shapes (kernel [3,1,1,C,C], bias [C]) so checkpoints/converters
    are layout-stable while the compute uses a matmul formulation."""

    features: int

    @nn.compact
    def __call__(self):
        c = self.features
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 1, 1, c, c), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return kernel, bias


class SpatialTemporalConv(nn.Module):
    """Per-pixel temporal conv (kernel 3 over T), alpha-blended residual.

    TPU note: expressed as three shifted [BTHW, C] @ [C, C] contractions
    instead of a 3-spatial-dim XLA convolution — a (5, H, W) conv window
    with batch 1 tiles poorly onto the MXU, while the per-tap matmuls are
    its native shape."""

    num_frames: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        bt, h, w, c = x.shape
        t = self.num_frames
        b = bt // t
        kernel, bias = _TemporalConvParams(c, name="temporal_conv")()
        # One [C, 3C] matmul instead of three shifted [C, C] taps: the
        # shifted input slices forced XLA to materialize a copy of the whole
        # activation per tap (r03 decode trace: ~13 ms/call of [.,1,C]
        # copies); reading x once and shifting the per-tap OUTPUTS keeps the
        # big tensor traffic to a single read.
        kmat = kernel[:, 0, 0].transpose(1, 0, 2).reshape(c, 3 * c)
        v = x.reshape(b, t, h, w, c).astype(self.dtype)
        prod = jnp.einsum("bthwc,cd->bthwd", v, kmat.astype(self.dtype))
        prod = prod.reshape(b, t, h, w, 3, c)
        ppad = jnp.pad(prod, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0),
                              (0, 0)))
        # out[t] = sum_k v[t+k-1] @ K_k = sum_k prod[t+k-1, k]
        res = (ppad[:, 0:t, :, :, 0] + ppad[:, 1:t + 1, :, :, 1]
               + ppad[:, 2:t + 2, :, :, 2])
        res = (res + bias.astype(self.dtype)).reshape(bt, h, w, c)
        alpha = self.param("alpha", nn.initializers.zeros, (1,), jnp.float32)
        alpha = alpha.astype(x.dtype)
        return alpha * res.astype(x.dtype) + (1 - alpha) * x


class MultiDimTemporalConv(nn.Module):
    """Dilated dual-branch temporal conv variant (sigmoid-gated blend)."""

    num_frames: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        bt, h, w, c = x.shape
        t = self.num_frames
        b = bt // t
        v = x.reshape(b, t, h, w, c)
        res1 = nn.Conv(
            c, kernel_size=(3, 1, 1), padding=((1, 1), (0, 0), (0, 0)),
            dtype=self.dtype, param_dtype=jnp.float32, name="temporal_conv1",
        )(v)
        res2 = nn.Conv(
            c, kernel_size=(3, 1, 1), padding=((2, 2), (0, 0), (0, 0)),
            kernel_dilation=(2, 1, 1),
            dtype=self.dtype, param_dtype=jnp.float32, name="temporal_conv2",
        )(v)
        res = (res1 + res2).reshape(bt, h, w, c)
        alpha = self.param("alpha", nn.initializers.zeros, (1,), jnp.float32)
        gate = jax.nn.sigmoid(alpha).astype(x.dtype)
        return gate * res + (1 - gate) * x


class TemporalAttention(nn.Module):
    """Self-attention over the T axis for each spatial location.

    (B*T, H, W, C) -> (B*H*W, T, C) -> LayerNorm -> MHA -> alpha blend.
    """

    num_frames: int
    num_heads: int = 8
    dim_head: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        bt, h, w, c = x.shape
        t = self.num_frames
        b = bt // t
        seq = x.reshape(b, t, h * w, c).transpose(0, 2, 1, 3).reshape(b * h * w, t, c)
        y = nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32, name="norm")(seq)
        inner = self.num_heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="to_q")(y)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="to_k")(y)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="to_v")(y)
        def heads(z):
            return z.reshape(b * h * w, t, self.num_heads, self.dim_head)
        attn = jax.nn.dot_product_attention(heads(q), heads(k), heads(v))
        attn = attn.reshape(b * h * w, t, inner)
        res = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="to_out")(attn)
        res = res.reshape(b, h * w, t, c).transpose(0, 2, 1, 3).reshape(bt, h, w, c)
        alpha = self.param("alpha", nn.initializers.zeros, (1,), jnp.float32)
        alpha = alpha.astype(x.dtype)
        return alpha * res + (1 - alpha) * x
