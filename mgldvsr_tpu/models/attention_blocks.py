"""Transformer blocks for the denoiser UNet and legacy qkv attention.

Capability parity: SpatialTransformerV2 / BasicTransformerBlockV2 /
MemoryEfficient(Self|Cross)Attention (/root/reference/ldm/modules/attention.py)
and the OpenAI-style AttentionBlock (qkv-conv attention,
/root/reference/ldm/modules/diffusionmodules/openaimodel.py:485-649) used by
the struct-cond encoder.

TPU-first: attention goes through ``mgldvsr_tpu.ops.attention.attend`` which
dispatches to XLA's fused dot-product attention (optimal at these sequence
lengths) — the reference's xformers CUDA kernels have no place here.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mgldvsr_tpu.models.layers import conv1x1, group_norm
from mgldvsr_tpu.ops.attention import attend

Dtype = Any


class CrossAttention(nn.Module):
    """Multi-head attention; self-attention when context is None.

    If the context batch is smaller than the query batch (one text embedding
    per clip vs one query row per frame), the context is tiled — mirroring the
    reference's batch-repeat at attention.py:337.
    """

    num_heads: int
    dim_head: int
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context: Optional[jnp.ndarray] = None):
        ctx = x if context is None else context
        if ctx.shape[0] != x.shape[0]:
            ctx = jnp.repeat(ctx, x.shape[0] // ctx.shape[0], axis=0)
        inner = self.num_heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="to_v")(ctx)
        b, n, _ = q.shape
        m = k.shape[1]
        out = attend(
            q.reshape(b, n, self.num_heads, self.dim_head),
            k.reshape(b, m, self.num_heads, self.dim_head),
            v.reshape(b, m, self.num_heads, self.dim_head),
        ).reshape(b, n, inner)
        return nn.Dense(self.out_dim, dtype=self.dtype, param_dtype=jnp.float32, name="to_out")(out)


class GEGLUFeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        h = nn.Dense(inner * 2, dtype=self.dtype, param_dtype=jnp.float32, name="proj_in")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        # exact (erf) gelu to match the torch GEGLU reference semantics
        h = h * jax.nn.gelu(gate, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="proj_out")(h)


class BasicTransformerBlock(nn.Module):
    """self-attn -> cross-attn(context) -> GEGLU FF, pre-LN residuals."""

    num_heads: int
    dim_head: int
    context_dim: Optional[int] = None
    disable_self_attn: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        c = x.shape[-1]
        ln = lambda name: nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32, name=name)
        x = x + CrossAttention(self.num_heads, self.dim_head, c, self.dtype, name="attn1")(
            ln("norm1")(x), context if self.disable_self_attn else None
        )
        x = x + CrossAttention(self.num_heads, self.dim_head, c, self.dtype, name="attn2")(
            ln("norm2")(x), context
        )
        x = x + GEGLUFeedForward(c, dtype=self.dtype, name="ff")(ln("norm3")(x))
        return x


class SpatialTransformer(nn.Module):
    """Spatial transformer over flattened HW with cross-attention context.

    ``use_linear`` selects 1x1-linear in/out projections (SD 2.1 flavor,
    config use_linear_in_transformer=True).
    """

    num_heads: int
    dim_head: int
    depth: int = 1
    context_dim: Optional[int] = None
    use_linear: bool = True
    disable_self_attn: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        n, h, w, c = x.shape
        inner = self.num_heads * self.dim_head
        residual = x
        y = group_norm(eps=1e-6, dtype=self.dtype)(x)
        if self.use_linear:
            y = y.reshape(n, h * w, c)
            y = nn.Dense(inner, dtype=self.dtype, param_dtype=jnp.float32, name="proj_in")(y)
        else:
            y = conv1x1(inner, self.dtype, name="proj_in")(y).reshape(n, h * w, inner)
        for i in range(self.depth):
            y = BasicTransformerBlock(
                self.num_heads, self.dim_head, self.context_dim,
                self.disable_self_attn, self.dtype, name=f"block_{i}",
            )(y, context)
        if self.use_linear:
            y = nn.Dense(c, kernel_init=nn.initializers.zeros, dtype=self.dtype,
                         param_dtype=jnp.float32, name="proj_out")(y)
            y = y.reshape(n, h, w, c)
        else:
            y = y.reshape(n, h, w, inner)
            y = conv1x1(c, self.dtype, zero_init=True, name="proj_out")(y)
        return y + residual


class QKVAttentionBlock(nn.Module):
    """OpenAI-style attention: GroupNorm -> 1x1 qkv conv -> MHA -> zero proj.

    Used by the struct-cond half-UNet (legacy head-splitting order).
    """

    num_heads: int = 1
    num_head_channels: int = -1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        heads = self.num_heads if self.num_head_channels == -1 else c // self.num_head_channels
        y = group_norm(dtype=self.dtype)(x).reshape(n, h * w, c)
        qkv = nn.Dense(3 * c, dtype=self.dtype, param_dtype=jnp.float32, name="qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        dh = c // heads
        out = attend(
            q.reshape(n, h * w, heads, dh),
            k.reshape(n, h * w, heads, dh),
            v.reshape(n, h * w, heads, dh),
        ).reshape(n, h * w, c)
        out = nn.Dense(c, kernel_init=nn.initializers.zeros, dtype=self.dtype,
                       param_dtype=jnp.float32, name="proj_out")(out)
        return x + out.reshape(n, h, w, c)
