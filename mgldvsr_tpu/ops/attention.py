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

_IMPL = "auto"


def set_attention_impl(impl: str) -> None:
    """impl: 'auto' (Pallas flash for long TPU self-attention, fused XLA
    otherwise — device traces show XLA streams [B,H,N,N] fp32 logits
    through HBM at N=4096, ~4.5 ms/layer of pure bandwidth), 'xla',
    'flash', or 'naive'."""
    global _IMPL
    assert impl in ("auto", "xla", "flash", "naive")
    _IMPL = impl


def attend(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """q [B,N,H,D], k/v [B,M,H,D] -> [B,N,H,D]. Softmax in fp32.

    On TPU, long self-attention (N == M >= 1024, e.g. the UNet's 64x64
    spatial levels) takes the Pallas flash-attention kernel — XLA would
    otherwise stream [B,H,N,N] logits through HBM (1.6 GB per layer at
    N=4096)."""
    n, m = q.shape[1], k.shape[1]
    b, _, h, d = q.shape
    if (
        _IMPL == "auto"
        and jax.default_backend() == "tpu"
        and n == m
        and n >= 1024
    ):
        # non-multiple-of-128 N is padded + key-masked inside the kernel
        from mgldvsr_tpu.ops.pallas.attention import (
            pick_block_q,
            resident_attention,
        )

        bq = pick_block_q(n, d, q.dtype.itemsize)
        if bq:
            fold = lambda z: z.transpose(0, 2, 1, 3).reshape(b * h, n, d)
            out = resident_attention(fold(q), fold(k), fold(v), bq)
            return out.reshape(b, h, n, d).transpose(0, 2, 1, 3)
    if (
        _IMPL == "flash"
        and jax.default_backend() == "tpu"
        and n == m
        and n >= 1024
        and n % 512 == 0
    ):
        try:
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                flash_attention,
            )

            qt = q.transpose(0, 2, 1, 3)
            kt = k.transpose(0, 2, 1, 3)
            vt = v.transpose(0, 2, 1, 3)
            out = flash_attention(qt, kt, vt,
                                  sm_scale=q.shape[-1] ** -0.5)
            return out.transpose(0, 2, 1, 3)
        except Exception:
            pass
    if _IMPL in ("xla", "auto", "flash"):
        return jax.nn.dot_product_attention(q, k, v)
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k).astype(jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", probs, v)
