"""Pallas TPU megakernel: GroupNorm + SiLU + 3x3 conv in ONE pass.

Why: the denoiser/VAE ResBlocks are chains of ``gn -> silu -> conv3x3``.
XLA computes GN stats in one fusion, then re-reads the activation to
normalize as part of the conv fusion — the normalized intermediate and the
fp32 stats tuples round-trip HBM every block (measured ~12 ms/step of
elementwise+copy traffic at the 512px workload). A standalone Pallas GN was
REJECTED in round 1 (it broke XLA's producer fusion into the conv and
regressed 53.4 -> 54.9 ms/step); the fix is to pull the conv into the
kernel too, so there is no producer left to lose:

  per (frame, out-channel tile) grid cell, keep the whole input frame
  VMEM-resident, normalize + SiLU on the VPU, and accumulate the 3x3 conv
  as 9 shifted [H*W, C] @ [C, co_tile] MXU matmuls into an fp32 scratch.

Group stats (mean, rstd per frame x group) are computed OUTSIDE the kernel
by a plain XLA reduction — a single cheap read of x — and passed in as
scalars-like small arrays; every grid cell re-normalizes its frame (VPU
work is free relative to the MXU matmuls).

Semantics match ``group_norm(eps) -> silu -> nn.Conv(3x3, SAME)`` exactly
(zero-padded borders; GN over channel groups of an NHWC tensor).

VMEM budget per cell at the worst UNet shape (64x64x320, co_tile 128):
x 2.6 MB (bf16) + padded normalized copy 2.8 MB + weights 0.8 MB +
fp32 accumulator 2.1 MB ≈ 8.3 MB — inside the ~16 MB scoped limit.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(scale_ref, shift_ref, w_ref, b_ref, x_ref,
            out_ref, xn_ref, acc_ref, *, h: int, w: int,
            c: int, co_t: int):
    """Grid: (T, Co/co_t).

    scale/shift: [1, 1, C] blocks — the GN affine pre-folded per frame
    (y = x*scale + shift); w: [9, C, co_t]; b: [1, co_t];
    x: [1, H, W, C]; out: [1, H, W, co_t];
    scratch: xn [H+2, W+2, C] (x dtype), acc [H*W, co_t] fp32."""
    x = x_ref[0].astype(jnp.float32)  # [H, W, C]
    scale = scale_ref[0]  # [1, C]
    shift = shift_ref[0]  # [1, C]
    xn = x * scale.reshape(1, 1, c) + shift.reshape(1, 1, c)
    xn = xn * jax.nn.sigmoid(xn)  # SiLU
    xn = xn.astype(xn_ref.dtype)

    # zero-padded copy for the shifted-window reads
    xn_ref[...] = jnp.zeros((h + 2, w + 2, c), xn_ref.dtype)
    xn_ref[1:h + 1, 1:w + 1, :] = xn

    acc_ref[...] = jnp.zeros((h * w, co_t), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            win = xn_ref[ky:ky + h, kx:kx + w, :].reshape(h * w, c)
            acc_ref[...] += jnp.dot(
                win, w_ref[ky * 3 + kx],
                preferred_element_type=jnp.float32)
    out = acc_ref[...] + b_ref[0].astype(jnp.float32)
    out_ref[0] = out.reshape(h, w, co_t).astype(out_ref.dtype)


def xla_gn_silu_conv3x3(x, gn_scale, gn_bias, kernel, bias, groups=32,
                        eps=1e-5):
    """Reference composition (used as fallback and as the VJP recompute)."""
    t, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(t, h * w, groups, c // groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.maximum(
        jnp.mean(jnp.square(xf), axis=(1, 3), keepdims=True)
        - jnp.square(mean), 0.0)
    xn = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(t, h, w, c)
    xn = xn * gn_scale + gn_bias
    xn = (xn * jax.nn.sigmoid(xn)).astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        xn, kernel.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return (out + bias.astype(jnp.float32)).astype(x.dtype)


def fits_vmem(h: int, w: int, c: int, itemsize: int, co_tile: int = 128,
              budget_mb: float = 15.0) -> bool:
    """True when one grid cell's working set fits the scoped VMEM budget.

    Pallas DOUBLE-BUFFERS the blocked inputs/outputs across grid steps
    (measured: the 32x32x1920 skip-concat block wants 19.1M without the 2x
    factors), so x/w/out count twice; scratch (pad, acc) counts once."""
    x_b = h * w * c * itemsize
    pad_b = (h + 2) * (w + 2) * c * itemsize
    acc_b = h * w * co_tile * 4
    w_b = 9 * c * co_tile * itemsize
    out_b = h * w * co_tile * itemsize
    total = 2 * (x_b + w_b + out_b) + pad_b + acc_b
    return total <= budget_mb * 2**20


def gn_silu_conv3x3(
    x: jnp.ndarray,
    gn_scale: jnp.ndarray,
    gn_bias: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    groups: int = 32,
    eps: float = 1e-5,
    co_tile: int = 128,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """x [T,H,W,C] -> conv3x3(silu(groupnorm(x))) [T,H,W,Co].

    kernel: [3,3,C,Co] (flax layout); output dtype follows x. Falls back to
    the XLA composition when the frame does not fit VMEM (pixel-scale VAE
    activations) and routes gradients through an XLA-recompute VJP."""
    t, h, w, c = x.shape
    co = kernel.shape[-1]
    if not fits_vmem(h, w, c, x.dtype.itemsize, min(co_tile, co)):
        return xla_gn_silu_conv3x3(x, gn_scale, gn_bias, kernel, bias,
                                   groups, eps)
    return _fused_vjp(x, gn_scale, gn_bias, kernel, bias, groups, eps,
                      co_tile, interpret)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _fused_vjp(x, gn_scale, gn_bias, kernel, bias, groups, eps, co_tile,
               interpret):
    return _fused_fwd_impl(x, gn_scale, gn_bias, kernel, bias, groups, eps,
                           co_tile, interpret)


def _fused_vjp_fwd(x, gn_scale, gn_bias, kernel, bias, groups, eps, co_tile,
                   interpret):
    out = _fused_fwd_impl(x, gn_scale, gn_bias, kernel, bias, groups, eps,
                          co_tile, interpret)
    return out, (x, gn_scale, gn_bias, kernel, bias)


def _fused_vjp_bwd(groups, eps, co_tile, interpret, res, g):
    x, gn_scale, gn_bias, kernel, bias = res
    _, vjp = jax.vjp(
        lambda *a: xla_gn_silu_conv3x3(*a, groups=groups, eps=eps), x,
        gn_scale, gn_bias, kernel, bias)
    return vjp(g.astype(x.dtype))


_fused_vjp.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


def _fused_fwd_impl(x, gn_scale, gn_bias, kernel, bias, groups, eps,
                    co_tile, interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t, h, w, c = x.shape
    co = kernel.shape[-1]

    # frame/group stats via one cheap XLA reduction (fp32), pre-folded
    # with the GN affine into per-(frame, channel) scale/shift
    cg = c // groups
    xf = x.astype(jnp.float32).reshape(t, h * w, groups, cg)
    mean = jnp.mean(xf, axis=(1, 3))
    var = jnp.mean(jnp.square(xf), axis=(1, 3)) - jnp.square(mean)
    rstd = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    a_tc = jnp.repeat(rstd[:, :, None], cg, axis=2).reshape(t, 1, c)
    m_tc = jnp.repeat(mean[:, :, None], cg, axis=2).reshape(t, 1, c)
    gw32 = gn_scale.reshape(1, 1, c).astype(jnp.float32)
    gb32 = gn_bias.reshape(1, 1, c).astype(jnp.float32)
    scale_tc = a_tc * gw32
    shift_tc = gb32 - m_tc * scale_tc

    co_t = min(co_tile, co)
    co_pad = (-co) % co_t
    wk = kernel.reshape(9, c, co).astype(x.dtype)
    bk = bias.reshape(1, co).astype(jnp.float32)
    if co_pad:
        wk = jnp.pad(wk, ((0, 0), (0, 0), (0, co_pad)))
        bk = jnp.pad(bk, ((0, 0), (0, co_pad)))
    n_co = (co + co_pad) // co_t

    out = pl.pallas_call(
        partial(_kernel, h=h, w=w, c=c, co_t=co_t),
        grid=(t, n_co),
        in_specs=[
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),  # scale
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),  # shift
            pl.BlockSpec((9, c, co_t), lambda i, j: (0, 0, j)),
            pl.BlockSpec((1, co_t), lambda i, j: (0, j)),
            pl.BlockSpec((1, h, w, c), lambda i, j: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, w, co_t), lambda i, j: (i, 0, 0, j)),
        out_shape=jax.ShapeDtypeStruct((t, h, w, co + co_pad), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((h + 2, w + 2, c), x.dtype),
            pltpu.VMEM((h * w, co_t), jnp.float32),
        ],
        interpret=interpret,
    )(scale_tc, shift_tc, wk, bk, x)
    return out[..., :co]
