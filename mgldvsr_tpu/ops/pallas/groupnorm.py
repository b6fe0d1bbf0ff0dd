"""Pallas TPU kernel: one-pass channel sums for GroupNorm statistics.

XLA lowers ``jnp.sum(x, dtype=f32)`` + ``jnp.sum(x*x, dtype=f32)`` over a
bf16 tensor by materializing an fp32 copy of the whole activation next to
the producing conv (profiled on v5e: several ms per layer at 512px in the
VAE decoder). This kernel reads the bf16 tensor ONCE, upcasting only
VMEM-resident blocks, and accumulates both sums in fp32 outputs.

Returns per-(sample, channel) sums; the group fold / rsqrt / scale-shift
stay in XLA where they fuse with neighbors (they touch only [N, C]-sized
data).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stats_kernel(x_ref, s1_ref, s2_ref):
    """x_ref: [1, hb, W, C]; s1_ref/s2_ref: [1, 1, C] f32 accumulators."""

    @pl.when(pl.program_id(1) == 0)
    def _():
        s1_ref[0] = jnp.zeros_like(s1_ref[0])
        s2_ref[0] = jnp.zeros_like(s2_ref[0])

    hb, w, c = x_ref.shape[1:]
    x = x_ref[0].reshape(hb * w, c).astype(jnp.float32)
    s1_ref[0] += jnp.sum(x, axis=0, keepdims=True)
    s2_ref[0] += jnp.sum(x * x, axis=0, keepdims=True)


def _pick_rows(h: int, w: int, c: int, itemsize: int,
               budget: int = 2 * 1024 * 1024) -> int:
    per_row = w * c * itemsize
    rows = max(1, min(h, budget // max(per_row, 1)))
    while h % rows:
        rows -= 1
    return rows


def channel_sums(x: jnp.ndarray, interpret: bool | None = None):
    """x: [N, H, W, C] (any float dtype) -> (sum, sumsq) each [N, C] fp32,
    reduced over (H, W) — one HBM pass over x.

    Differentiable (custom VJP): d(sum)/dx = 1, d(sumsq)/dx = 2x — so the
    stage-2 trainer can backprop through the Pallas GN stats used by the
    video decoder at large spatial sizes (pallas_call itself has no
    autodiff rule and raises a bare AssertionError under jax.grad)."""
    return _channel_sums_vjp(x, interpret)


def _channel_sums_impl(x: jnp.ndarray, interpret: bool | None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, h, w, c = x.shape
    hb = _pick_rows(h, w, c, x.dtype.itemsize)
    s1, s2 = pl.pallas_call(
        _stats_kernel,
        grid=(n, h // hb),
        in_specs=[
            pl.BlockSpec((1, hb, w, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
        ],
        interpret=interpret,
    )(x)
    return s1[:, 0, :], s2[:, 0, :]


import functools as _ft_cs


@_ft_cs.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _channel_sums_vjp(x, interpret):
    return _channel_sums_impl(x, interpret)


def _channel_sums_fwd(x, interpret):
    return _channel_sums_impl(x, interpret), x


def _channel_sums_bwd(interpret, x, grads):
    g1, g2 = grads  # each [N, C] fp32
    dx = (g1[:, None, None, :] + 2.0 * x.astype(jnp.float32)
          * g2[:, None, None, :])
    return (dx.astype(x.dtype),)


_channel_sums_vjp.defvjp(_channel_sums_fwd, _channel_sums_bwd)


# ---------------------------------------------------------------------------
# Fully-fused GroupNorm for VMEM-resident activations (one HBM read + one
# write per tensor). Group fold/broadcast are one-hot matmuls so no reshape
# ever splits the lane dim.
# ---------------------------------------------------------------------------


def _fused_gn_kernel(x_ref, scale_ref, bias_ref, o_ref, *, groups: int,
                     eps: float):
    """x_ref/o_ref: [1, H, W, C]; scale_ref/bias_ref: [1, C]."""
    h, w, c = x_ref.shape[1:]
    g = groups
    cpg = c // g
    x2 = x_ref[0].reshape(h * w, c)
    # reduce with fp32 accumulators WITHOUT materializing an fp32 copy of
    # the block (the .astype(f32) form cost 2x block VMEM and OOMed)
    s1 = jnp.sum(x2, axis=0, keepdims=True, dtype=jnp.float32)  # [1, C]
    s2 = jnp.sum(x2 * x2, axis=0, keepdims=True, dtype=jnp.float32)
    # channel -> group one-hot [C, G]; group -> channel is its transpose
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, g), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (c, g), 1)
    sel = (ch // cpg == gr).astype(jnp.float32)
    cnt = float(h * w * cpg)
    g1 = jnp.dot(s1, sel, preferred_element_type=jnp.float32) / cnt  # [1, G]
    g2 = jnp.dot(s2, sel, preferred_element_type=jnp.float32) / cnt
    var = jnp.maximum(g2 - g1 * g1, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    invc = jnp.dot(inv, sel.T, preferred_element_type=jnp.float32)   # [1, C]
    meanc = jnp.dot(g1, sel.T, preferred_element_type=jnp.float32)
    a = invc * scale_ref[:]                                          # [1, C]
    b = bias_ref[:] - meanc * a
    y = x2 * a.astype(x2.dtype) + b.astype(x2.dtype)
    o_ref[0] = y.reshape(h, w, c)


def fused_group_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                     groups: int = 32, eps: float = 1e-5,
                     interpret: bool | None = None) -> jnp.ndarray:
    """GroupNorm for [N, H, W, C] with each sample VMEM-resident: stats +
    normalize + scale/shift in ONE kernel pass. Output dtype == x dtype."""
    import functools

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, h, w, c = x.shape
    scale2 = scale.reshape(1, c).astype(jnp.float32)
    bias2 = bias.reshape(1, c).astype(jnp.float32)
    return pl.pallas_call(
        functools.partial(_fused_gn_kernel, groups=groups, eps=eps),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, scale2, bias2)


def _gn_reference(x, scale, bias, groups, eps):
    n, h, w, c = x.shape
    xg = x.astype(jnp.float32).reshape(n, h * w, groups, c // groups)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.var(xg, axis=(1, 3), keepdims=True)
    y = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(n, h, w, c)
    return (y * scale + bias).astype(x.dtype)


import functools as _ft


@_ft.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_group_norm_vjp(x, scale, bias, groups: int = 32, eps: float = 1e-5):
    """Differentiable wrapper: Pallas one-pass forward, reference backward
    (training gradients flow through the exact jnp formulation)."""
    return fused_group_norm(x, scale, bias, groups, eps)


def _gn_fwd(x, scale, bias, groups, eps):
    return fused_group_norm_vjp(x, scale, bias, groups, eps), (x, scale, bias)


def _gn_bwd(groups, eps, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x, s, b: _gn_reference(x, s, b, groups, eps), x, scale, bias)
    return vjp(g)


fused_group_norm_vjp.defvjp(_gn_fwd, _gn_bwd)
