"""Pallas TPU kernel: bilinear flow-warp as one-hot MXU matmuls.

The motion-guidance inner op (SURVEY §2.9: the reference's grid_sample CUDA
kernel). Scattered reads are gather-unit-bound on TPU, so this kernel
reformulates bilinear sampling as a matmul: for one output row, build the
4-corner bilinear weight matrix [W, H*W] in VMEM with ``broadcasted_iota``
comparisons (VPU work) and contract it against the VMEM-resident flattened
image [H*W, C] on the MXU — zero gathers.

Grid: (N, H). Per program: the full image block (latent-res maps fit VMEM
easily: 64x64x4 fp32 = 64 KB) + one flow row. Backward runs through the
XLA reference implementation via custom_vjp (identical math).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


ROWS_PER_BLOCK = 4

# Scoped-VMEM budget. Mosaic's stack limit is 16 MB and the kernel keeps
# TWO [rb*W, H*W] matrices live — the fp32 one-hot weight matrix and the
# int32 ``p_iota`` pixel-index matrix it is compared against — plus the
# resident image block. Budgeting only the weight matrix under-counted:
# the 960px-tile latent (92x120, rb=4) measured 16.8 MB and the
# whole-frame 1280px latent (92x160, rb=1) 16.18 MB at compile time (both
# scoped-VMEM OOM on v5e). Model both tenants + 1 MB slack against 15 MB.
_VMEM_BUDGET = 15 * 1024 * 1024
_VMEM_SLACK = 1 * 1024 * 1024


def _pick_rb(h: int, w: int, c: int) -> int:
    """Largest row-block whose working set (one-hot weights fp32 + p_iota
    int32 + resident image) fits the VMEM budget; 0 if even rb=1 does not
    fit (caller must take the XLA warp instead)."""
    hw = h * w
    img = hw * c * 4
    for rb in (ROWS_PER_BLOCK, 2, 1):
        if h % rb:
            continue
        if 2 * rb * w * hw * 4 + img + _VMEM_SLACK <= _VMEM_BUDGET:
            return rb
    return 0


def pallas_warp_fits(h: int, w: int, c: int) -> bool:
    """True when the one-hot-matmul warp kernel fits scoped VMEM at this
    image shape (dispatch gate for ``flow_warp_guided``)."""
    return _pick_rb(h, w, c) > 0


def _warp_row_kernel(img_ref, flow_ref, out_ref):
    """img_ref: [1,H,W,C]; flow_ref: [1,R,W,2]; out_ref: [1,R,W,C]."""
    _, h, w, c = img_ref.shape
    r_blk = flow_ref.shape[1]
    row0 = pl.program_id(1) * r_blk

    # all index math stays 2D ([R*W, 1]) — Mosaic rejects 1D reshapes
    flow = flow_ref[0].reshape(r_blk * w, 2)  # [R*W, 2]
    pix = jax.lax.broadcasted_iota(jnp.int32, (r_blk * w, 1), 0)
    col = (pix % w).astype(jnp.float32)
    rows = (row0 + pix // w).astype(jnp.float32)
    px = col + flow[:, 0:1].astype(jnp.float32)
    py = rows + flow[:, 1:2].astype(jnp.float32)

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    tx = px - x0
    ty = py - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    hw = h * w
    img_flat = img_ref[0].reshape(hw, c)
    p_iota = jax.lax.broadcasted_iota(jnp.int32, (r_blk * w, hw), 1)

    def corner(dy, dx, wt):
        xx = x0i + dx
        yy = y0i + dy
        valid = ((xx >= 0) & (xx <= w - 1) & (yy >= 0) & (yy <= h - 1))
        idx = jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)  # [R*W,1]
        onehot = (p_iota == idx).astype(jnp.float32)
        return onehot * (wt * valid.astype(jnp.float32))

    weights = (
        corner(0, 0, (1 - tx) * (1 - ty))
        + corner(0, 1, tx * (1 - ty))
        + corner(1, 0, (1 - tx) * ty)
        + corner(1, 1, tx * ty)
    )
    out_ref[0] = jnp.dot(
        weights, img_flat.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).reshape(r_blk, w, c).astype(out_ref.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def pallas_flow_warp(x: jnp.ndarray, flow: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """Bilinear backward-warp (zeros padding, align_corners=True semantics),
    Pallas forward + XLA backward. x: [N,H,W,C]; flow: [N,H,W,2]."""
    n, h, w, c = x.shape
    rb = _pick_rb(h, w, c)
    if rb == 0 and not interpret:
        raise ValueError(
            f"pallas_flow_warp: weight matrix for {h}x{w}x{c} exceeds the "
            "scoped-VMEM budget; gate the call with pallas_warp_fits() and "
            "use ops.warp.flow_warp instead")
    rb = rb or 1
    return pl.pallas_call(
        _warp_row_kernel,
        grid=(n, h // rb),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rb, w, 2), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rb, w, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), x.dtype),
        interpret=interpret,
    )(x, flow)


def _fwd(x, flow, interpret):
    return pallas_flow_warp(x, flow, interpret), (x, flow)


def _bwd(interpret, res, g):
    from mgldvsr_tpu.ops.warp import flow_warp

    x, flow = res
    _, vjp = jax.vjp(lambda xx, ff: flow_warp(xx, ff), x, flow)
    return vjp(g)


pallas_flow_warp.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Fused guidance warp: Pallas forward AND Pallas dL/dx (the transpose of the
# one-hot weight matrix — a matmul instead of XLA's scatter-add, which is
# the slow path in the per-step guidance gradient). The flow cotangent is
# ZERO by contract: guidance differentiates w.r.t. latents only (flows are
# per-segment constants, ddpm.py:4359-4374).
# ---------------------------------------------------------------------------


def _warp_row_dx_kernel(g_ref, flow_ref, out_ref):
    """g_ref: [1,R,W,C] output-rows cotangent; out_ref: [1,H,W,C]
    accumulated input cotangent (same block revisited across the grid)."""
    _, h, w, c = out_ref.shape
    r_blk = flow_ref.shape[1]
    row0 = pl.program_id(1) * r_blk

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[0] = jnp.zeros((h, w, c), out_ref.dtype)

    # all index math stays 2D ([R*W, 1]) — Mosaic rejects 1D reshapes
    flow = flow_ref[0].reshape(r_blk * w, 2)  # [R*W, 2]
    pix = jax.lax.broadcasted_iota(jnp.int32, (r_blk * w, 1), 0)
    col = (pix % w).astype(jnp.float32)
    rows = (row0 + pix // w).astype(jnp.float32)
    px = col + flow[:, 0:1].astype(jnp.float32)
    py = rows + flow[:, 1:2].astype(jnp.float32)
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    tx = px - x0
    ty = py - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    hw = h * w
    p_iota = jax.lax.broadcasted_iota(jnp.int32, (r_blk * w, hw), 1)

    def corner(dy, dx, wt):
        xx = x0i + dx
        yy = y0i + dy
        valid = ((xx >= 0) & (xx <= w - 1) & (yy >= 0) & (yy <= h - 1))
        idx = jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)  # [R*W,1]
        onehot = (p_iota == idx).astype(jnp.float32)
        return onehot * (wt * valid.astype(jnp.float32))

    weights = (
        corner(0, 0, (1 - tx) * (1 - ty))
        + corner(0, 1, tx * (1 - ty))
        + corner(1, 0, (1 - tx) * ty)
        + corner(1, 1, tx * ty)
    )  # [R*W, HW]
    g_row = g_ref[0].reshape(r_blk * w, c).astype(jnp.float32)
    dx = jnp.dot(weights.T, g_row,
                 preferred_element_type=jnp.float32)  # [HW, C]
    out_ref[0] = out_ref[0] + dx.reshape(h, w, c).astype(out_ref.dtype)


def _pallas_warp_dx(g: jnp.ndarray, flow: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    n, h, w, c = g.shape
    rb = _pick_rb(h, w, c) or 1
    return pl.pallas_call(
        _warp_row_dx_kernel,
        grid=(n, h // rb),
        in_specs=[
            pl.BlockSpec((1, rb, w, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rb, w, 2), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i, j: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), g.dtype),
        interpret=interpret,
    )(g, flow)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def flow_warp_guided(x: jnp.ndarray, flow: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """Warp with Pallas forward and Pallas matmul backward w.r.t. ``x``;
    the flow cotangent is ZERO (guidance-only contract)."""
    return pallas_flow_warp(x, flow, interpret)


def _gfwd(x, flow, interpret):
    return flow_warp_guided(x, flow, interpret), flow


def _gbwd(interpret, flow, g):
    return _pallas_warp_dx(g, flow, interpret), jnp.zeros_like(flow)


flow_warp_guided.defvjp(_gfwd, _gbwd)
