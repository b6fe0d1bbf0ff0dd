"""Pallas TPU kernel: RAFT correlation-volume window lookup.

The inner op of the RAFT recurrence (SURVEY §7 "hard parts"): for every
query pixel q, sample a (2r+1)^2 window around its current flow estimate
from q's OWN correlation map (row q of the all-pairs volume), bilinearly.

XLA lowers the vmapped ``dynamic_slice`` formulation to a scattered gather
(B*N descriptors per level per iteration — gather-unit bound). Here each
grid program holds a block of Q query maps VMEM-resident (pre-padded on the
host, once per RAFT call since the pyramid is scan-carried) and extracts all
Q windows with VMEM-local dynamic slices inside a ``fori_loop`` — no HBM
gather at all.

Mosaic constraints respected: all reshapes/index math stay >=2-D; the
integer window slice is (2r+2)x(2r+2) so the four bilinear corners are
static sub-slices.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lookup_kernel(corr_ref, coords_ref, out_ref, *, radius: int):
    """corr_ref: [1, Q, Hp, Wp] (padded maps); coords_ref: [1, Q, 2] level
    -scaled centers; out_ref: [1, Q, win+1, win+1] integer-grid patches."""
    r = radius
    q = corr_ref.shape[1]
    side = 2 * r + 2

    def body(i, _):
        # centers in level units; padded map origin is at (pad, pad)
        cx = coords_ref[0, i, 0]
        cy = coords_ref[0, i, 1]
        x0 = jnp.floor(cx).astype(jnp.int32)
        y0 = jnp.floor(cy).astype(jnp.int32)
        hp = corr_ref.shape[2]
        wp = corr_ref.shape[3]
        pad = 2 * r + 3
        # clamp exactly like the XLA path: far-out windows land fully in the
        # zero padding
        sy = jnp.clip(y0, -r - 2, (hp - 2 * pad) + r + 1) - r + pad
        sx = jnp.clip(x0, -r - 2, (wp - 2 * pad) + r + 1) - r + pad
        patch = jax.lax.dynamic_slice(
            corr_ref[0, i], (sy, sx), (side, side))
        out_ref[0, i] = patch
        return 0

    jax.lax.fori_loop(0, q, body, 0)


def _pallas_window_patches(corr_pad: jnp.ndarray, coords: jnp.ndarray,
                           radius: int, q_block: int,
                           interpret: bool = False) -> jnp.ndarray:
    """corr_pad: [B, N, Hp, Wp]; coords: [B, N, 2] -> [B, N, 2r+2, 2r+2]."""
    b, n, hp, wp = corr_pad.shape
    side = 2 * radius + 2
    qb = q_block if n % q_block == 0 else n
    return pl.pallas_call(
        partial(_lookup_kernel, radius=radius),
        grid=(b, n // qb),
        in_specs=[
            pl.BlockSpec((1, qb, hp, wp), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qb, 2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, qb, side, side), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, side, side), corr_pad.dtype),
        interpret=interpret,
    )(corr_pad, coords)


def pad_pyramid(pyramid, radius: int = 4):
    """Zero-pad each level's maps once (host/XLA side, before the iteration
    scan): [B, N, Hl, Wl] -> [B, N, Hl+2p, Wl+2p] with p = 2r+3."""
    p = 2 * radius + 3
    return [jnp.pad(c, ((0, 0), (0, 0), (p, p), (p, p))) for c in pyramid]


def lookup_corr_pallas(padded_pyramid, coords: jnp.ndarray, radius: int = 4,
                       q_block: int = 128, interpret: bool | None = None
                       ) -> jnp.ndarray:
    """Drop-in replacement for flow.raft.lookup_corr, consuming a pre-padded
    pyramid. coords: [B, H, W, 2] level-0 (x, y) centers. Returns
    [B, H, W, levels*(2r+1)^2] with the same bilinear blend + zeros-outside
    semantics.
    """
    if interpret is None:  # auto: emulate off-TPU (tests/CPU dev)
        interpret = jax.default_backend() != "tpu"
    b, h, w, _ = coords.shape
    n = h * w
    r = radius
    win = 2 * r + 1

    out = []
    for lvl, cp in enumerate(padded_pyramid):
        ctr = coords.reshape(b, n, 2) / (2 ** lvl)
        frac = ctr - jnp.floor(ctr)
        tx = frac[..., 0][..., None, None].astype(cp.dtype)
        ty = frac[..., 1][..., None, None].astype(cp.dtype)
        patch = _pallas_window_patches(cp, ctr, r, q_block, interpret)
        pa = patch[..., :win, :win]
        pb = patch[..., :win, 1:]
        pc = patch[..., 1:, :win]
        pd = patch[..., 1:, 1:]
        sampled = ((1 - ty) * (1 - tx) * pa + (1 - ty) * tx * pb
                   + ty * (1 - tx) * pc + ty * tx * pd)
        # [B, N, win, win] -> [B, N, win*win] (host-side reshape)
        out.append(sampled.reshape(b, n, win * win))
    return jnp.concatenate(out, axis=-1).reshape(b, h, w, -1)
