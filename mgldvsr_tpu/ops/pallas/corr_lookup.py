"""Pallas TPU kernel: RAFT correlation-volume window lookup.

The inner op of the RAFT recurrence (SURVEY §7 "hard parts"): for every
query pixel q, sample a (2r+1)^2 window around its current flow estimate
from q's OWN correlation map (row q of the all-pairs volume), bilinearly.

XLA lowers the vmapped ``dynamic_slice`` formulation to a scattered gather
(B*N descriptors per level per iteration — gather-unit bound; measured
88 ms/iteration on v5e at the 512px workload). Here each grid program holds
a block of Q query maps VMEM-resident (pre-padded on the host, once per RAFT
call since the pyramid is scan-carried) and extracts all Q windows with
VMEM-local reads — no HBM gather at all.

Mosaic constraints respected:
- no value-level ``dynamic_slice`` (unsupported primitive): the row slice is
  a ref-level ``pl.ds`` load with dynamic start on the *sublane* dim;
- the lane-dim (column) dynamic start is a one-hot column-select matmul
  (``[side, Wp] @ [Wp, side]`` per query) instead of a dynamic lane offset;
- window starts are precomputed on the host into SMEM (scalars);
- all index math stays >= 2-D.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lookup_kernel(starts_ref, corr_ref, out_ref, *, side: int):
    """starts_ref (SMEM): [1, Q, 2] int32 (sy, sx) clamped window starts in
    padded-map coordinates; corr_ref: [1, Q, Hp, Wp]; out_ref: [1, Q, side,
    side] integer-grid patches (side = 2r+2).

    Row extraction: maps narrower than one 128-lane tile use a dynamic
    sublane-start ``pl.ds`` slice (free); wider maps span lane tiles, where
    Mosaic requires provably 8-aligned sublane starts — there the rows are
    selected with a one-hot [side, Hp] matmul instead (static indexing,
    small MXU work). Columns always use the one-hot matmul select."""
    q = corr_ref.shape[1]
    hp = corr_ref.shape[2]
    wp = corr_ref.shape[3]
    # one-hot column selector built once per program: sel[m, j] = m == sx + j
    m_iota = jax.lax.broadcasted_iota(jnp.int32, (wp, side), 0)
    j_iota = jax.lax.broadcasted_iota(jnp.int32, (wp, side), 1)
    row_select_matmul = wp > 128
    if row_select_matmul:
        my_iota = jax.lax.broadcasted_iota(jnp.int32, (side, hp), 1)
        jy_iota = jax.lax.broadcasted_iota(jnp.int32, (side, hp), 0)

    def body(i, _):
        sy = starts_ref[0, i, 0]
        sx = starts_ref[0, i, 1]
        if row_select_matmul:
            amap = corr_ref[0, i]  # [Hp, Wp], static load
            sel_y = (my_iota == sy + jy_iota).astype(amap.dtype)
            rows = jnp.dot(sel_y, amap,
                           preferred_element_type=jnp.float32
                           ).astype(amap.dtype)  # [side, Wp]
        else:
            rows = corr_ref[0, i, pl.ds(sy, side), :]  # [side, Wp]
        sel = (m_iota == sx + j_iota).astype(rows.dtype)  # [Wp, side]
        out_ref[0, i] = jnp.dot(rows, sel,
                                preferred_element_type=jnp.float32
                                ).astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, q, body, 0)


def _pick_q_block(n: int, hp: int, wp: int, itemsize: int,
                  q_block: int) -> int:
    """Largest divisor of n that is <= q_block AND whose double-buffered
    input window ([qb, Hp, Wp] x2) fits the ~16 MB VMEM budget. The old
    ``n if not divisible`` fallback made ONE giant block — at 720p RAFT
    (n=14400, level-0 maps 112x182) that is a 9.8 MB SMEM starts block and
    a >1 GB VMEM window, which kills the Mosaic compile."""
    # Mosaic tiles pad the sublane dim to 8 and the lane dim to 128; the
    # double-buffered window is charged at the padded size
    hp_pad = (hp + 7) // 8 * 8
    wp_pad = (wp + 127) // 128 * 128
    per_q = hp_pad * wp_pad * itemsize * 2
    cap = max(int((12 * 2 ** 20) // per_q), 1)
    cap = min(cap, q_block, n)
    # Mosaic: a partial block's sublane dim must be a multiple of 8
    for d in range(cap - cap % 8, 0, -8):
        if n % d == 0:
            return d
    return n  # single block (tiny maps only; fits VMEM by construction)


def _pallas_window_patches(corr_pad: jnp.ndarray, starts: jnp.ndarray,
                           radius: int, q_block: int,
                           interpret: bool = False) -> jnp.ndarray:
    """corr_pad: [B, N, Hp, Wp]; starts: [B, N, 2] int32 (sy, sx) ->
    [B, N, 2r+2, 2r+2]."""
    b, n, hp, wp = corr_pad.shape
    side = 2 * radius + 2
    qb = _pick_q_block(n, hp, wp, corr_pad.dtype.itemsize, q_block)
    return pl.pallas_call(
        partial(_lookup_kernel, side=side),
        grid=(b, n // qb),
        in_specs=[
            pl.BlockSpec((1, qb, 2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, qb, hp, wp), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, qb, side, side), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, side, side), corr_pad.dtype),
        interpret=interpret,
    )(starts, corr_pad)


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
    semantics (clamped far-out windows land entirely in the zero padding).
    """
    if interpret is None:  # auto: emulate off-TPU (tests/CPU dev)
        interpret = jax.default_backend() != "tpu"
    b, h, w, _ = coords.shape
    n = h * w
    r = radius
    win = 2 * r + 1
    pad = 2 * r + 3

    out = []
    for lvl, cp in enumerate(padded_pyramid):
        hl = cp.shape[2] - 2 * pad
        wl = cp.shape[3] - 2 * pad
        ctr = coords.reshape(b, n, 2) / (2 ** lvl)
        x0 = jnp.floor(ctr[..., 0])
        y0 = jnp.floor(ctr[..., 1])
        tx = (ctr[..., 0] - x0)[..., None, None].astype(cp.dtype)
        ty = (ctr[..., 1] - y0)[..., None, None].astype(cp.dtype)
        sx = jnp.clip(x0.astype(jnp.int32), -r - 2, wl + r + 1) - r + pad
        sy = jnp.clip(y0.astype(jnp.int32), -r - 2, hl + r + 1) - r + pad
        starts = jnp.stack([sy, sx], axis=-1)  # [B, N, 2] int32
        patch = _pallas_window_patches(cp, starts, r, q_block, interpret)
        pa = patch[..., :win, :win]
        pb = patch[..., :win, 1:]
        pc = patch[..., 1:, :win]
        pd = patch[..., 1:, 1:]
        sampled = ((1 - ty) * (1 - tx) * pa + (1 - ty) * tx * pb
                   + ty * (1 - tx) * pc + ty * tx * pd)
        # match the reference's transposed window flatten order
        # (raft_arch.py:62-64 delta quirk) — see flow/raft.lookup_corr
        sampled = sampled.swapaxes(-1, -2)
        # [B, N, win, win] -> [B, N, win*win] (host-side reshape)
        out.append(sampled.reshape(b, n, win * win))
    return jnp.concatenate(out, axis=-1).reshape(b, h, w, -1)
