"""Arbitrary-resolution tiled inference.

Two-level tiling, capability parity with
/root/reference/scripts/vsr_val_ddpm_text_T_vqganfin_oldcanvas_tile.py and
``p_mean_variance_canvas`` (/root/reference/ldm/models/diffusion/ddpm.py:
4191-4322):

1. pixel-space splitting of the pre-upscaled frames into overlapping
   patches (ImageSpliter, 960/750 defaults), each restored independently and
   gathered by overlap-averaging;
2. latent-space canvas tiling *at the noise-prediction level*: per sampling
   step, a 64-latent tile window (overlap 32) slides over the canvas, each
   tile gets its own struct-cond features + UNet eps prediction, and tiles
   are stitched with gaussian weights (ddpm.py:4601-4616) before a single
   posterior update — one coherent trajectory per patch.

TPU-first: the tile grid is static (computed from shapes at trace time), so
the whole canvas step — all tiles, batched through the UNet in chunks —
compiles into the same ``lax.scan`` sampling program used by the fixed-size
path; only the ``denoise_fn`` differs.
"""
from __future__ import annotations

import math
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_tile_weights(tile_h: int, tile_w: int) -> np.ndarray:
    """Gaussian stitching weights, reference semantics (var=0.01·size²;
    note the reference's asymmetric midpoints: (w-1)/2 for x, h/2 for y)."""
    var = 0.01
    mid_x = (tile_w - 1) / 2
    xs = np.exp(-((np.arange(tile_w) - mid_x) ** 2) / (tile_w * tile_w) / (2 * var)) / math.sqrt(2 * math.pi * var)
    mid_y = tile_h / 2
    ys = np.exp(-((np.arange(tile_h) - mid_y) ** 2) / (tile_h * tile_h) / (2 * var)) / math.sqrt(2 * math.pi * var)
    return np.outer(ys, xs).astype(np.float32)


def tile_offsets(size: int, tile: int, overlap: int) -> List[int]:
    """Reference grid walk: ofs_r = r*(tile-overlap), last tile clamped to
    the border (ddpm.py:4205-4232)."""
    if size <= tile:
        return [0]
    stride = tile - overlap
    n = 0
    cur = 0
    while cur < size:
        cur = n * stride + tile
        n += 1
    offsets = [min(r * stride, size - tile) for r in range(n)]
    # clamp duplicates at the border
    seen, out = set(), []
    for o in offsets:
        if o not in seen:
            seen.add(o)
            out.append(o)
    return out


def make_tiled_denoise_fn(
    structcond_apply: Callable,
    unet_apply: Callable,
    struct_latent: jnp.ndarray,
    context: jnp.ndarray,
    tile: int = 64,
    overlap: int = 32,
    batch_tiles: int = 4,
) -> Callable:
    """Build a denoise_fn whose eps prediction is the gaussian-stitched
    combination of per-tile UNet evaluations — drop-in for
    ``core.diffusion.sample_video``.

    struct_latent: [(b t), H, W, 4] full-canvas LQ latent."""
    bt, H, W, C = struct_latent.shape
    # effective per-axis tile: canvases smaller than the nominal tile get
    # one whole-canvas tile on that axis (the reference only enters the
    # canvas path with latent > tile; we also serve sub-tile patches)
    tile_h = min(tile, H)
    tile_w = min(tile, W)
    oys = tile_offsets(H, tile_h, min(overlap, tile_h // 2))
    oxs = tile_offsets(W, tile_w, min(overlap, tile_w // 2))
    tiles = [(oy, ox) for oy in oys for ox in oxs]
    w2d = jnp.asarray(gaussian_tile_weights(tile_h, tile_w))[None, :, :, None]

    if len(tiles) == 1:
        def simple_fn(x, t_orig):
            s_cond = structcond_apply(struct_latent, t_orig)
            return unet_apply(x, t_orig, context, s_cond)

        return simple_fn

    # One UNet instance in the compiled program regardless of tile count:
    # lax.scan over tile chunks (the old unrolled chunk loop instantiated
    # the UNet once PER chunk — at 960px patches, 3 copies per sampling
    # step, which blew up compile memory). Chunks are padded to a full
    # batch with zero-weight dummy tiles.
    n_tiles = len(tiles)
    bt_sz = min(batch_tiles, n_tiles)
    n_pad = (-n_tiles) % bt_sz
    offs = np.asarray(list(tiles) + [(0, 0)] * n_pad, dtype=np.int32)
    mask = np.asarray([1.0] * n_tiles + [0.0] * n_pad, dtype=np.float32)
    n_chunks = offs.shape[0] // bt_sz
    offs_c = jnp.asarray(offs.reshape(n_chunks, bt_sz, 2))
    mask_c = jnp.asarray(mask.reshape(n_chunks, bt_sz))

    def fn(x, t_orig):
        acc0 = jnp.zeros_like(x)
        wacc0 = jnp.zeros((1, H, W, 1), dtype=x.dtype)

        def body(carry, chunk):
            acc, wacc = carry
            oo, mm = chunk  # [bt_sz, 2], [bt_sz]
            xs = jnp.concatenate(
                [jax.lax.dynamic_slice(
                    x, (0, oo[i, 0], oo[i, 1], 0), (bt, tile_h, tile_w, C))
                 for i in range(bt_sz)], 0)
            ss = jnp.concatenate(
                [jax.lax.dynamic_slice(
                    struct_latent, (0, oo[i, 0], oo[i, 1], 0),
                    (bt, tile_h, tile_w, C))
                 for i in range(bt_sz)], 0)
            tt = jnp.tile(t_orig, (bt_sz,))
            ctx = jnp.tile(context, (bt_sz, 1, 1))
            s_cond = structcond_apply(ss, tt)
            eps = unet_apply(xs, tt, ctx, s_cond)
            for i in range(bt_sz):
                e = eps[i * bt: (i + 1) * bt] * w2d * mm[i]
                cur = jax.lax.dynamic_slice(
                    acc, (0, oo[i, 0], oo[i, 1], 0),
                    (acc.shape[0], tile_h, tile_w, C))
                acc = jax.lax.dynamic_update_slice(
                    acc, cur + e.astype(acc.dtype),
                    (0, oo[i, 0], oo[i, 1], 0))
                wcur = jax.lax.dynamic_slice(
                    wacc, (0, oo[i, 0], oo[i, 1], 0), (1, tile_h, tile_w, 1))
                wacc = jax.lax.dynamic_update_slice(
                    wacc, wcur + (w2d * mm[i]).astype(wacc.dtype),
                    (0, oo[i, 0], oo[i, 1], 0))
            return (acc, wacc), None

        (acc, wacc), _ = jax.lax.scan(body, (acc0, wacc0), (offs_c, mask_c))
        return acc / wacc

    return fn


# ---------------------------------------------------------------------------
# Pixel-space splitting (ImageSpliterTh counterpart,
# /root/reference/scripts/util_image.py:686-769)
# ---------------------------------------------------------------------------


class ImageSpliter:
    """Split [T,H,W,C] frames into overlapping fixed-size patches; gather by
    overlap-averaging. Border patches are clamped to keep a single static
    patch shape (jit-friendly: one compiled program serves all patches)."""

    def __init__(self, shape: Tuple[int, ...], pch_size: int = 960,
                 stride: int = 750):
        t, h, w, c = shape
        self.shape = shape
        self.pch_size_h = min(pch_size, h)
        self.pch_size_w = min(pch_size, w)
        overlap_h = self.pch_size_h - min(stride, self.pch_size_h)
        overlap_w = self.pch_size_w - min(stride, self.pch_size_w)
        self.positions = [
            (oy, ox)
            for oy in tile_offsets(h, self.pch_size_h, overlap_h)
            for ox in tile_offsets(w, self.pch_size_w, overlap_w)
        ]

    def split(self, frames: jnp.ndarray) -> List[Tuple[jnp.ndarray, Tuple[int, int]]]:
        out = []
        for oy, ox in self.positions:
            out.append(
                (frames[:, oy : oy + self.pch_size_h, ox : ox + self.pch_size_w, :],
                 (oy, ox))
            )
        return out

    def gather(self, patches: Sequence[np.ndarray]) -> np.ndarray:
        t, h, w, c = self.shape
        acc = np.zeros((t, h, w, c), dtype=np.float32)
        cnt = np.zeros((1, h, w, 1), dtype=np.float32)
        for patch, (oy, ox) in zip(patches, self.positions):
            ph, pw = patch.shape[1:3]
            acc[:, oy : oy + ph, ox : ox + pw, :] += np.asarray(patch)
            cnt[:, oy : oy + ph, ox : ox + pw, :] += 1.0
        return acc / cnt
