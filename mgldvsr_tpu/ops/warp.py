"""Optical-flow warping (backward bilinear sampling) — the hot inner op of
motion-guided sampling.

TPU-native design: there is no ``grid_sample`` primitive on TPU, so the warp
is expressed as four clipped gathers + bilinear blending, which XLA lowers to
dynamic-gathers that fuse with the surrounding elementwise work, and which is
trivially differentiable (``jax.grad`` through it powers motion guidance —
no autograd-inside-no-grad hack as in the reference sampler,
/root/reference/ldm/models/diffusion/ddpm.py:4359-4374). A fused Pallas kernel
for the full guidance inner loop lives in ``mgldvsr_tpu.ops.pallas.flow_warp``.

Conventions match the reference (basicsr ``flow_warp``,
/root/reference/basicsr/archs/arch_util.py:156-194): ``x`` is NHWC,
``flow`` is [N, H, W, 2] with ``flow[..., 0]`` the x (width) displacement and
``flow[..., 1]`` the y displacement, sampled with align_corners=True semantics
and zero padding outside the image.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from mgldvsr_tpu.ops.resize import resize2d


def flow_warp(
    x: jnp.ndarray,
    flow: jnp.ndarray,
    interp_mode: str = "bilinear",
    padding_mode: str = "zeros",
    return_mask: bool = False,
):
    """Backward-warp ``x`` [N,H,W,C] by ``flow`` [N,H,W,2].

    output(p) = x(p + flow(p)) with bilinear interpolation; samples that fall
    outside the image contribute zeros (padding_mode='zeros') or clamp to the
    border (padding_mode='border').
    """
    n, h, w, c = x.shape
    assert flow.shape[:3] == (n, h, w) and flow.shape[3] == 2

    gx = jnp.arange(w, dtype=flow.dtype)[None, None, :]
    gy = jnp.arange(h, dtype=flow.dtype)[None, :, None]
    px = gx + flow[..., 0]  # [N,H,W] sample x-coordinate
    py = gy + flow[..., 1]

    if interp_mode == "nearest":
        ix = jnp.round(px).astype(jnp.int32)
        iy = jnp.round(py).astype(jnp.int32)
        valid = (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
        out = _gather2d(x, iy, ix)
        if padding_mode == "zeros":
            out = out * valid[..., None].astype(x.dtype)
        if return_mask:
            return out, valid[..., None].astype(x.dtype)
        return out

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    tx = (px - x0).astype(x.dtype)[..., None]
    ty = (py - y0).astype(x.dtype)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    if padding_mode == "border":
        # clamp the integer base so both taps read valid (border) texels
        x0b = jnp.clip(x0i, 0, w - 1)
        x1b = jnp.clip(x0i + 1, 0, w - 1)
        y0b = jnp.clip(y0i, 0, h - 1)
        y1b = jnp.clip(y0i + 1, 0, h - 1)
        v00 = _gather2d(x, y0b, x0b)
        v01 = _gather2d(x, y0b, x1b)
        v10 = _gather2d(x, y1b, x0b)
        v11 = _gather2d(x, y1b, x1b)
        # border mode also clamps the blend weights implicitly via clamped
        # sample positions; torch additionally clamps the continuous coords
        txc = jnp.clip(px, 0, w - 1)
        tyc = jnp.clip(py, 0, h - 1)
        tx = (txc - jnp.floor(txc))[..., None].astype(x.dtype)
        ty = (tyc - jnp.floor(tyc))[..., None].astype(x.dtype)
        top = v00 * (1 - tx) + v01 * tx
        bot = v10 * (1 - tx) + v11 * tx
        out = top * (1 - ty) + bot * ty
    else:
        # zeros padding: ONE (2,2,C) block slice per pixel on a padded map
        # (coalesced) instead of four elementwise gathers; clamped far-out
        # centers land entirely inside the zero padding (exact semantics).
        pad = 2
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        x0c = jnp.clip(x0i, -2, w + 1) + pad
        y0c = jnp.clip(y0i, -2, h + 1) + pad

        def slice_one(img, yy, xx):
            return jax.lax.dynamic_slice(img, (yy, xx, 0), (2, 2, c))

        flat_y = y0c.reshape(n, h * w)
        flat_x = x0c.reshape(n, h * w)
        patch = jax.vmap(jax.vmap(slice_one, in_axes=(None, 0, 0)))(
            xp, flat_y, flat_x
        ).reshape(n, h, w, 2, 2, c)
        top = patch[..., 0, 0, :] * (1 - tx) + patch[..., 0, 1, :] * tx
        bot = patch[..., 1, 0, :] * (1 - tx) + patch[..., 1, 1, :] * tx
        out = top * (1 - ty) + bot * ty

    if return_mask:
        # Bilinearly-sampled ones-image thresholded at ~1 (only fully interior
        # samples survive), matching the reference's return_mask variant.
        in00 = ((x0i >= 0) & (x0i <= w - 1) & (y0i >= 0) & (y0i <= h - 1))
        in01 = ((x0i + 1 >= 0) & (x0i + 1 <= w - 1) & (y0i >= 0) & (y0i <= h - 1))
        in10 = ((x0i >= 0) & (x0i <= w - 1) & (y0i + 1 >= 0) & (y0i + 1 <= h - 1))
        in11 = ((x0i + 1 >= 0) & (x0i + 1 <= w - 1) & (y0i + 1 >= 0) & (y0i + 1 <= h - 1))
        f = lambda b: b.astype(x.dtype)[..., None]
        ones = (f(in00) * (1 - tx) + f(in01) * tx) * (1 - ty) + (
            f(in10) * (1 - tx) + f(in11) * tx
        ) * ty
        mask = (ones >= 0.9999).astype(x.dtype)
        return out, mask
    return out


def _gather2d(x: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """Gather x[n, iy[n,h,w], ix[n,h,w], :] -> [N,H,W,C] with clipped indices."""
    n, h, w, c = x.shape
    iy = jnp.clip(iy, 0, h - 1)
    ix = jnp.clip(ix, 0, w - 1)
    flat = x.reshape(n, h * w, c)
    idx = iy * w + ix  # [N,H,W]
    out = jnp.take_along_axis(flat, idx.reshape(n, h * w, 1), axis=1)
    return out.reshape(n, h, w, c)


def resize_flow(
    flow: jnp.ndarray,
    size_type: str,
    sizes,
    interp_mode: str = "bilinear",
    align_corners: bool = False,
) -> jnp.ndarray:
    """Resize a flow field [N,H,W,2] and rescale its displacement magnitudes.

    Matches /root/reference/basicsr/archs/arch_util.py:235-270 (channels-last
    here): components are multiplied by the respective spatial ratio *before*
    interpolation.
    """
    n, h, w, _ = flow.shape
    if size_type == "ratio":
        out_h, out_w = int(h * sizes[0]), int(w * sizes[1])
    elif size_type == "shape":
        out_h, out_w = int(sizes[0]), int(sizes[1])
    else:
        raise ValueError(f"size_type must be ratio or shape, got {size_type}")
    ratio_w = out_w / w
    ratio_h = out_h / h
    scaled = flow * jnp.asarray([ratio_w, ratio_h], dtype=flow.dtype)
    return resize2d(scaled, (out_h, out_w), method=interp_mode, align_corners=align_corners)
