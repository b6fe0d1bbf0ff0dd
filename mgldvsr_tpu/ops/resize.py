"""Image resizing as dense matrix products — the TPU-native resampler.

Instead of gather-based interpolation (slow, layout-hostile on TPU), every
1-D resample with *static* input/output sizes is a small dense matrix built
host-side in numpy; a 2-D resize is then two einsum contractions that map
straight onto the MXU and fuse with surrounding work under XLA.

Semantics match the resamplers the reference relies on
(``torch.nn.functional.interpolate`` / cv2): bicubic uses the Keys kernel
with a=-0.75, no antialiasing, ``align_corners=False`` by default (the
reference upscales LQ frames with bicubic interpolate:
/root/reference/ldm/models/diffusion/ddpm.py:3724-3730); ``area`` is adaptive
average pooling; ``bilinear`` is standard triangle interpolation. Antialiased
variants (torch ``antialias=True`` / cv2 INTER_AREA-like) are available via
``antialias=True``.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    w = np.where(
        ax <= 1.0,
        (a + 2) * ax3 - (a + 3) * ax2 + 1,
        np.where(ax < 2.0, a * ax3 - 5 * a * ax2 + 8 * a * ax - 4 * a, 0.0),
    )
    return w


def _linear_kernel(x: np.ndarray) -> np.ndarray:
    ax = np.abs(x)
    return np.maximum(0.0, 1.0 - ax)


@functools.lru_cache(maxsize=256)
def _resize_matrix(
    in_size: int,
    out_size: int,
    method: str,
    align_corners: bool,
    antialias: bool,
) -> np.ndarray:
    """Dense [out_size, in_size] resampling matrix (float32, rows sum to 1)."""
    if method == "nearest":
        idx = np.floor(np.arange(out_size) * in_size / out_size).astype(np.int64)
        m = np.zeros((out_size, in_size), dtype=np.float64)
        m[np.arange(out_size), np.clip(idx, 0, in_size - 1)] = 1.0
        return m.astype(np.float32)

    if method == "area":
        # Adaptive average pooling, torch semantics: bin i covers input rows
        # [floor(i*in/out), ceil((i+1)*in/out)) with *uniform* weights.
        m = np.zeros((out_size, in_size), dtype=np.float64)
        for i in range(out_size):
            j0 = (i * in_size) // out_size
            j1 = -((-(i + 1) * in_size) // out_size)  # ceil
            m[i, j0:j1] = 1.0
        m /= m.sum(axis=1, keepdims=True)
        return m.astype(np.float32)

    kernel = {"bicubic": _cubic_kernel, "bilinear": _linear_kernel}[method]
    support = {"bicubic": 2.0, "bilinear": 1.0}[method]

    if align_corners and out_size > 1:
        scale = (in_size - 1) / (out_size - 1)
        centers = np.arange(out_size) * scale
    else:
        scale = in_size / out_size
        centers = (np.arange(out_size) + 0.5) * scale - 0.5

    filt_scale = max(scale, 1.0) if (antialias and not align_corners) else 1.0
    eff_support = support * filt_scale

    m = np.zeros((out_size, in_size), dtype=np.float64)
    for i, c in enumerate(centers):
        j0 = int(np.floor(c - eff_support)) + 1
        j1 = int(np.floor(c + eff_support)) + 1
        js = np.arange(j0, j1)
        w = kernel((js - c) / filt_scale)
        # Reflect out-of-range taps onto the clamped border sample, matching
        # border-replicate behavior of torch/cv2 resize.
        js = np.clip(js, 0, in_size - 1)
        for j, wj in zip(js, w):
            m[i, j] += wj
    s = m.sum(axis=1, keepdims=True)
    s[s == 0] = 1.0
    m /= s
    return m.astype(np.float32)


def resize2d(
    x: jnp.ndarray,
    size: tuple[int, int],
    method: str = "bicubic",
    align_corners: bool = False,
    antialias: bool = False,
) -> jnp.ndarray:
    """Resize NHWC (or HWC / NTHWC via leading dims) images to ``size``.

    The last three axes are interpreted as (H, W, C). All other leading axes
    are batch. Matrices are cached per (in, out, method).
    """
    out_h, out_w = size
    h, w = x.shape[-3], x.shape[-2]
    if (h, w) == (out_h, out_w):
        return x
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    if h != out_h:
        mh = jnp.asarray(_resize_matrix(h, out_h, method, align_corners, antialias))
        xf = jnp.einsum("oh,...hwc->...owc", mh, xf)
    if w != out_w:
        mw = jnp.asarray(_resize_matrix(w, out_w, method, align_corners, antialias))
        xf = jnp.einsum("ow,...hwc->...hoc", mw, xf)
    return xf.astype(dtype)
