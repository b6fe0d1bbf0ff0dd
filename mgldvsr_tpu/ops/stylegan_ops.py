"""StyleGAN2 resampling/activation ops — TPU-native.

Capability parity with the reference's compiled CUDA extensions
``fused_act_ext`` (fused bias + LeakyReLU + √2 gain,
/root/reference/basicsr/ops/fused_act/fused_act.py:8-27) and
``upfirdn2d_ext`` (upsample-FIR-downsample,
basicsr/ops/upfirdn2d/upfirdn2d.py:8-27).

On TPU these fuse under XLA: fused_leaky_relu is three elementwise ops; an
upfirdn is zero-stuffing + pad + a depthwise conv + strided slice.
"""
from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def fused_leaky_relu(
    x: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    negative_slope: float = 0.2,
    scale: float = 2**0.5,
) -> jnp.ndarray:
    if bias is not None:
        x = x + bias
    return jax.nn.leaky_relu(x, negative_slope) * scale


def make_resample_kernel(k: Sequence[float]) -> np.ndarray:
    """1-D taps -> normalized 2-D separable FIR kernel ([1,3,3,1] etc.)."""
    k1 = np.asarray(k, dtype=np.float32)
    kern = np.outer(k1, k1)
    return kern / kern.sum()


def upfirdn2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    up: int = 1,
    down: int = 1,
    pad: Tuple[int, int] = (0, 0),
) -> jnp.ndarray:
    """x: [N,H,W,C]. Upsample by zero-stuffing, pad, depthwise-FIR, then
    downsample by striding — the upfirdn2d contract."""
    n, h, w, c = x.shape
    kh, kw = kernel.shape
    if up > 1:
        z = jnp.zeros((n, h, up, w, up, c), dtype=x.dtype)
        z = z.at[:, :, 0, :, 0, :].set(x)
        x = z.reshape(n, h * up, w * up, c)
    p0, p1 = pad
    x = jnp.pad(
        x,
        ((0, 0), (max(p0, 0), max(p1, 0)), (max(p0, 0), max(p1, 0)), (0, 0)),
    )
    if p0 < 0 or p1 < 0:
        x = x[:, max(-p0, 0) : x.shape[1] - max(-p1, 0),
              max(-p0, 0) : x.shape[2] - max(-p1, 0), :]
    kern = jnp.tile(kernel[::-1, ::-1][:, :, None, None], (1, 1, 1, c))
    out = jax.lax.conv_general_dilated(
        x, kern.astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
    if down > 1:
        out = out[:, ::down, ::down, :]
    return out


def upsample2x(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """StyleGAN2 Upsample: factor-normalized FIR after zero-stuffing."""
    kh = kernel.shape[0]
    pad = ((kh + 1) // 2 + 1 - 1, (kh - 1) // 2)
    return upfirdn2d(x, kernel * 4.0, up=2, down=1,
                     pad=(pad[0], pad[1]))


def downsample2x(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    kh = kernel.shape[0]
    pad = ((kh - 2 + 1) // 2, (kh - 2) // 2)
    return upfirdn2d(x, kernel, up=1, down=2, pad=pad)
