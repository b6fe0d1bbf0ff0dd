"""On-device image processing ops for the synthesis degradation path.

Capability parity with basicsr img_process_util + degradations GPU helpers
(/root/reference/basicsr/utils/img_process_util.py:7-83,
basicsr/data/degradations.py:510-784): batched filter2D with per-sample
kernels, USM sharpening, and device-side gaussian/poisson noise.

TPU-first: per-sample kernels become a grouped conv (batch folded into
feature groups); noise uses jax.random keys.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def filter2d(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """img [N,H,W,C]; kernel [k,k], [1,k,k] or [N,k,k] (per-sample).

    Reflect padding, matching cv2/torch filter2D semantics."""
    n, h, w, c = img.shape
    if kernel.ndim == 2:
        kernel = kernel[None]
    k = kernel.shape[-1]
    assert k % 2 == 1, "kernel size must be odd"
    pad = k // 2
    x = jnp.pad(img, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")

    if kernel.shape[0] == 1:
        kern = jnp.tile(kernel[0][:, :, None, None], (1, 1, 1, c)).astype(img.dtype)
        return jax.lax.conv_general_dilated(
            x, kern, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )
    # per-sample kernels: fold batch into channels, one grouped conv
    xx = x.transpose(1, 2, 0, 3).reshape(1, h + 2 * pad, w + 2 * pad, n * c)
    kern = jnp.repeat(kernel, c, axis=0)  # [n*c, k, k]
    kern = kern.transpose(1, 2, 0)[:, :, None, :].astype(img.dtype)
    out = jax.lax.conv_general_dilated(
        xx, kern, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=n * c,
    )
    return out.reshape(h, w, n, c).transpose(2, 0, 1, 3)


def _gaussian_kernel1d(size: int, sigma: float) -> jnp.ndarray:
    ax = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(ax**2) / (2 * sigma**2))
    return g / g.sum()


def usm_sharp(
    img: jnp.ndarray, weight: float = 0.5, radius: int = 50,
    threshold: float = 10.0,
) -> jnp.ndarray:
    """USM sharpening (img_process_util.py:34-60): residual vs gaussian
    blur, hard mask where |residual|*255 > threshold, mask softened by the
    same blur. img: [N,H,W,C] in [0,1]."""
    if radius % 2 == 0:
        radius += 1
    sigma = 0.3 * ((radius - 1) * 0.5 - 1) + 0.8  # cv2 default sigma rule
    g1 = _gaussian_kernel1d(radius, sigma)
    kern = jnp.outer(g1, g1)
    blur = filter2d(img, kern)
    residual = img - blur
    mask = (jnp.abs(residual) * 255.0 > threshold).astype(img.dtype)
    soft_mask = filter2d(mask, kern)
    sharp = jnp.clip(img + weight * residual, 0.0, 1.0)
    return soft_mask * sharp + (1.0 - soft_mask) * img


def random_add_gaussian_noise(
    rng: jax.Array,
    img: jnp.ndarray,
    sigma_range: Tuple[float, float] = (0, 10),
    gray_prob: float = 0.0,
    clip: bool = True,
) -> jnp.ndarray:
    """Per-sample sigma in [lo,hi]/255, channel-shared (gray) with prob."""
    n, h, w, c = img.shape
    k_s, k_g, k_n = jax.random.split(rng, 3)
    sigma = jax.random.uniform(
        k_s, (n, 1, 1, 1), minval=sigma_range[0], maxval=sigma_range[1]
    ) / 255.0
    gray = (jax.random.uniform(k_g, (n, 1, 1, 1)) < gray_prob).astype(img.dtype)
    noise_c = jax.random.normal(k_n, img.shape, img.dtype)
    noise_g = jnp.mean(noise_c, axis=-1, keepdims=True)  # shared across ch
    noise = gray * noise_g + (1 - gray) * noise_c
    out = img + noise * sigma
    return jnp.clip(out, 0, 1) if clip else out


def random_add_poisson_noise(
    rng: jax.Array,
    img: jnp.ndarray,
    scale_range: Tuple[float, float] = (0, 1.0),
    gray_prob: float = 0.0,
    clip: bool = True,
) -> jnp.ndarray:
    """Gaussian approximation of shot noise (differentiable, TPU-friendly):
    var = img/vals with vals=2^10 quantization levels — statistically
    equivalent to the reference's poisson sampling for training."""
    n = img.shape[0]
    k_s, k_g, k_n = jax.random.split(rng, 3)
    scale = jax.random.uniform(
        k_s, (n, 1, 1, 1), minval=scale_range[0], maxval=scale_range[1]
    )
    gray = (jax.random.uniform(k_g, (n, 1, 1, 1)) < gray_prob).astype(img.dtype)
    vals = 2.0**10
    base = jnp.clip(img, 0, 1)
    lum = jnp.mean(base, axis=-1, keepdims=True)
    std_c = jnp.sqrt(base / vals)
    std_g = jnp.sqrt(lum / vals)
    g = jax.random.normal(k_n, img.shape, img.dtype)
    noise = gray * jnp.mean(g, axis=-1, keepdims=True) * std_g + (1 - gray) * g * std_c
    out = img + noise * scale
    return jnp.clip(out, 0, 1) if clip else out
