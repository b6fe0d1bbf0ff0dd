"""Image quality metrics: PSNR / SSIM (MATLAB-parity), plus batched jnp
variants for on-device validation.

Capability parity: basicsr calculate_psnr/_pt, calculate_ssim/_pt
(/root/reference/basicsr/metrics/psnr_ssim.py:12-231) — [0,255] numpy with
crop_border and optional Y-channel, gaussian-windowed SSIM matching the
official MATLAB implementation.
"""
from __future__ import annotations

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

import jax.numpy as jnp
import jax


def rgb_to_y(img_255: np.ndarray) -> np.ndarray:
    """ITU-R BT.601 Y channel of an RGB [0,255] image (+16 offset),
    matching basicsr ``to_y_channel``."""
    img = img_255.astype(np.float64) / 255.0
    y = (
        img[..., 0] * 65.481 + img[..., 1] * 128.553 + img[..., 2] * 24.966
        + 16.0
    )
    return y[..., None]


def calculate_psnr(
    img: np.ndarray,
    img2: np.ndarray,
    crop_border: int = 0,
    test_y_channel: bool = False,
) -> float:
    """[0,255] HWC numpy images."""
    assert img.shape == img2.shape
    if crop_border:
        img = img[crop_border:-crop_border, crop_border:-crop_border]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border]
    if test_y_channel:
        img, img2 = rgb_to_y(img), rgb_to_y(img2)
    mse = np.mean((img.astype(np.float64) - img2.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    ax = np.arange(size) - size // 2
    g = np.exp(-(ax**2) / (2 * sigma**2))
    g = g / g.sum()
    return np.outer(g, g)


def _ssim_channel(img: np.ndarray, img2: np.ndarray) -> float:
    """Single-channel SSIM on [0,255], 11x11 gaussian window, valid crop —
    the MATLAB protocol."""
    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    img = img.astype(np.float64)
    img2 = img2.astype(np.float64)
    win = _gaussian_window()

    if cv2 is not None:
        f = lambda x: cv2.filter2D(x, -1, win)[5:-5, 5:-5]
    else:  # scipy fallback
        from scipy.ndimage import convolve

        f = lambda x: convolve(x, win)[5:-5, 5:-5]

    mu1 = f(img)
    mu2 = f(img2)
    mu1_sq, mu2_sq, mu12 = mu1**2, mu2**2, mu1 * mu2
    s1 = f(img**2) - mu1_sq
    s2 = f(img2**2) - mu2_sq
    s12 = f(img * img2) - mu12
    ssim_map = ((2 * mu12 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2)
    )
    return float(ssim_map.mean())


def calculate_ssim(
    img: np.ndarray,
    img2: np.ndarray,
    crop_border: int = 0,
    test_y_channel: bool = False,
) -> float:
    assert img.shape == img2.shape
    if crop_border:
        img = img[crop_border:-crop_border, crop_border:-crop_border]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border]
    if test_y_channel:
        img, img2 = rgb_to_y(img), rgb_to_y(img2)
    vals = [
        _ssim_channel(img[..., c], img2[..., c]) for c in range(img.shape[-1])
    ]
    return float(np.mean(vals))


# ---------------------------------------------------------------------------
# Batched on-device variants ([0,1] NHWC jnp) for validation loops
# ---------------------------------------------------------------------------


def psnr_jnp(a: jnp.ndarray, b: jnp.ndarray, crop_border: int = 0) -> jnp.ndarray:
    if crop_border:
        a = a[:, crop_border:-crop_border, crop_border:-crop_border]
        b = b[:, crop_border:-crop_border, crop_border:-crop_border]
    mse = jnp.mean((a - b) ** 2, axis=(1, 2, 3))
    return 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12))


def ssim_jnp(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched SSIM on [0,1] NHWC via depthwise gaussian convs."""
    c1 = 0.01**2
    c2 = 0.03**2
    win = jnp.asarray(_gaussian_window(), jnp.float32)
    c = a.shape[-1]
    kernel = jnp.tile(win[:, :, None, None], (1, 1, 1, c))

    def f(x):
        return jax.lax.conv_general_dilated(
            x, kernel, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    mu1, mu2 = f(a), f(b)
    mu1_sq, mu2_sq, mu12 = mu1**2, mu2**2, mu1 * mu2
    s1 = f(a * a) - mu1_sq
    s2 = f(b * b) - mu2_sq
    s12 = f(a * b) - mu12
    m = ((2 * mu12 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2)
    )
    return jnp.mean(m, axis=(1, 2, 3))
