"""Color-fix postprocessing: transfer LQ color statistics onto SR output.

Capability parity with /root/reference/scripts/wavelet_color_fix.py:
- ``adain_color_fix``: per-channel moment transfer (adaptive instance norm).
- ``wavelet_color_fix``: content high-frequency + style low-frequency, where
  the low/high split is five levels of dilated 3x3 a-trous blurs.

TPU-first, channels-last: the blur is a depthwise dilated conv lowered by XLA
onto the conv units; replicate padding is an explicit edge pad.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from mgldvsr_tpu.core.diffusion import adaptive_instance_normalization

_WAVELET_KERNEL = jnp.asarray(
    [
        [0.0625, 0.125, 0.0625],
        [0.125, 0.25, 0.125],
        [0.0625, 0.125, 0.0625],
    ],
    dtype=jnp.float32,
)


def adain_color_fix(target: jnp.ndarray, source: jnp.ndarray) -> jnp.ndarray:
    """[N,H,W,C] in any range; returns target re-colored with source stats."""
    return adaptive_instance_normalization(target, source)


def wavelet_blur(image: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Depthwise 3x3 blur with dilation=radius and replicate padding."""
    n, h, w, c = image.shape
    pad = ((0, 0), (radius, radius), (radius, radius), (0, 0))
    x = jnp.pad(image, pad, mode="edge")
    kernel = jnp.tile(_WAVELET_KERNEL[:, :, None, None], (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        kernel,
        window_strides=(1, 1),
        padding="VALID",
        rhs_dilation=(radius, radius),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    ).astype(image.dtype)


def wavelet_decomposition(image: jnp.ndarray, levels: int = 5):
    """Split into (high_freq, low_freq) over dyadic blur radii 1..2^(L-1)."""
    high_freq = jnp.zeros_like(image)
    low_freq = image
    for i in range(levels):
        radius = 2**i
        blurred = wavelet_blur(low_freq, radius)
        high_freq = high_freq + (low_freq - blurred)
        low_freq = blurred
    return high_freq, low_freq


def wavelet_color_fix(target: jnp.ndarray, source: jnp.ndarray) -> jnp.ndarray:
    """content high-freq + style low-freq."""
    content_high, _ = wavelet_decomposition(target)
    _, style_low = wavelet_decomposition(source)
    return content_high + style_low


def apply_colorfix(
    output: jnp.ndarray, reference_lq: jnp.ndarray, kind: str = "adain"
) -> jnp.ndarray:
    if kind == "adain":
        return adain_color_fix(output, reference_lq)
    if kind == "wavelet":
        return wavelet_color_fix(output, reference_lq)
    if kind in ("none", "nofix", None):
        return output
    raise ValueError(f"unknown colorfix type {kind!r}")
