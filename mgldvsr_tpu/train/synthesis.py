"""On-device Real-ESRGAN-style two-stage synthesis degradation.

Capability parity with the reference's GPU-side degradation paths
(``get_input_synthesis``, /root/reference/ldm/models/autoencoder.py:
1773-1938 and LatentDiffusionSRTextWT.get_input, ddpm.py:1912-2117):
USM-sharpened GT -> blur(kernel1) -> random resize -> gaussian/poisson
noise -> JPEG -> [blur(kernel2)] -> resize toward gt/sf -> noise -> JPEG ->
final sinc, all on device and batched.

TPU-first redesign: XLA forbids data-dependent shapes, so the reference's
free-scale ``F.interpolate`` becomes a **bucketed scale-space resample** —
K static scale buckets, each a down-up matrix-resample composition back to
the fixed working size, selected per clip with ``lax.switch``. All random
branch decisions are traced (both noise flavors are computed and selected),
so one compiled program serves every sample. Blur kernels are synthesized
host-side per clip (as the reference's dataset does) and passed in.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from mgldvsr_tpu.data.blur_kernels import (
    circular_lowpass_kernel,
    make_kernel,
)
from mgldvsr_tpu.ops.diffjpeg import diff_jpeg
from mgldvsr_tpu.ops.img_process import (
    filter2d,
    random_add_gaussian_noise,
    random_add_poisson_noise,
    usm_sharp,
)
from mgldvsr_tpu.ops.resize import resize2d


@dataclasses.dataclass(frozen=True)
class SynthesisConfig:
    """Defaults mirror the mgldvsr degradation: block (yaml:122-143)."""

    sf: int = 4
    resize_prob: Tuple[float, float, float] = (0.2, 0.7, 0.1)
    resize_range: Tuple[float, float] = (0.15, 1.5)
    gaussian_noise_prob: float = 0.5
    noise_range: Tuple[float, float] = (1, 30)
    poisson_scale_range: Tuple[float, float] = (0.05, 3.0)
    gray_noise_prob: float = 0.4
    jpeg_range: Tuple[float, float] = (30, 95)
    second_blur_prob: float = 0.8
    resize_prob2: Tuple[float, float, float] = (0.3, 0.4, 0.3)
    resize_range2: Tuple[float, float] = (0.3, 1.2)
    gaussian_noise_prob2: float = 0.5
    noise_range2: Tuple[float, float] = (1, 25)
    poisson_scale_range2: Tuple[float, float] = (0.05, 2.5)
    gray_noise_prob2: float = 0.4
    jpeg_range2: Tuple[float, float] = (30, 95)
    final_sinc_prob: float = 0.8
    n_scale_buckets: int = 7
    use_usm: bool = True


def sample_degradation_kernels(
    rng: np.random.RandomState,
    kernel_sizes=(7, 9, 11, 13, 15, 17, 19, 21),
    kernel_list=("iso", "aniso", "generalized_iso", "generalized_aniso",
                 "plateau_iso", "plateau_aniso", "sinc"),
    kernel_prob=(0.405, 0.225, 0.108, 0.027, 0.108, 0.027, 0.1),
    sinc_prob: float = 0.1,
    pad_to: int = 21,
) -> Dict[str, np.ndarray]:
    """Host-side per-clip kernel synthesis (the RealESRGANRecurrentDataset
    kernel path): kernel1, kernel2, sinc_kernel, all padded to a static
    size so the device program is shape-stable."""

    def one(sigma_hi):
        ktype = rng.choice(kernel_list, p=kernel_prob)
        ksize = int(rng.choice(kernel_sizes))
        k = make_kernel(
            ktype, ksize,
            sigma_x=rng.uniform(0.2, sigma_hi),
            sigma_y=rng.uniform(0.2, sigma_hi),
            rotate_angle=rng.uniform(-np.pi, np.pi),
            beta_gaussian=rng.uniform(0.5, 4),
            beta_plateau=rng.uniform(1, 2),
            omega=rng.uniform(np.pi / 3, np.pi),
        )
        pad = (pad_to - ksize) // 2
        return np.pad(k, ((pad, pad), (pad, pad)))

    if rng.uniform() < sinc_prob:
        ksize = int(rng.choice(kernel_sizes))
        omega = rng.uniform(np.pi / 3 if ksize < 13 else np.pi / 5, np.pi)
        sinc = circular_lowpass_kernel(omega, ksize, pad_to=pad_to)
    else:
        sinc = np.zeros((pad_to, pad_to), np.float32)
        sinc[pad_to // 2, pad_to // 2] = 1.0
    return {
        "kernel1": one(3.0).astype(np.float32),
        "kernel2": one(1.5).astype(np.float32),
        "sinc_kernel": sinc.astype(np.float32),
    }


def _bucketed_rescale(x, key, prob, scale_range, n_buckets):
    """Scale-space resample at one of n static scale buckets (down-up back
    to the input size), selected by a traced index. mode 'keep' is bucket
    with scale 1."""
    h, w = x.shape[1:3]
    lo, hi = scale_range
    scales = np.concatenate([
        np.linspace(lo, 0.999, n_buckets // 2),       # down buckets
        [1.0],
        np.linspace(1.001, hi, n_buckets - n_buckets // 2 - 1),
    ])
    k_mode, k_pick, k_m2 = jax.random.split(key, 3)
    u = jax.random.uniform(k_mode)
    p_up, p_down, _ = prob
    mode = jnp.where(u < p_up, 0, jnp.where(u < p_up + p_down, 1, 2))

    down_idx = jax.random.randint(k_pick, (), 0, n_buckets // 2)
    up_idx = jax.random.randint(
        k_pick, (), n_buckets // 2 + 1, len(scales))
    keep_idx = jnp.asarray(n_buckets // 2)
    idx = jnp.where(mode == 0, up_idx, jnp.where(mode == 1, down_idx, keep_idx))

    methods = ["area", "bilinear", "bicubic"]
    m_idx = jax.random.randint(k_m2, (), 0, 3)

    def branch(scale):
        sh, sw = max(int(h * scale), 1), max(int(w * scale), 1)

        def with_method(m):
            if scale == 1.0:
                return lambda z: z
            return lambda z: resize2d(
                resize2d(z, (sh, sw), method=m), (h, w), method=m)

        return lambda z: jax.lax.switch(
            m_idx, [with_method(m) for m in methods], z)

    branches = [branch(float(s)) for s in scales]
    return jax.lax.switch(idx, branches, x)


def synthesize_lq(
    rng: jax.Array,
    gt_01: jnp.ndarray,
    kernels: Dict[str, jnp.ndarray],
    cfg: SynthesisConfig = SynthesisConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """gt_01: [N,H,W,3] (H,W multiples of 16*sf). Returns (lq, gt_usm)
    with lq at [N, H/sf, W/sf, 3]."""
    keys = jax.random.split(rng, 12)
    n, h, w, _ = gt_01.shape
    gt = usm_sharp(gt_01) if cfg.use_usm else gt_01

    # ---- stage 1
    out = filter2d(gt, kernels["kernel1"])
    out = _bucketed_rescale(out, keys[0], cfg.resize_prob, cfg.resize_range,
                            cfg.n_scale_buckets)
    g = random_add_gaussian_noise(keys[1], out, cfg.noise_range,
                                  cfg.gray_noise_prob)
    p = random_add_poisson_noise(keys[2], out, cfg.poisson_scale_range,
                                 cfg.gray_noise_prob)
    use_g = jax.random.uniform(keys[3]) < cfg.gaussian_noise_prob
    out = jnp.where(use_g, g, p)
    q = jax.random.uniform(keys[4], (n,), minval=cfg.jpeg_range[0],
                           maxval=cfg.jpeg_range[1])
    out = diff_jpeg(jnp.clip(out, 0, 1), q)

    # ---- stage 2
    blur2 = filter2d(out, kernels["kernel2"])
    do_blur2 = jax.random.uniform(keys[5]) < cfg.second_blur_prob
    out = jnp.where(do_blur2, blur2, out)
    out = _bucketed_rescale(out, keys[6], cfg.resize_prob2,
                            cfg.resize_range2, cfg.n_scale_buckets)
    g = random_add_gaussian_noise(keys[7], out, cfg.noise_range2,
                                  cfg.gray_noise_prob2)
    p = random_add_poisson_noise(keys[8], out, cfg.poisson_scale_range2,
                                 cfg.gray_noise_prob2)
    use_g = jax.random.uniform(keys[9]) < cfg.gaussian_noise_prob2
    out = jnp.where(use_g, g, p)

    # final: resize to gt/sf + sinc filter + JPEG (order randomized in the
    # reference; we apply resize->sinc->jpeg, the majority branch)
    lq_h, lq_w = h // cfg.sf, w // cfg.sf
    out = resize2d(out, (lq_h, lq_w), method="bicubic")
    out = filter2d(out, kernels["sinc_kernel"])
    q2 = jax.random.uniform(keys[10], (n,), minval=cfg.jpeg_range2[0],
                            maxval=cfg.jpeg_range2[1])
    out = diff_jpeg(jnp.clip(out, 0, 1), q2)

    # quantize to uint8 levels like the reference's final rounding
    out = jnp.round(jnp.clip(out, 0, 1) * 255.0) / 255.0
    return out, gt
