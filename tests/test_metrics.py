"""Metric tests: PSNR/SSIM vs skimage/analytic values, FID sanity, NIQE
machinery, E*warp on synthetic motion."""
import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from mgldvsr_tpu.metrics import (
    calculate_fid,
    calculate_activation_statistics,
    calculate_psnr,
    calculate_ssim,
    calculate_ewarp,
    psnr_jnp,
    ssim_jnp,
)
from mgldvsr_tpu.metrics.niqe import (
    calculate_niqe,
    compute_feature,
    estimate_aggd_param,
    niqe_core,
)


def test_psnr_analytic():
    a = np.zeros((32, 32, 3))
    b = np.full((32, 32, 3), 10.0)
    # mse=100 -> psnr = 10*log10(255^2/100)
    assert abs(calculate_psnr(a, b) - 10 * np.log10(255**2 / 100)) < 1e-9
    assert calculate_psnr(a, a) == float("inf")
    # crop border changes nothing for constant error
    assert abs(calculate_psnr(a, b, crop_border=4) - calculate_psnr(a, b)) < 1e-9


def test_ssim_identity_and_degradation():
    rs = np.random.RandomState(0)
    img = (rs.rand(64, 64, 3) * 255).astype(np.float64)
    assert calculate_ssim(img, img) > 0.9999
    noisy = np.clip(img + rs.randn(64, 64, 3) * 25, 0, 255)
    v = calculate_ssim(img, noisy)
    assert 0.05 < v < 0.95


def test_jnp_variants_match_numpy():
    rs = np.random.RandomState(1)
    a = rs.rand(1, 48, 48, 3).astype(np.float32)
    b = np.clip(a + rs.randn(1, 48, 48, 3).astype(np.float32) * 0.05, 0, 1)
    p_np = calculate_psnr(a[0] * 255, b[0] * 255)
    p_j = float(psnr_jnp(jnp.asarray(a), jnp.asarray(b))[0])
    assert abs(p_np - p_j) < 0.02
    s_np = calculate_ssim(a[0] * 255, b[0] * 255)
    s_j = float(ssim_jnp(jnp.asarray(a), jnp.asarray(b))[0])
    assert abs(s_np - s_j) < 0.02


def test_fid_zero_for_identical_and_positive_for_shifted():
    rs = np.random.RandomState(2)
    f1 = rs.randn(500, 16)
    mu1, s1 = calculate_activation_statistics(f1)
    assert abs(calculate_fid(mu1, s1, mu1, s1)) < 1e-6
    f2 = f1 + 3.0
    mu2, s2 = calculate_activation_statistics(f2)
    d = calculate_fid(mu1, s1, mu2, s2)
    assert abs(d - 9 * 16) < 1.0  # ||diff||^2 = 16 * 9


def test_aggd_recovers_gaussian_alpha():
    rs = np.random.RandomState(3)
    block = rs.randn(96, 96)
    alpha, bl, br = estimate_aggd_param(block)
    # gaussian => alpha ~ 2
    assert 1.6 < alpha < 2.4
    assert abs(bl - br) < 0.3
    feats = compute_feature(block)
    assert len(feats) == 18


def test_niqe_core_runs():
    rs = np.random.RandomState(4)
    img = rs.rand(192, 192) * 255
    mu = np.zeros(36)
    cov = np.eye(36)
    v = niqe_core(img, mu, cov)
    assert np.isfinite(v) and v >= 0


def test_ewarp_static_vs_noisy():
    rs = np.random.RandomState(5)
    frame = rs.rand(32, 32, 3).astype(np.float32)
    static = np.stack([frame] * 4)

    def zero_flownet(a, b):
        return jnp.zeros(a.shape[:3] + (2,))

    e_static = calculate_ewarp(static, zero_flownet)
    assert e_static < 1e-10

    noisy = np.clip(
        static + rs.randn(4, 32, 32, 3).astype(np.float32) * 0.1, 0, 1
    )
    e_noisy = calculate_ewarp(noisy, zero_flownet)
    assert e_noisy > 1e-4


def test_fit_niqe_params_and_score_roundtrip(tmp_path):
    """Fit a pristine model from synthetic natural-ish images, save, and
    score through calculate_niqe: pristine-like images must score lower
    (better) than heavily degraded ones under the fitted model."""
    from mgldvsr_tpu.metrics.niqe import fit_niqe_params

    rs = np.random.RandomState(0)

    def natural(seed):
        rs = np.random.RandomState(seed)
        base = rs.rand(24, 24) * 255
        img = cv2.resize(base, (192, 192), interpolation=cv2.INTER_CUBIC)
        return np.clip(img + rs.randn(192, 192) * 2, 0, 255)

    pristine = [natural(i) for i in range(6)]
    path = str(tmp_path / "pris.npz")
    mu, cov, gw = fit_niqe_params(pristine, path)
    assert mu.shape == (36,) and cov.shape == (36, 36) and gw.shape == (7, 7)

    good = natural(100)[..., None].repeat(3, axis=2)
    blocky = natural(101)
    blocky = cv2.resize(cv2.resize(blocky, (24, 24),
                                   interpolation=cv2.INTER_NEAREST),
                        (192, 192), interpolation=cv2.INTER_NEAREST)
    bad = blocky[..., None].repeat(3, axis=2)
    s_good = calculate_niqe(good, params_path=path)
    s_bad = calculate_niqe(bad, params_path=path)
    assert np.isfinite(s_good) and np.isfinite(s_bad)
    assert s_good < s_bad
