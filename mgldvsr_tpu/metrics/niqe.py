"""NIQE no-reference quality metric.

Capability parity with basicsr ``calculate_niqe``
(/root/reference/basicsr/metrics/niqe.py:68-199): MSCN coefficients, AGGD
feature fits over 96x96 blocks at two scales, Mahalanobis-style distance to
a pristine multivariate-Gaussian model. The pristine model parameters
(``niqe_pris_params.npz``: mu_pris_param, cov_pris_param, gaussian_window)
are fitted offline on pristine images and must be supplied via
``params_path`` — they are data, not code, and are not bundled here.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np
from scipy.special import gamma

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


_GAMMA_RANGE = np.arange(0.2, 10.001, 0.001)
_R_GAM = (gamma(2.0 / _GAMMA_RANGE) ** 2) / (
    gamma(1.0 / _GAMMA_RANGE) * gamma(3.0 / _GAMMA_RANGE)
)


def estimate_aggd_param(block: np.ndarray) -> Tuple[float, float, float]:
    """Fit an asymmetric generalized Gaussian: (alpha, beta_l, beta_r)."""
    block = block.flatten()
    left_std = np.sqrt(np.mean(block[block < 0] ** 2)) if (block < 0).any() else 0.0
    right_std = np.sqrt(np.mean(block[block > 0] ** 2)) if (block > 0).any() else 0.0
    gammahat = left_std / right_std if right_std > 0 else np.inf
    rhat = (np.mean(np.abs(block))) ** 2 / np.mean(block**2) if np.mean(block**2) > 0 else 0.0
    rhatnorm = (rhat * (gammahat**3 + 1) * (gammahat + 1)) / (
        (gammahat**2 + 1) ** 2
    ) if np.isfinite(gammahat) else 0.0
    array_position = np.argmin((_R_GAM - rhatnorm) ** 2)
    alpha = _GAMMA_RANGE[array_position]
    beta_l = left_std * np.sqrt(gamma(1 / alpha) / gamma(3 / alpha))
    beta_r = right_std * np.sqrt(gamma(1 / alpha) / gamma(3 / alpha))
    return float(alpha), float(beta_l), float(beta_r)


def compute_feature(block: np.ndarray) -> list:
    """18 NIQE features: AGGD of the block + 4 paired products."""
    feat = []
    alpha, beta_l, beta_r = estimate_aggd_param(block)
    feat.extend([alpha, (beta_l + beta_r) / 2])
    shifts = [(0, 1), (1, 0), (1, 1), (1, -1)]
    for dy, dx in shifts:
        shifted = np.roll(block, (dy, dx), axis=(0, 1))
        alpha, beta_l, beta_r = estimate_aggd_param(block * shifted)
        mean = (beta_r - beta_l) * (gamma(2 / alpha) / gamma(1 / alpha))
        feat.extend([alpha, mean, beta_l, beta_r])
    return feat


def _default_gaussian_window() -> np.ndarray:
    """7x7 gaussian (sigma=7/6), the MATLAB fspecial('gaussian',7,7/6)."""
    ax = np.arange(7) - 3
    g = np.exp(-(ax**2) / (2 * (7.0 / 6.0) ** 2))
    w = np.outer(g, g)
    return (w / w.sum()).astype(np.float64)


def _image_features(
    img: np.ndarray,
    block_size_h: int = 96,
    block_size_w: int = 96,
    gaussian_window: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Per-block 36-dim NIQE features (both scales) for one gray [0,255]
    image — the single feature path shared by scoring (:func:`niqe_core`)
    and pristine-model fitting (:func:`fit_niqe_params`)."""
    assert cv2 is not None, "cv2 required for NIQE"
    if gaussian_window is None:
        gaussian_window = _default_gaussian_window()
    h, w = img.shape
    num_block_h = math.floor(h / block_size_h)
    num_block_w = math.floor(w / block_size_w)
    img = img[: num_block_h * block_size_h, : num_block_w * block_size_w]
    distparam = []
    for scale in (1, 2):
        mu = cv2.filter2D(img, -1, gaussian_window,
                          borderType=cv2.BORDER_REPLICATE)
        sigma = np.sqrt(np.abs(
            cv2.filter2D(img**2, -1, gaussian_window,
                         borderType=cv2.BORDER_REPLICATE) - mu**2))
        img_norm = (img - mu) / (sigma + 1)
        bh = block_size_h // scale
        bw = block_size_w // scale
        feats = [
            compute_feature(
                img_norm[i * bh : (i + 1) * bh, j * bw : (j + 1) * bw])
            for i in range(num_block_h) for j in range(num_block_w)
        ]
        distparam.append(np.array(feats))
        if scale == 1:
            img = cv2.resize(img / 255.0, (w // 2, h // 2),
                             interpolation=cv2.INTER_LINEAR) * 255.0
    return np.concatenate(distparam, axis=1)


def niqe_core(
    img: np.ndarray,
    mu_pris: np.ndarray,
    cov_pris: np.ndarray,
    gaussian_window: Optional[np.ndarray] = None,
    block_size_h: int = 96,
    block_size_w: int = 96,
) -> float:
    """img: gray [0,255] float64."""
    distparam = _image_features(img, block_size_h, block_size_w,
                                gaussian_window)
    mu_distparam = np.nanmean(distparam, axis=0)
    dist_no_nan = distparam[~np.isnan(distparam).any(axis=1)]
    cov_distparam = np.cov(dist_no_nan, rowvar=False)
    invcov = np.linalg.pinv((cov_pris + cov_distparam) / 2)
    diff = mu_pris - mu_distparam
    return float(np.sqrt(diff @ invcov @ diff.T))


def fit_niqe_params(images, out_path: Optional[str] = None,
                    block_size: int = 96):
    """Fit the pristine multivariate-Gaussian model from pristine images.

    The reference ships ``niqe_pris_params.npz`` as a binary data asset
    (basicsr/metrics/niqe.py:174); this utility regenerates an equivalent
    model from any folder/list of pristine gray [0,255] images so the
    metric is self-contained.

    Args:
      images: iterable of HxW float64 gray images in [0,255] (e.g. the 125
        pristine images of the original NIQE corpus).
      out_path: optional .npz destination (keys mu_pris_param,
        cov_pris_param, gaussian_window — loadable by calculate_niqe).
    Returns (mu_pris_param, cov_pris_param, gaussian_window).
    """
    assert cv2 is not None, "cv2 required for NIQE fitting"
    feats = np.concatenate(
        [_image_features(np.asarray(im, np.float64), block_size, block_size)
         for im in images], axis=0)
    feats = feats[~np.isnan(feats).any(axis=1)]
    mu = np.mean(feats, axis=0)
    cov = np.cov(feats, rowvar=False)
    gw = _default_gaussian_window()
    if out_path:
        np.savez(out_path, mu_pris_param=mu, cov_pris_param=cov,
                 gaussian_window=gw)
    return mu, cov, gw


def calculate_niqe(
    img: np.ndarray,
    crop_border: int = 0,
    params_path: Optional[str] = None,
    convert_to: str = "y",
) -> float:
    """img: [0,255] HWC uint8/float. Needs the pristine params npz
    (pass ``params_path``, set ``MGLD_NIQE_PARAMS``, or fit your own with
    :func:`fit_niqe_params`)."""
    if params_path is None:
        import os

        params_path = os.environ.get("MGLD_NIQE_PARAMS")
    if params_path is None:
        raise ValueError(
            "NIQE needs the pristine model parameters "
            "(niqe_pris_params.npz); pass params_path, set "
            "MGLD_NIQE_PARAMS, or create one with fit_niqe_params()"
        )
    data = np.load(params_path)
    mu_pris = data["mu_pris_param"]
    cov_pris = data["cov_pris_param"]
    gw = data.get("gaussian_window") if hasattr(data, "get") else None
    if gw is None and "gaussian_window" in data:
        gw = data["gaussian_window"]

    img = img.astype(np.float64)
    if img.ndim == 3 and img.shape[2] == 3:
        if convert_to == "y":
            from mgldvsr_tpu.metrics.image import rgb_to_y

            img = rgb_to_y(img)[..., 0]
        else:
            img = cv2.cvtColor(
                (img / 255.0).astype(np.float32), cv2.COLOR_RGB2GRAY
            ).astype(np.float64) * 255.0
    elif img.ndim == 3:
        img = img[..., 0]
    if crop_border:
        img = img[crop_border:-crop_border, crop_border:-crop_border]
    return niqe_core(np.round(img), mu_pris, cov_pris, gw)
