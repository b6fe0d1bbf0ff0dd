"""FID: Fréchet distance between activation statistics.

Capability parity with basicsr FID (/root/reference/basicsr/metrics/fid.py:
10-89 + inception.py): mean/covariance of a feature extractor's pool
activations and the Fréchet distance between the two Gaussians. The feature
extractor is pluggable — the canonical InceptionV3-pool3 weights require an
offline download; any ``fn(images_nhwc01) -> [N, D]`` works (e.g. the LPIPS
VGG trunk)."""
from __future__ import annotations

from typing import Callable, Iterable, Tuple

import numpy as np
from scipy import linalg


def extract_features(
    feature_fn: Callable[[np.ndarray], np.ndarray],
    batches: Iterable[np.ndarray],
) -> np.ndarray:
    feats = [np.asarray(feature_fn(b)) for b in batches]
    return np.concatenate(feats, axis=0)


def calculate_activation_statistics(feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    mu = np.mean(feats, axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, sigma


def calculate_fid(
    mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray, sigma2: np.ndarray,
    eps: float = 1e-6,
) -> float:
    """Fréchet distance between N(mu1, s1) and N(mu2, s2)."""
    diff = mu1 - mu2
    covmean = linalg.sqrtm(sigma1 @ sigma2)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))
