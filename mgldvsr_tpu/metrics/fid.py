"""FID: InceptionV3-pool3 features + Fréchet distance.

Capability parity with basicsr FID (/root/reference/basicsr/metrics/fid.py:
10-89 + archs/inception.py): the FID-patched InceptionV3 pool3 tower
(``metrics/inception.InceptionV3FID``, oracle-tested against the reference
blocks), mean/covariance of its activations, and the Fréchet distance
between the two Gaussians. The canonical pt_inception-2015-12-05 weights
load through ``io.ckpt_convert.convert_inception``; the feature extractor
stays pluggable (any ``fn(images_nhwc) -> [N, D]``) for weight-free use."""
from __future__ import annotations

from typing import Callable, Iterable, Tuple

import numpy as np
from scipy import linalg


def load_patched_inception(ckpt_path: str, resize_input: bool = True,
                           normalize_input: bool = False):
    """Reference ``load_patched_inception_v3`` equivalent (fid.py:10-15):
    returns a jitted ``fn(images_nhwc) -> [N, 2048]`` feature extractor."""
    import jax

    from mgldvsr_tpu.io.ckpt_convert import (
        convert_inception,
        load_torch_state_dict,
        to_jax,
    )
    from mgldvsr_tpu.metrics.inception import InceptionV3FID

    params = to_jax(convert_inception(load_torch_state_dict(ckpt_path)))
    model = InceptionV3FID(resize_input=resize_input,
                           normalize_input=normalize_input)
    return jax.jit(lambda x: model.apply(params, x))


def extract_features(
    feature_fn: Callable[[np.ndarray], np.ndarray],
    batches: Iterable[np.ndarray],
) -> np.ndarray:
    feats = [np.asarray(feature_fn(b)) for b in batches]
    return np.concatenate(feats, axis=0)


def calculate_activation_statistics(feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    if feats.shape[0] <= feats.shape[-1]:
        import warnings

        warnings.warn(
            f"FID statistics from {feats.shape[0]} samples of dim "
            f"{feats.shape[-1]}: the covariance is singular (need > dim "
            "samples, canonically >=2048 images) — the resulting FID is "
            "not comparable across runs", stacklevel=2)
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
        import warnings

        warnings.warn(
            f"fid sqrtm produced non-finite values; retrying with a "
            f"{eps} diagonal offset (expected with singular covariances "
            "from too few samples)", stacklevel=2)
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))
