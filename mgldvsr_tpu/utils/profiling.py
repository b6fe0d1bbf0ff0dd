"""Profiling + debug visualization hooks.

Capability parity with the reference's tracing (SURVEY §5.1):
- CUDA-event timing (scripts old.py:291,390-395) → ``StepTimer`` with
  ``block_until_ready`` fencing;
- torch.cuda.max_memory_allocated epoch stats (main.py:398-418) →
  ``device_memory_stats``;
- struct-cond PCA feature dumps (ddpm.py:4552-4595, cal_pca_components) →
  ``dump_pca_features``;
- plus ``jax.profiler`` trace capture for xprof/tensorboard tooling.
"""
from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, List, Optional

import numpy as np
import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace (view with xprof/tensorboard)."""
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock timing with async-dispatch fencing."""

    def __init__(self):
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, *arrays):
        for a in arrays:
            jax.block_until_ready(a)
        self.times.append(time.perf_counter() - self._t0)

    @property
    def mean(self) -> float:
        return float(np.mean(self.times)) if self.times else 0.0

    @property
    def best(self) -> float:
        return float(np.min(self.times)) if self.times else 0.0


def device_memory_stats(device=None) -> Dict[str, int]:
    """Live/peak HBM bytes for a device (TPU equivalent of
    max_memory_allocated)."""
    device = device or jax.devices()[0]
    stats = device.memory_stats() or {}
    return {
        "bytes_in_use": stats.get("bytes_in_use", 0),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
        "bytes_limit": stats.get("bytes_limit", 0),
    }


def pca_components(feature_hwc: np.ndarray, n: int = 3) -> np.ndarray:
    """Project a [H,W,C] feature map onto its top-n PCA components →
    [H,W,n] visualization array."""
    h, w, c = feature_hwc.shape
    x = feature_hwc.reshape(-1, c).astype(np.float64)
    x = x - x.mean(axis=0, keepdims=True)
    _, _, vt = np.linalg.svd(x, full_matrices=False)
    proj = x @ vt[:n].T
    return proj.reshape(h, w, n).astype(np.float32)


def dump_pca_features(
    features_per_step: List[Dict[str, np.ndarray]],
    outdir: str,
    keys: tuple = ("64", "32"),
    n_components: int = 3,
):
    """Visualize struct-cond features over sampling steps as PNG sequences
    (the reference's interfea_path debug hook)."""
    import cv2

    for key in keys:
        maps = [
            pca_components(np.asarray(step[key][0]), n_components)
            for step in features_per_step
            if key in step
        ]
        if not maps:
            continue
        arr = np.stack(maps)
        arr = arr - arr.min()
        arr = arr / max(arr.max(), 1e-8)
        d = os.path.join(outdir, f"fea_{key}")
        os.makedirs(d, exist_ok=True)
        for i, m in enumerate(arr):
            cv2.imwrite(
                os.path.join(d, f"step_{len(arr) - i}.png"),
                (m * 255).astype(np.uint8),
            )
