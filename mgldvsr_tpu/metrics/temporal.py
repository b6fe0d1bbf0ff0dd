"""Temporal consistency metric E*warp (warping error).

The paper's E*warp (arXiv 2312.00853 evaluation protocol): mean squared
error between each frame and its flow-warped, occlusion-masked neighbor —
lower is better. Flows come from any flownet callable (RAFT/SpyNet here)."""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

from mgldvsr_tpu.flow.compute import compute_clip_flows, compute_occlusion_masks
from mgldvsr_tpu.ops.warp import flow_warp


def calculate_ewarp(
    frames_01: np.ndarray,
    flownet: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
) -> float:
    """frames: [T, H, W, 3] in [0,1]. Returns mean warping error over
    consecutive pairs (occlusion-masked)."""
    frames = jnp.asarray(frames_01)[None]
    ff, fb = compute_clip_flows(flownet, frames)
    fwd_occ, bwd_occ = compute_occlusion_masks(ff, fb)
    t = frames.shape[1]
    errs = []
    for i in range(t - 1):
        # warp frame i+1 back to frame i with the backward flow
        warped = flow_warp(frames[:, i + 1], fb[:, i])
        mask = 1.0 - fwd_occ[:, i]
        err = jnp.sum(mask * (warped - frames[:, i]) ** 2) / (
            jnp.sum(mask) * frames.shape[-1] + 1e-8
        )
        errs.append(float(err))
    return float(np.mean(errs))
