"""Forward-backward flow consistency (occlusion) check, UnFlow-style.

Matches /root/reference/scripts/util_flow.py:114-136: a pixel is occluded when
|| f_fwd + warp(f_bwd, f_fwd) || > alpha * (||f_fwd|| + ||f_bwd_warped||...)
with the magnitude term being ||f_fwd|| + ||f_bwd|| evaluated pointwise.
Channels-last: flows are [N, H, W, 2]; returned masks are [N, H, W, 1]
(1 = occluded).
"""
from __future__ import annotations

import jax.numpy as jnp

from mgldvsr_tpu.ops.warp import flow_warp


def forward_backward_consistency_check(
    fwd_flow: jnp.ndarray,
    bwd_flow: jnp.ndarray,
    alpha: float = 0.01,
    beta: float = 0.5,
):
    assert fwd_flow.ndim == 4 and fwd_flow.shape[-1] == 2

    norm = lambda f: jnp.sqrt(jnp.sum(f * f, axis=-1))
    flow_mag = norm(fwd_flow) + norm(bwd_flow)  # [N,H,W]

    warped_bwd = flow_warp(bwd_flow, fwd_flow)
    warped_fwd = flow_warp(fwd_flow, bwd_flow)

    diff_fwd = norm(fwd_flow + warped_bwd)
    diff_bwd = norm(bwd_flow + warped_fwd)

    threshold = alpha * flow_mag + beta
    fwd_occ = (diff_fwd > threshold).astype(fwd_flow.dtype)[..., None]
    bwd_occ = (diff_bwd > threshold).astype(fwd_flow.dtype)[..., None]
    return fwd_occ, bwd_occ
