"""Clip-level flow computation for motion guidance.

Parity with the reference's pairwise flow protocol
(/root/reference/ldm/models/diffusion/ddpm.py:3404-3429 ``compute_flow`` and
the occlusion-mask assembly in
scripts/vsr_val_ddpm_text_T_vqganfin_old.py:346-366): for a [B, T, H, W, 3]
clip, ``flows_backward[k] = flownet(frame_k, frame_{k+1})`` (aligns frame k+1
to k) and ``flows_forward[k] = flownet(frame_{k+1}, frame_k)``; both
flattened over pairs into one batched flownet call (TPU-friendly: a single
large batch instead of 2(T-1) small launches).
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp

from mgldvsr_tpu.ops.occlusion import forward_backward_consistency_check
from mgldvsr_tpu.ops.warp import resize_flow


def compute_clip_flows(
    flownet: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    frames: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """frames: [B, T, H, W, 3] in [0,1]. Returns (flows_forward,
    flows_backward), each [B, T-1, H, W, 2]."""
    b, t, h, w, c = frames.shape
    former = frames[:, :-1].reshape(b * (t - 1), h, w, c)
    latter = frames[:, 1:].reshape(b * (t - 1), h, w, c)
    # one batched call covering both directions
    ref = jnp.concatenate([former, latter], axis=0)
    supp = jnp.concatenate([latter, former], axis=0)
    flows = flownet(ref, supp)
    flows_backward = flows[: b * (t - 1)].reshape(b, t - 1, h, w, 2)
    flows_forward = flows[b * (t - 1) :].reshape(b, t - 1, h, w, 2)
    return flows_forward, flows_backward


def compute_occlusion_masks(
    flows_forward: jnp.ndarray,
    flows_backward: jnp.ndarray,
    alpha: float = 0.01,
    beta: float = 0.5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pair UnFlow occlusion masks; inputs [B, T-1, H, W, 2], outputs
    [B, T-1, H, W, 1] with 1 = occluded.

    Follows the reference's convention of treating ``flows_forward`` as the
    'fwd' argument of the check (script old.py:353-366)."""
    b, tm1, h, w, _ = flows_forward.shape
    ff = flows_forward.reshape(b * tm1, h, w, 2)
    fb = flows_backward.reshape(b * tm1, h, w, 2)
    fwd_occ, bwd_occ = forward_backward_consistency_check(ff, fb, alpha, beta)
    return (
        fwd_occ.reshape(b, tm1, h, w, 1),
        bwd_occ.reshape(b, tm1, h, w, 1),
    )


def flows_to_latent_res(flows: jnp.ndarray, scale: float = 0.125) -> jnp.ndarray:
    """Resize a [B, T-1, H, W, 2] flow stack to latent resolution with
    magnitude rescaling (reference: resize_flow ratio 0.125)."""
    b, tm1, h, w, _ = flows.shape
    flat = flows.reshape(b * tm1, h, w, 2)
    out = resize_flow(flat, "ratio", (scale, scale))
    return out.reshape(b, tm1, out.shape[1], out.shape[2], 2)
