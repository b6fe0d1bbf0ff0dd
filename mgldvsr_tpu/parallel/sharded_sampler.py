"""Frame-sharded sampling with ICI halo exchange.

The reference processes 5-frame windows independently per GPU (scripts
old.py:294-296) — cross-window coherence comes only from shared LQ
conditioning. The TPU-native extension (SURVEY §5.7): shard a long
sequence's windows across the mesh's ``data`` axis and, at every sampling
step, exchange ONE boundary latent per neighbor over ICI
(``jax.lax.ppermute`` of a [h, w, c] latent — tiny) so the motion-guided
correction also enforces consistency ACROSS window boundaries.

The boundary term treats the neighbor's edge latent as a constant
(stop-gradient) in this shard's correction — each shard nudges its own
boundary frame toward the neighbor's, symmetrically.

Implemented with ``shard_map`` so collectives are explicit; runs on any
mesh (validated on the 8-virtual-device CPU mesh in tests).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from mgldvsr_tpu.core.diffusion import (
    SamplerConfig,
    p_mean_variance,
    temporal_warp_loss,
)
from mgldvsr_tpu.core.schedules import DiffusionSchedule
from mgldvsr_tpu.ops.warp import flow_warp


def _boundary_loss(
    local_latents: jnp.ndarray,
    neighbor_first: jnp.ndarray,
    boundary_flow: jnp.ndarray,
    boundary_occ: jnp.ndarray,
    num_frames: int,
) -> jnp.ndarray:
    """L1 between this shard's LAST frame latent and the neighbor shard's
    FIRST frame latent warped back across the boundary (occlusion-masked).

    neighbor_first is a constant (already stop-gradient)."""
    t = num_frames
    last = local_latents.reshape(-1, t, *local_latents.shape[1:])[:, -1]
    warped = flow_warp(neighbor_first, boundary_flow)
    m = 1.0 - boundary_occ
    return jnp.mean(jnp.abs(m * warped - m * last))


def sample_video_sharded(
    mesh: Mesh,
    sched: DiffusionSchedule,
    denoise_fn: Callable,
    x_T: jnp.ndarray,
    rng: jax.Array,
    cfg: SamplerConfig,
    flows: Tuple[jnp.ndarray, jnp.ndarray],
    masks: Tuple[jnp.ndarray, jnp.ndarray],
    boundary_flows: jnp.ndarray,
    boundary_occs: jnp.ndarray,
    boundary_weight: float = 1.0,
    axis: str = "data",
    extra: Tuple[jnp.ndarray, ...] = (),
) -> jnp.ndarray:
    """Run the guided reverse process with windows sharded over ``axis``.

    Args (global shapes; leading dims shard over ``axis``):
      x_T: [D*t, h, w, c] — D windows of t frames.
      flows/masks: [D, t-1, ...] per-window flow stacks.
      boundary_flows: [D, h, w, 2] — flow aligning window d+1's first frame
        to window d's last frame (last window's entry is ignored).
      boundary_occs: [D, h, w, 1].
      denoise_fn(x, t_orig) must be shard-local (closure params replicated).
      extra: per-window conditioning arrays (leading dim D*t or D) sharded
        over ``axis`` and passed as trailing args: denoise_fn(x, t_orig,
        *extra_local). Use for the struct-cond latent, which varies per
        window and must NOT be closed over (a closure would replicate it).
    """
    t = cfg.num_frames
    n_dev = mesh.shape[axis]

    def local_loop(x_T_l, flows_f, flows_b, occ_f, occ_b, bflow, bocc, key,
                   *extra_l):
        # shapes inside shard_map: x_T_l [t, h, w, c]; flows [1, t-1, ...];
        # bflow [1, h, w, 2]
        idx = jax.lax.axis_index(axis)
        steps = jnp.arange(sched.num_timesteps - 1, -1, -1, dtype=jnp.int32)
        local_flows = (flows_f, flows_b)
        local_masks = (occ_f, occ_b)
        dn = ((lambda x_, t_: denoise_fn(x_, t_, *extra_l))
              if extra_l else denoise_fn)

        def body(carry, i):
            x, k = carry
            k, sub = jax.random.split(k)
            mean, _, log_var = p_mean_variance(sched, dn, x, i, cfg)
            noise = jax.random.normal(sub, x.shape, x.dtype) * cfg.temperature
            nonzero = (i > 0).astype(x.dtype)
            latents = mean + nonzero * jnp.exp(0.5 * log_var) * noise

            # halo: left neighbor needs OUR first frame; we need RIGHT
            # neighbor's first frame
            first = latents.reshape(-1, t, *latents.shape[1:])[:, 0]
            perm = [(i_ + 1, i_) for i_ in range(n_dev - 1)]  # right -> left
            neighbor_first = jax.lax.ppermute(first, axis, perm)
            neighbor_first = jax.lax.stop_gradient(neighbor_first)
            has_right = (idx < n_dev - 1).astype(x.dtype)

            def loss_fn(l):
                loss = temporal_warp_loss(
                    l, local_flows, local_masks, t, cfg.guidance_mode)
                b = _boundary_loss(l, neighbor_first, bflow, bocc, t)
                return loss + boundary_weight * has_right * b

            grad = jax.grad(loss_fn)(latents)
            latents = latents - cfg.guidance_scale * log_var * grad
            return (latents, k), None

        key = jax.random.fold_in(key, idx)
        (x, _), _ = jax.lax.scan(body, (x_T_l, key), steps)
        return x

    spec_x = P(axis)
    spec_w = P(axis)  # window-stacked aux arrays
    fn = shard_map(
        local_loop,
        mesh=mesh,
        in_specs=(spec_x, spec_w, spec_w, spec_w, spec_w, spec_w, spec_w,
                  P(), *([P(axis)] * len(extra))),
        out_specs=spec_x,
        check_vma=False,
    )
    return fn(
        x_T,
        flows[0],
        flows[1],
        masks[0],
        masks[1],
        boundary_flows,
        boundary_occs,
        rng,
        *extra,
    )
