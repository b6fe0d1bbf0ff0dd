"""Motion-guided respaced DDPM sampling core.

The whole sampling step — struct-cond encoder, denoiser UNet, posterior
update, and the motion-guided latent correction — is a pure function scanned
over timesteps with ``jax.lax.scan``, so the entire 50-step loop compiles to
one XLA program. Motion guidance is an explicit ``jax.grad`` of the
flow-warp temporal-consistency loss with respect to the latents, replacing
the reference's autograd-inside-``no_grad`` construction
(/root/reference/ldm/models/diffusion/ddpm.py:4359-4374).

Behavioral parity notes (structure studied at
/root/reference/ldm/models/diffusion/ddpm.py):

- ``p_mean_variance`` (:4157-4189): the denoiser receives the *original*
  process timestep (``timestep_map[i]``, "t_replace") so its embeddings match
  pretraining, while the posterior coefficients are indexed by the respaced
  step ``i``.
- ``p_sample`` (:4325-4380): posterior sample then
  ``latents -= guidance_scale * log_variance * d(loss_tempo)/d(latents)``.
- ``compute_temporal_condition_v4`` (:3538-3574): bidirectional
  occlusion-masked L1 between each frame's latent and its warped neighbor.
  The reference loop compares the first term against a zeros placeholder and
  applies the *previous* iteration's warp (flow index off by one);
  ``mode="reference"`` reproduces that behavior exactly for parity,
  ``mode="aligned"`` uses the corrected neighbor alignment
  (warp(l_{k-1}, flow_fwd[k-1]) vs l_k) and is the recommended default for
  new training runs.
- ``p_sample_loop`` (:4501-4599): per-step struct-cond features from the LQ
  latent, optional latent AdaIN on the final step.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from mgldvsr_tpu.core.schedules import (
    DiffusionSchedule,
    extract,
    predict_start_from_noise,
    q_posterior,
    q_sample,
)
from mgldvsr_tpu.ops.warp import flow_warp


# ---------------------------------------------------------------------------
# Temporal consistency loss (the guidance objective)
# ---------------------------------------------------------------------------


def _guided_warp(lat: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Warp used inside the guidance objective. On TPU this takes the fused
    Pallas path (matmul forward AND matmul dL/dlatents — no scatter in the
    per-step gradient); elsewhere the XLA reference implementation."""
    if jax.default_backend() == "tpu":
        from mgldvsr_tpu.ops.pallas.flow_warp import (
            flow_warp_guided,
            pallas_warp_fits,
        )

        _, h, w, c = lat.shape
        # big-latent geometries (e.g. the 960px tile patch, 92x120) blow
        # the kernel's scoped-VMEM weight matrix — use the XLA warp there
        if pallas_warp_fits(h, w, c):
            return flow_warp_guided(lat, flow)
    return flow_warp(lat, flow)


def temporal_warp_loss(
    latents: jnp.ndarray,
    flows: Tuple[jnp.ndarray, jnp.ndarray],
    occs: Tuple[jnp.ndarray, jnp.ndarray],
    num_frames: int,
    mode: str = "reference",
) -> jnp.ndarray:
    """Bidirectional occlusion-masked flow-warp L1 over a clip's latents.

    Args:
      latents: [(b t), h, w, c] flattened clip latents.
      flows: ``(flows_forward, flows_backward)`` each [b, t-1, h, w, 2].
        ``flows_forward[k] = flownet(frame_{k+1}, frame_k)`` warps frame-k
        content to frame k+1; ``flows_backward[k] = flownet(frame_k,
        frame_{k+1})`` warps frame-(k+1) content to frame k.
      occs: ``(fwd_occs, bwd_occs)`` each [b, t-1, h, w, 1], 1 = occluded.
      mode: "reference" replicates the reference loop exactly (incl. its
        zero-placeholder first term and one-step-stale warp);
        "aligned" compares each frame against its properly warped neighbor.

    Returns a scalar: the sum of per-pair mean-L1 terms.
    """
    flow_fwd, flow_bwd = flows
    fwd_occs, bwd_occs = occs
    t = num_frames
    bt = latents.shape[0]
    b = bt // t
    lat = latents.reshape(b, t, *latents.shape[1:])

    def l1(a, y):
        return jnp.mean(jnp.abs(a - y))

    loss = jnp.zeros((), dtype=jnp.float32)
    if mode == "reference":
        # All warps batched into ONE call (2(t-2) stacked warps) — one
        # kernel launch + one backward instead of 2(t-1) small ones.
        # Needed warps: wb[j] = warp(l_j, fb[j]) for j in 1..t-2 (used as
        # prev at term k=j-1) and wf[j] = warp(l_j, ff[j-1]) for j in
        # 1..t-2 (used as prev at term k=j+1).
        if t > 2:
            js = list(range(1, t - 1))
            src = jnp.concatenate(
                [lat[:, j] for j in js] + [lat[:, j] for j in js], axis=0)
            flo = jnp.concatenate(
                [flow_bwd[:, j] for j in js]
                + [flow_fwd[:, j - 1] for j in js], axis=0)
            warped = _guided_warp(src, flo)
            nb = b * len(js)
            wb = {j: warped[(i) * b : (i + 1) * b]
                  for i, j in enumerate(js)}
            wf = {j: warped[nb + i * b : nb + (i + 1) * b]
                  for i, j in enumerate(js)}
        else:
            wb, wf = {}, {}
        zeros = jnp.zeros_like(lat[:, 0])
        # Backward pass: terms at k = t-2 .. 0, prev_{t-2} = zeros,
        # prev_k = warp(l_{k+1}, flow_bwd[k+1]) for k <= t-3.
        for k in range(t - 2, -1, -1):
            m = 1.0 - fwd_occs[:, k]
            prev = wb.get(k + 1, zeros)
            loss = loss + l1(m * prev, m * lat[:, k])
        # Forward pass: terms at k = 1 .. t-1, prev_1 = zeros,
        # prev_k = warp(l_{k-1}, flow_fwd[k-2]) for k >= 2.
        for k in range(1, t):
            n = 1.0 - bwd_occs[:, k - 1]
            prev = wf.get(k - 1, zeros)
            loss = loss + l1(n * prev, n * lat[:, k])
    elif mode == "aligned":
        # 2(t-1) warps in one batched call
        src = jnp.concatenate(
            [lat[:, k + 1] for k in range(t - 1)]
            + [lat[:, k] for k in range(t - 1)], axis=0)
        flo = jnp.concatenate(
            [flow_bwd[:, k] for k in range(t - 1)]
            + [flow_fwd[:, k] for k in range(t - 1)], axis=0)
        warped = _guided_warp(src, flo)
        nb = b * (t - 1)
        for k in range(t - 1):
            m = 1.0 - fwd_occs[:, k]
            loss = loss + l1(m * warped[k * b : (k + 1) * b], m * lat[:, k])
            n = 1.0 - bwd_occs[:, k]
            loss = loss + l1(n * warped[nb + k * b : nb + (k + 1) * b],
                             n * lat[:, k + 1])
    else:
        raise ValueError(f"unknown temporal loss mode {mode!r}")
    return loss


# ---------------------------------------------------------------------------
# Latent AdaIN (channel-wise moment transfer, used on the final latents and
# as the 'adain' colorfix in pixel space)
# ---------------------------------------------------------------------------


def adaptive_instance_normalization(
    content: jnp.ndarray, style: jnp.ndarray, eps: float = 1e-5
) -> jnp.ndarray:
    """Per-(sample, channel) moment transfer: content gets style's mean/std.

    NHWC counterpart of scripts/wavelet_color_fix.py:59-71 (which reduces
    over spatial dims with unbiased variance)."""

    def mean_std(x):
        m = jnp.mean(x, axis=(1, 2), keepdims=True)
        # unbiased variance to match torch Tensor.var default
        n = x.shape[1] * x.shape[2]
        v = jnp.sum((x - m) ** 2, axis=(1, 2), keepdims=True) / max(n - 1, 1)
        return m, jnp.sqrt(v + eps)

    c_mean, c_std = mean_std(content)
    s_mean, s_std = mean_std(style)
    return (content - c_mean) / c_std * s_std + s_mean


# ---------------------------------------------------------------------------
# Sampling
# ---------------------------------------------------------------------------


class SamplerOutput(NamedTuple):
    latents: jnp.ndarray
    intermediates: Optional[jnp.ndarray]  # [n_logged, ...] or None


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    num_frames: int = 5
    guidance_scale: float = -10.0
    guidance_mode: str = "reference"
    clip_denoised: bool = False
    parameterization: str = "eps"
    temperature: float = 1.0
    return_intermediates: bool = False
    # Draw per-step noise for ONE num_frames window and tile it across the
    # window batch. The tiled-restore protocol runs every patch with the
    # SAME seed (oldcanvas_tile.py:428 re-seeds per patch) so overlap seams
    # stay coherent; batching patches along the window axis must therefore
    # give each window the identical draw a solo same-seed call would get.
    noise_window_tile: bool = False


def p_mean_variance(
    sched: DiffusionSchedule,
    denoise_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,
    i: jnp.ndarray,
    cfg: SamplerConfig,
):
    """One posterior evaluation at respaced step ``i`` (scalar int32).

    ``denoise_fn(x, t_orig_batch)`` must run structcond+UNet and return the
    model output (eps prediction).
    """
    bt = x.shape[0]
    t_orig = sched.timestep_map[i]
    model_out = denoise_fn(x, jnp.full((bt,), t_orig, dtype=jnp.int32))
    if cfg.parameterization == "eps":
        x_recon = predict_start_from_noise(sched, x, i, model_out)
    elif cfg.parameterization == "x0":
        x_recon = model_out
    else:
        raise NotImplementedError(cfg.parameterization)
    if cfg.clip_denoised:
        x_recon = jnp.clip(x_recon, -1.0, 1.0)
    return q_posterior(sched, x_recon, x, i)


def p_sample(
    sched: DiffusionSchedule,
    denoise_fn,
    x: jnp.ndarray,
    i: jnp.ndarray,
    rng: jax.Array,
    cfg: SamplerConfig,
    flows=None,
    masks=None,
):
    """Posterior sample at step ``i`` plus the motion-guided correction."""
    mean, _, log_var = p_mean_variance(sched, denoise_fn, x, i, cfg)
    if cfg.noise_window_tile:
        nw = x.shape[0] // cfg.num_frames
        base = jax.random.normal(
            rng, (cfg.num_frames, *x.shape[1:]), dtype=x.dtype)
        noise = jnp.tile(base, (nw,) + (1,) * (x.ndim - 1)) * cfg.temperature
    else:
        noise = jax.random.normal(rng, x.shape, dtype=x.dtype) * cfg.temperature
    nonzero = (i > 0).astype(x.dtype)
    latents = mean + nonzero * jnp.exp(0.5 * log_var) * noise
    if flows is not None:
        grad = jax.grad(
            lambda l: temporal_warp_loss(
                l, flows, masks, cfg.num_frames, cfg.guidance_mode
            )
        )(latents)
        # The loss means over the window axis too (reference semantics,
        # ddpm.py:3538-3574 — only ever run at b=1); scale by the window
        # count so each window in a batched call receives exactly the
        # correction a solo b=1 segment would.
        n_windows = latents.shape[0] // cfg.num_frames
        latents = latents - cfg.guidance_scale * log_var * (n_windows * grad)
    return latents


def sample_video(
    sched: DiffusionSchedule,
    denoise_fn,
    x_T: jnp.ndarray,
    rng: jax.Array,
    cfg: SamplerConfig,
    flows=None,
    masks=None,
    adain_fea: Optional[jnp.ndarray] = None,
    start_T: Optional[int] = None,
) -> SamplerOutput:
    """Run the full respaced reverse process with ``lax.scan``.

    Args:
      sched: the *respaced* schedule (e.g. 50 steps with timestep_map into
        the original 1000).
      denoise_fn: ``(x, t_orig_batch) -> eps`` closure over params, text
        context and the LQ struct latent (it must recompute struct-cond
        features at each t, as the reference does per step).
      x_T: [(b t), h, w, c] initial latents (q_sample of the LQ latent at
        t=999 under the base schedule).
      adain_fea: optional latent to AdaIN-match the final latents against.
      start_T: optional original-timestep threshold; steps whose original
        timestep exceeds it are skipped (static filtering).
    """
    n = sched.num_timesteps
    steps = list(range(n - 1, -1, -1))
    if start_T is not None:
        import numpy as _np

        tmap = _np.asarray(sched.timestep_map)
        steps = [i for i in steps if int(tmap[i]) <= start_T]
    step_arr = jnp.asarray(steps, dtype=jnp.int32)

    def body(carry, i):
        x, key = carry
        key, sub = jax.random.split(key)
        x = p_sample(sched, denoise_fn, x, i, sub, cfg, flows, masks)
        y = x if cfg.return_intermediates else None
        return (x, key), y

    (x, _), inter = jax.lax.scan(body, (x_T, rng), step_arr)
    if adain_fea is not None:
        x = adaptive_instance_normalization(x, adain_fea)
    return SamplerOutput(latents=x, intermediates=inter)


def initial_latents(
    base_sched: DiffusionSchedule,
    z_lq: jnp.ndarray,
    rng: jax.Array,
    t_start: int = 999,
    noise: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """x_T = q_sample(z_lq, t_start) under the ORIGINAL (non-respaced)
    schedule — the 'noise LQ latent to the top' initialisation
    (scripts/vsr_val_ddpm_text_T_vqganfin_old.py:332-343). ``noise``
    overrides the rng draw (parity tests inject a known tensor)."""
    if noise is None:
        noise = jax.random.normal(rng, z_lq.shape, dtype=z_lq.dtype)
    t = jnp.full((z_lq.shape[0],), t_start, dtype=jnp.int32)
    return q_sample(base_sched, z_lq, t, noise)
