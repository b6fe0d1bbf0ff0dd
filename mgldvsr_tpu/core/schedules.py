"""Diffusion (DDPM) schedule math and timestep respacing.

Pure-numpy construction, immutable jnp arrays at use time. Mirrors the
behavior of the reference implementation (standard DDPM / latent-diffusion
formulas: /root/reference/ldm/models/diffusion/ddpm.py:237-292 DDPM
``register_schedule``, :101-155 ``space_timesteps``, and the inference-time
re-respacing in /root/reference/scripts/vsr_val_ddpm_text_T_vqganfin_old.py:262-283)
but is a from-scratch functional design: the schedule is a frozen pytree that
can be closed over by a jitted sampling step.

The VSR pipeline uses two schedules simultaneously:
- the *original* 1000-step schedule, whose ``sqrt_alphas_cumprod`` seeds the
  initial latent ``x_T = q_sample(z_lq, t=T-1)``;
- the *respaced* N-step schedule (default N=50), which drives the posterior
  update. The UNet and struct-cond encoder always receive the original
  timestep index (``timestep_map[i]``) so their timestep embeddings match the
  pretraining distribution.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax.numpy as jnp
import numpy as np


def make_beta_schedule(
    schedule: str,
    n_timestep: int,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """Beta schedules. ``linear`` is the sqrt-space linspace used by Stable
    Diffusion; ``cosine`` is the improved-DDPM cosine schedule."""
    if schedule == "linear":
        betas = (
            np.linspace(
                linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64
            )
            ** 2
        )
    elif schedule == "cosine":
        timesteps = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        alphas = timesteps / (1 + cosine_s) * np.pi / 2
        alphas = np.cos(alphas) ** 2
        alphas = alphas / alphas[0]
        betas = 1 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, a_min=0.0, a_max=0.999)
    elif schedule == "sqrt_linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "sqrt":
        betas = (
            np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64) ** 0.5
        )
    else:
        raise ValueError(f"schedule '{schedule}' unknown.")
    return betas.astype(np.float64)


def space_timesteps(num_timesteps: int, section_counts) -> list[int]:
    """Select a subset of an ``num_timesteps``-step process (IDDPM respacing).

    Accepts a list of per-section counts or a string (``"ddimN"`` or
    comma-separated counts). Returns the *sorted* list of original timestep
    indices to keep.
    """
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired_count = int(section_counts[len("ddim"):])
            for stride in range(1, num_timesteps):
                if len(range(0, num_timesteps, stride)) == desired_count:
                    return list(range(0, num_timesteps, stride))
            raise ValueError(
                f"cannot create exactly {desired_count} steps with an integer stride"
            )
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps: list[int] = []
    for i, section_count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < section_count:
            raise ValueError(f"cannot divide section of {size} steps into {section_count}")
        if section_count <= 1:
            frac_stride = 1.0
        else:
            frac_stride = (size - 1) / (section_count - 1)
        cur_idx = 0.0
        for _ in range(section_count):
            all_steps.append(start_idx + round(cur_idx))
            cur_idx += frac_stride
        start_idx += size
    return sorted(set(all_steps))


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """All derived DDPM quantities as immutable float32 arrays.

    ``timestep_map[i]`` maps the (possibly respaced) index ``i`` back to the
    original process index, for timestep embeddings of pretrained nets.
    """

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    lvlb_weights: jnp.ndarray
    timestep_map: jnp.ndarray  # int32 [num_timesteps]

    @property
    def num_timesteps(self) -> int:
        return int(self.betas.shape[0])

    @classmethod
    def create(
        cls,
        timesteps: int = 1000,
        beta_schedule: str = "linear",
        linear_start: float = 0.00085,
        linear_end: float = 0.0120,
        cosine_s: float = 8e-3,
        given_betas: np.ndarray | None = None,
        v_posterior: float = 0.0,
        parameterization: str = "eps",
        timestep_map: Sequence[int] | None = None,
    ) -> "DiffusionSchedule":
        if given_betas is not None:
            betas = np.asarray(given_betas, dtype=np.float64)
        else:
            betas = make_beta_schedule(
                beta_schedule, timesteps, linear_start, linear_end, cosine_s
            )
        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas, axis=0)
        alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])

        posterior_variance = (1 - v_posterior) * betas * (
            1.0 - alphas_cumprod_prev
        ) / (1.0 - alphas_cumprod) + v_posterior * betas
        posterior_log_variance_clipped = np.log(np.maximum(posterior_variance, 1e-20))
        posterior_mean_coef1 = betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        posterior_mean_coef2 = (
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        )

        if parameterization == "eps":
            # posterior_variance[0] == 0 -> inf at index 0, overwritten below.
            with np.errstate(divide="ignore"):
                lvlb_weights = betas**2 / (
                    2 * posterior_variance * alphas * (1 - alphas_cumprod)
                )
        elif parameterization == "x0":
            lvlb_weights = 0.5 * np.sqrt(alphas_cumprod) / (2.0 * (1 - alphas_cumprod))
        elif parameterization == "v":
            lvlb_weights = np.ones_like(
                betas**2 / (2 * posterior_variance * alphas * (1 - alphas_cumprod))
            )
        else:
            raise ValueError(f"unknown parameterization {parameterization}")
        if len(lvlb_weights) > 1:
            lvlb_weights[0] = lvlb_weights[1]

        if timestep_map is None:
            timestep_map = np.arange(len(betas), dtype=np.int32)

        f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
        return cls(
            betas=f32(betas),
            alphas_cumprod=f32(alphas_cumprod),
            alphas_cumprod_prev=f32(alphas_cumprod_prev),
            sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
            log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
            sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
            sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1)),
            posterior_variance=f32(posterior_variance),
            posterior_log_variance_clipped=f32(posterior_log_variance_clipped),
            posterior_mean_coef1=f32(posterior_mean_coef1),
            posterior_mean_coef2=f32(posterior_mean_coef2),
            lvlb_weights=f32(lvlb_weights),
            timestep_map=jnp.asarray(timestep_map, dtype=jnp.int32),
        )


def respace_schedule(
    base: "DiffusionSchedule", num_steps: int | str
) -> "DiffusionSchedule":
    """Build the respaced schedule from an existing one.

    Keeps only the timesteps selected by :func:`space_timesteps` and recomputes
    betas so the cumulative alpha product over the kept steps is preserved
    (``1 - ac_i / ac_{last kept}``).
    """
    alphas_cumprod = np.asarray(base.alphas_cumprod, dtype=np.float64)
    n = int(alphas_cumprod.shape[0])
    if isinstance(num_steps, int):
        use_timesteps = space_timesteps(n, [num_steps])
    else:
        use_timesteps = space_timesteps(n, num_steps)
    last = 1.0
    new_betas = []
    for i in use_timesteps:
        new_betas.append(1 - alphas_cumprod[i] / last)
        last = alphas_cumprod[i]
    return DiffusionSchedule.create(
        given_betas=np.array(new_betas), timestep_map=use_timesteps
    )


# ---------------------------------------------------------------------------
# Pointwise schedule ops. ``t`` is an int32 array broadcastable against the
# leading axis of ``x``; coefficient gathers broadcast over trailing dims.
# ---------------------------------------------------------------------------


def extract(coefs: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-timestep coefficients and reshape for broadcasting over an
    ndim-dimensional batch tensor."""
    out = coefs[t]
    return out.reshape(out.shape + (1,) * (ndim - out.ndim))


def q_sample(
    sched: DiffusionSchedule, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray
) -> jnp.ndarray:
    """Diffuse ``x_start`` to timestep ``t``: sqrt(ac_t) x0 + sqrt(1-ac_t) eps."""
    return (
        extract(sched.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
        + extract(sched.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise
    )


def predict_start_from_noise(
    sched: DiffusionSchedule, x_t: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray
) -> jnp.ndarray:
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
        - extract(sched.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * noise
    )


def predict_start_from_z_and_v(
    sched: DiffusionSchedule, x_t: jnp.ndarray, t: jnp.ndarray, v: jnp.ndarray
) -> jnp.ndarray:
    return (
        extract(sched.sqrt_alphas_cumprod, t, x_t.ndim) * x_t
        - extract(sched.sqrt_one_minus_alphas_cumprod, t, x_t.ndim) * v
    )


def get_v(
    sched: DiffusionSchedule, x: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    return (
        extract(sched.sqrt_alphas_cumprod, t, x.ndim) * noise
        - extract(sched.sqrt_one_minus_alphas_cumprod, t, x.ndim) * x
    )


def q_posterior(
    sched: DiffusionSchedule,
    x_start: jnp.ndarray,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
):
    """Posterior q(x_{t-1} | x_t, x_0): (mean, variance, log_variance)."""
    mean = (
        extract(sched.posterior_mean_coef1, t, x_t.ndim) * x_start
        + extract(sched.posterior_mean_coef2, t, x_t.ndim) * x_t
    )
    var = extract(sched.posterior_variance, t, x_t.ndim)
    log_var = extract(sched.posterior_log_variance_clipped, t, x_t.ndim)
    return mean, var, log_var


def timestep_embedding(
    timesteps: jnp.ndarray, dim: int, max_period: int = 10000
) -> jnp.ndarray:
    """Sinusoidal timestep embeddings, [N] -> [N, dim] (cos | sin halves)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb
