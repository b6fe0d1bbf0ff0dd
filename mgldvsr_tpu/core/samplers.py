"""Stock DDIM and PLMS samplers.

Capability parity with the reference's bundled samplers
(/root/reference/ldm/models/diffusion/ddim.py DDIMSampler,
plms.py PLMSSampler) — kept for the image-LDM surface; the VSR model uses
the respaced DDPM loop in ``core.diffusion`` (the reference raises
NotImplementedError for DDIM there too, ddpm.py:4751-4752).

TPU-first: ``lax.scan`` over steps; eta-parameterized DDIM variance; PLMS
(pseudo-linear multistep) carries the last 3 eps predictions in the scan
state.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mgldvsr_tpu.core.schedules import DiffusionSchedule


def make_ddim_timesteps(num_ddpm: int, num_ddim: int) -> np.ndarray:
    c = num_ddpm // num_ddim
    return np.asarray(list(range(0, num_ddpm, c))) + 1 - 1  # uniform


def ddim_sample(
    sched: DiffusionSchedule,
    denoise_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x_T: jnp.ndarray,
    rng: jax.Array,
    num_steps: int = 50,
    eta: float = 0.0,
    clip_denoised: bool = False,
) -> jnp.ndarray:
    """Deterministic (eta=0) or stochastic DDIM over a uniform subset of the
    base schedule. denoise_fn(x, t_batch) -> eps."""
    n = sched.num_timesteps
    steps = make_ddim_timesteps(n, num_steps)
    ac = sched.alphas_cumprod
    ac_prev = jnp.concatenate(
        [jnp.ones((1,), ac.dtype), ac[jnp.asarray(steps[:-1])]]
    )
    steps_arr = jnp.asarray(steps[::-1].copy(), jnp.int32)
    idx_arr = jnp.arange(len(steps) - 1, -1, -1, dtype=jnp.int32)

    def body(carry, si):
        x, key = carry
        t, i = si
        key, sub = jax.random.split(key)
        bt = x.shape[0]
        eps = denoise_fn(x, jnp.full((bt,), t, jnp.int32))
        a_t = ac[t]
        a_prev = ac_prev[i]
        pred_x0 = (x - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
        if clip_denoised:
            pred_x0 = jnp.clip(pred_x0, -1, 1)
        sigma = (
            eta
            * jnp.sqrt((1 - a_prev) / (1 - a_t))
            * jnp.sqrt(1 - a_t / a_prev)
        )
        dir_xt = jnp.sqrt(jnp.maximum(1 - a_prev - sigma**2, 0.0)) * eps
        noise = sigma * jax.random.normal(sub, x.shape, x.dtype)
        x = jnp.sqrt(a_prev) * pred_x0 + dir_xt + noise
        return (x, key), None

    (x, _), _ = jax.lax.scan(body, (x_T, rng), (steps_arr, idx_arr))
    return x


def ddim_invert(
    sched: DiffusionSchedule,
    denoise_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x_0: jnp.ndarray,
    num_steps: int = 50,
) -> jnp.ndarray:
    """Deterministic DDIM inversion: run the eta=0 update in reverse to
    recover the noise latent x_T whose ``ddim_sample`` trajectory lands on
    ``x_0``.

    Capability parity with the reference's inversion experiments
    (/root/reference/ldm/models/diffusion/ddpm_inv.py — an older DDPM copy
    kept for latent-inversion studies); expressed here as the standard
    DDIM ODE reversal instead of a duplicated model class.
    """
    n = sched.num_timesteps
    steps = make_ddim_timesteps(n, num_steps)
    ac = sched.alphas_cumprod
    ac_prev = jnp.concatenate(
        [jnp.ones((1,), ac.dtype), ac[jnp.asarray(steps[:-1])]]
    )
    # forward (increasing-t) walk: from a_prev[i] to a_t = ac[steps[i]]
    steps_arr = jnp.asarray(steps.copy(), jnp.int32)
    idx_arr = jnp.arange(len(steps), dtype=jnp.int32)

    def body(x, si):
        t, i = si
        bt = x.shape[0]
        # eps evaluated at the *source* (less-noisy) point, mirroring the
        # deterministic update x_{t} = sqrt(a_t) x0_pred + sqrt(1-a_t) eps
        eps = denoise_fn(x, jnp.full((bt,), t, jnp.int32))
        a_t = ac[t]
        a_prev = ac_prev[i]
        pred_x0 = (x - jnp.sqrt(1 - a_prev) * eps) / jnp.sqrt(a_prev)
        x = jnp.sqrt(a_t) * pred_x0 + jnp.sqrt(1 - a_t) * eps
        return x, None

    x, _ = jax.lax.scan(body, x_0, (steps_arr, idx_arr))
    return x


def plms_sample(
    sched: DiffusionSchedule,
    denoise_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x_T: jnp.ndarray,
    num_steps: int = 50,
    clip_denoised: bool = False,
) -> jnp.ndarray:
    """Pseudo linear multistep (deterministic): Adams-Bashforth style
    combination of the last 4 eps evaluations."""
    n = sched.num_timesteps
    steps = make_ddim_timesteps(n, num_steps)
    ac = sched.alphas_cumprod
    ac_prev_np = np.concatenate([[1.0], np.asarray(ac)[steps[:-1]]])
    ac_prev = jnp.asarray(ac_prev_np, ac.dtype)
    steps_arr = jnp.asarray(steps[::-1].copy(), jnp.int32)
    idx_arr = jnp.arange(len(steps) - 1, -1, -1, dtype=jnp.int32)

    def x_prev_from_eps(x, eps, t, i):
        a_t = ac[t]
        a_prev = ac_prev[i]
        pred_x0 = (x - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
        if clip_denoised:
            pred_x0 = jnp.clip(pred_x0, -1, 1)
        return jnp.sqrt(a_prev) * pred_x0 + jnp.sqrt(1 - a_prev) * eps

    def body(carry, si):
        x, old, count = carry
        t, i = si
        bt = x.shape[0]
        tb = jnp.full((bt,), t, jnp.int32)
        eps = denoise_fn(x, tb)
        # Adams-Bashforth multistep combination by history length (0..3+)
        prime0 = eps
        prime1 = (3 * eps - old[0]) / 2
        prime2 = (23 * eps - 16 * old[0] + 5 * old[1]) / 12
        prime3 = (55 * eps - 59 * old[0] + 37 * old[1] - 9 * old[2]) / 24
        eps_prime = jnp.select(
            [count == 0, count == 1, count == 2],
            [prime0, prime1, prime2],
            prime3,
        )
        x_new = x_prev_from_eps(x, eps_prime, t, i)
        new_old = (eps, old[0], old[1])
        return (x_new, new_old, count + 1), None

    zeros = jnp.zeros_like(x_T)
    (x, _, _), _ = jax.lax.scan(
        body, (x_T, (zeros, zeros, zeros), jnp.zeros((), jnp.int32)),
        (steps_arr, idx_arr),
    )
    return x
