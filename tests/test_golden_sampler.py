"""Fixed-seed golden regression test of the guided sampling loop
(SURVEY §4 item 3): tiny shapes, analytic denoiser, checked-in golden
values. Any change to schedule math, posterior update, noise consumption
order, or guidance semantics shifts these numbers."""
import numpy as np
import jax
import jax.numpy as jnp

from mgldvsr_tpu.core.diffusion import (
    SamplerConfig,
    initial_latents,
    sample_video,
)
from mgldvsr_tpu.core.schedules import DiffusionSchedule, respace_schedule

# regenerate with scripts in this file's __main__ block after INTENTIONAL
# semantic changes
GOLDEN_GUIDED_MEAN = -0.12752518
GOLDEN_GUIDED_STD = 2.9185638
GOLDEN_PLAIN_MEAN = -0.12192963
GOLDEN_PLAIN_STD = 4.794642


def _run(guided: bool):
    base = DiffusionSchedule.create(
        timesteps=1000, beta_schedule="linear",
        linear_start=0.00085, linear_end=0.0120,
    )
    sched = respace_schedule(base, 8)
    t, h, w, c = 5, 8, 8, 4
    z_lq = jax.random.normal(jax.random.PRNGKey(10), (t, h, w, c)) * 0.2
    x_T = initial_latents(base, z_lq, jax.random.PRNGKey(11))

    def denoise(x, tt):
        return 0.3 * x - 0.1 * z_lq

    cfg = SamplerConfig(num_frames=t, guidance_scale=-10.0)
    if guided:
        flows = (
            0.5 * jax.random.normal(jax.random.PRNGKey(12), (1, t - 1, h, w, 2)),
            0.5 * jax.random.normal(jax.random.PRNGKey(13), (1, t - 1, h, w, 2)),
        )
        masks = (jnp.zeros((1, t - 1, h, w, 1)), jnp.zeros((1, t - 1, h, w, 1)))
        out = sample_video(sched, denoise, x_T, jax.random.PRNGKey(14), cfg,
                           flows, masks)
    else:
        out = sample_video(sched, denoise, x_T, jax.random.PRNGKey(14), cfg)
    return np.asarray(out.latents)


def test_golden_guided():
    x = _run(True)
    assert abs(float(x.mean()) - GOLDEN_GUIDED_MEAN) < 1e-5, float(x.mean())
    assert abs(float(x.std()) - GOLDEN_GUIDED_STD) < 1e-5, float(x.std())


def test_golden_plain():
    x = _run(False)
    assert abs(float(x.mean()) - GOLDEN_PLAIN_MEAN) < 1e-5, float(x.mean())
    assert abs(float(x.std()) - GOLDEN_PLAIN_STD) < 1e-5, float(x.std())


if __name__ == "__main__":
    print("guided:", _run(True).mean(), _run(True).std())
    print("plain:", _run(False).mean(), _run(False).std())
