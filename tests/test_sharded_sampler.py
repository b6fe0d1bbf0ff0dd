"""Frame-sharded guided sampling on the virtual 8-device mesh."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mgldvsr_tpu.core.diffusion import SamplerConfig
from mgldvsr_tpu.core.schedules import DiffusionSchedule, respace_schedule
from mgldvsr_tpu.parallel.mesh import make_mesh
from mgldvsr_tpu.parallel.sharded_sampler import sample_video_sharded


def test_sharded_sampler_runs_with_halo():
    mesh = make_mesh(4, tp=1)
    t, h, w, c = 3, 8, 8, 4
    d = 4  # windows == devices
    base = DiffusionSchedule.create(timesteps=100, beta_schedule="linear",
                                    linear_start=0.00085, linear_end=0.012)
    sched = respace_schedule(base, 4)

    x_T = jax.random.normal(jax.random.PRNGKey(0), (d * t, h, w, c))
    flows = (
        0.3 * jax.random.normal(jax.random.PRNGKey(1), (d, t - 1, h, w, 2)),
        0.3 * jax.random.normal(jax.random.PRNGKey(2), (d, t - 1, h, w, 2)),
    )
    masks = (jnp.zeros((d, t - 1, h, w, 1)), jnp.zeros((d, t - 1, h, w, 1)))
    bflow = 0.3 * jax.random.normal(jax.random.PRNGKey(3), (d, h, w, 2))
    bocc = jnp.zeros((d, h, w, 1))

    cfg = SamplerConfig(num_frames=t, guidance_scale=-5.0)
    denoise = lambda x, tt: 0.1 * x

    with mesh:
        sh = NamedSharding(mesh, P("data"))
        out = jax.jit(
            lambda xT, k: sample_video_sharded(
                mesh, sched, denoise, xT, k, cfg, flows, masks, bflow, bocc
            )
        )(jax.device_put(x_T, sh), jax.random.PRNGKey(4))
    o = np.asarray(out)
    assert o.shape == (d * t, h, w, c)
    assert np.isfinite(o).all()

    # boundary guidance must couple shards: zero boundary weight differs
    with mesh:
        out0 = jax.jit(
            lambda xT, k: sample_video_sharded(
                mesh, sched, denoise, xT, k, cfg, flows, masks, bflow, bocc,
                boundary_weight=0.0,
            )
        )(jax.device_put(x_T, sh), jax.random.PRNGKey(4))
    assert not np.allclose(np.asarray(out0), o)
