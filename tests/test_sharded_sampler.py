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


def test_sharded_sampler_equivalence_at_zero_boundary_weight():
    """With boundary_weight=0 the 4-device sharded sampler must reproduce the
    unsharded per-window ``sample_video`` EXACTLY (same fold_in(rng, window)
    keys, same guided math) — 'runs on 4 devices' => 'is right on 4
    devices'."""
    from mgldvsr_tpu.core.diffusion import sample_video

    mesh = make_mesh(4, tp=1)
    t, h, w, c = 3, 8, 8, 4
    d = 4
    base = DiffusionSchedule.create(timesteps=100, beta_schedule="linear",
                                    linear_start=0.00085, linear_end=0.012)
    sched = respace_schedule(base, 4)

    x_T = jax.random.normal(jax.random.PRNGKey(10), (d * t, h, w, c))
    flows = (
        0.3 * jax.random.normal(jax.random.PRNGKey(11), (d, t - 1, h, w, 2)),
        0.3 * jax.random.normal(jax.random.PRNGKey(12), (d, t - 1, h, w, 2)),
    )
    masks = (jnp.zeros((d, t - 1, h, w, 1)), jnp.zeros((d, t - 1, h, w, 1)))
    bflow = 0.3 * jax.random.normal(jax.random.PRNGKey(13), (d, h, w, 2))
    bocc = jnp.zeros((d, h, w, 1))
    rng = jax.random.PRNGKey(14)

    cfg = SamplerConfig(num_frames=t, guidance_scale=-5.0)
    denoise = lambda x, tt: 0.1 * x

    with mesh:
        sh = NamedSharding(mesh, P("data"))
        sharded = jax.jit(
            lambda xT, k: sample_video_sharded(
                mesh, sched, denoise, xT, k, cfg, flows, masks, bflow, bocc,
                boundary_weight=0.0,
            )
        )(jax.device_put(x_T, sh), rng)
    sharded = np.asarray(sharded)

    for di in range(d):
        win = sample_video(
            sched, denoise, x_T[di * t:(di + 1) * t],
            jax.random.fold_in(rng, di), cfg,
            flows=(flows[0][di:di + 1], flows[1][di:di + 1]),
            masks=(masks[0][di:di + 1], masks[1][di:di + 1]),
        ).latents
        np.testing.assert_allclose(
            sharded[di * t:(di + 1) * t], np.asarray(win), atol=1e-5,
            err_msg=f"window {di}")
