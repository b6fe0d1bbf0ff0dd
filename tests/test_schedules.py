import jax.numpy as jnp
import numpy as np

from mgldvsr_tpu.core import schedules as S


def test_linear_betas_match_sd():
    betas = S.make_beta_schedule("linear", 1000, 0.00085, 0.0120)
    assert betas.shape == (1000,)
    assert np.isclose(betas[0], 0.00085)
    assert np.isclose(betas[-1], 0.0120)
    # sqrt-space linspace: sqrt(betas) must be affine in the index
    diffs = np.diff(np.sqrt(betas))
    assert np.allclose(diffs, diffs[0])


def test_space_timesteps_50():
    steps = S.space_timesteps(1000, [50])
    assert len(steps) == 50
    assert steps[0] == 0
    assert steps[-1] == 999
    assert steps == sorted(steps)


def test_space_timesteps_ddim():
    steps = S.space_timesteps(1000, "ddim50")
    assert len(steps) == 50
    assert all(s % 20 == 0 for s in steps)


def test_respace_preserves_alphas_cumprod():
    base = S.DiffusionSchedule.create(timesteps=1000)
    re = S.respace_schedule(base, 50)
    assert re.num_timesteps == 50
    kept = np.asarray(base.alphas_cumprod)[np.asarray(re.timestep_map)]
    assert np.allclose(np.asarray(re.alphas_cumprod), kept, rtol=1e-5)


def test_q_sample_roundtrip():
    sched = S.DiffusionSchedule.create(timesteps=100)
    x0 = jnp.ones((2, 4, 4, 3))
    noise = jnp.full_like(x0, 0.5)
    t = jnp.array([10, 50])
    xt = S.q_sample(sched, x0, t, noise)
    x0_rec = S.predict_start_from_noise(sched, xt, t, noise)
    assert np.allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-4)


def test_q_posterior_shapes_and_variance_positive():
    sched = S.DiffusionSchedule.create(timesteps=100)
    x = jnp.zeros((2, 4, 4, 3))
    mean, var, logvar = S.q_posterior(sched, x, x, jnp.array([3, 7]))
    assert mean.shape == x.shape
    assert np.all(np.asarray(var) > 0)
    assert np.allclose(np.asarray(logvar), np.log(np.asarray(var)), atol=1e-5)


def test_v_parameterization_consistency():
    sched = S.DiffusionSchedule.create(timesteps=100)
    rngx = np.random.RandomState(0)
    x0 = jnp.asarray(rngx.randn(2, 4, 4, 3).astype(np.float32))
    noise = jnp.asarray(rngx.randn(2, 4, 4, 3).astype(np.float32))
    t = jnp.array([20, 80])
    xt = S.q_sample(sched, x0, t, noise)
    v = S.get_v(sched, x0, noise, t)
    x0_rec = S.predict_start_from_z_and_v(sched, xt, t, v)
    assert np.allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-4)


def test_timestep_embedding_matches_reference_convention():
    emb = S.timestep_embedding(jnp.array([0, 1, 999]), 320)
    assert emb.shape == (3, 320)
    # t=0: cos half = 1, sin half = 0
    assert np.allclose(np.asarray(emb[0, :160]), 1.0)
    assert np.allclose(np.asarray(emb[0, 160:]), 0.0)
