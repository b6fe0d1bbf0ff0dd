"""Stage-2 VAE trainer tests: loss terms vs torch oracles, one full
generator+discriminator step on tiny shapes."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from flax import traverse_util

from mgldvsr_tpu.models.vae import VAEConfig
from mgldvsr_tpu.train.losses import (
    adopt_weight,
    hinge_d_loss,
    l1_diff,
    sobel_magnitude,
)
from mgldvsr_tpu.train.stage2 import Stage2Config, Stage2State, Stage2Trainer


def _rand(*s, seed=0):
    return np.random.RandomState(seed).randn(*s).astype(np.float32)


def test_l1_diff_matches_torch():
    t = 4
    x = _rand(t, 6, 6, 3, seed=0)
    y = _rand(t, 6, 6, 3, seed=1)
    ours = np.asarray(l1_diff(jnp.asarray(x), jnp.asarray(y), t))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2).reshape(1, t, 3, 6, 6)
    yt = torch.from_numpy(y).permute(0, 3, 1, 2).reshape(1, t, 3, 6, 6)
    dx = xt[:, :-1] - xt[:, 1:]
    dy = yt[:, :-1] - yt[:, 1:]
    ref = (dx - dy).abs().reshape(t - 1, 3, 6, 6).numpy().transpose(0, 2, 3, 1)
    assert np.allclose(ours, ref, atol=1e-6)


def test_sobel_matches_kornia_semantics():
    """Oracle: normalized sobel kernels, replicate pad, magnitude."""
    x = _rand(1, 8, 8, 2, seed=2)
    ours = np.asarray(sobel_magnitude(jnp.asarray(x)))

    kx = torch.tensor([[-1.0, 0, 1], [-2, 0, 2], [-1, 0, 1]]) / 8.0
    ky = kx.T
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    xp = F.pad(xt, (1, 1, 1, 1), mode="replicate")
    c = xt.shape[1]
    wx = kx[None, None].repeat(c, 1, 1, 1)
    wy = ky[None, None].repeat(c, 1, 1, 1)
    gx = F.conv2d(xp, wx, groups=c)
    gy = F.conv2d(xp, wy, groups=c)
    ref = torch.sqrt(gx**2 + gy**2 + 1e-6).numpy().transpose(0, 2, 3, 1)
    assert np.allclose(ours, ref, atol=1e-5), np.abs(ours - ref).max()


def test_hinge_and_adopt():
    lr = jnp.asarray([0.5, -0.2])
    lf = jnp.asarray([-0.3, 0.8])
    ours = float(hinge_d_loss(lr, lf))
    ref = 0.5 * (np.mean([0.5, 1.2]) + np.mean([0.7, 1.8]))
    assert abs(ours - ref) < 1e-6
    assert float(adopt_weight(1.0, jnp.asarray(100), 501)) == 0.0
    assert float(adopt_weight(1.0, jnp.asarray(600), 501)) == 1.0


def test_stage2_full_step():
    t = 3
    cfg = Stage2Config(num_frames=t, grad_accum=1, disc_start=0)
    vcfg = VAEConfig(ch=32, ch_mult=(1, 1, 2, 2), num_res_blocks=1,
                     num_frames=t, enable_fusion=True, num_fuse_block=1)
    trainer = Stage2Trainer(vcfg, cfg)
    h = w = 32
    state = trainer.init_state(jax.random.PRNGKey(0), h, w)

    lq = jnp.asarray(np.random.RandomState(0).rand(t, h, w, 3), jnp.float32)
    gt = jnp.asarray(np.random.RandomState(1).rand(t, h, w, 3), jnp.float32)
    lat = jnp.asarray(_rand(t, h // 8, w // 8, 4, seed=2))

    step = jax.jit(trainer.train_step)
    new_state, m = step(state, lq, gt, lat, jax.random.PRNGKey(3))

    for k in ("loss_g", "loss_d", "nll_loss", "rec_loss", "temp_loss"):
        assert np.isfinite(float(m[k])), (k, m[k])
    assert int(new_state.step) == 1

    # only fusion/temporal params train
    t0 = traverse_util.flatten_dict(state.gen_trainable, sep="/")
    t1 = traverse_util.flatten_dict(new_state.gen_trainable, sep="/")
    assert all(("fusion_layer" in k or "temporal" in k) for k in t0)
    moved = sum(not np.array_equal(np.asarray(t0[k]), np.asarray(t1[k]))
                for k in t0)
    assert moved > 0
    # frozen untouched
    f0 = traverse_util.flatten_dict(state.gen_frozen, sep="/")
    f1 = traverse_util.flatten_dict(new_state.gen_frozen, sep="/")
    assert all(np.array_equal(np.asarray(f0[k]), np.asarray(f1[k])) for k in f0)
    # discriminator trained too (disc_start=0)
    d0 = traverse_util.flatten_dict(state.disc["params"], sep="/")
    d1 = traverse_util.flatten_dict(new_state.disc["params"], sep="/")
    assert any(not np.array_equal(np.asarray(d0[k]), np.asarray(d1[k]))
               for k in d0)


def test_stage2_split_step_equals_fused():
    """The three separately-jitted pieces (frozen_flows / gen_step /
    disc_step — the 512px path: the fused compile crashed the remote
    helper) must reproduce the fused train_step exactly: same metrics,
    same updated parameters."""
    t = 3
    cfg = Stage2Config(num_frames=t, grad_accum=1, disc_start=0)
    vcfg = VAEConfig(ch=32, ch_mult=(1, 1, 2, 2), num_res_blocks=1,
                     num_frames=t, enable_fusion=True, num_fuse_block=1)
    trainer = Stage2Trainer(vcfg, cfg)
    h = w = 32
    state = trainer.init_state(jax.random.PRNGKey(0), h, w)
    lq = jnp.asarray(np.random.RandomState(0).rand(t, h, w, 3), jnp.float32)
    gt = jnp.asarray(np.random.RandomState(1).rand(t, h, w, 3), jnp.float32)
    lat = jnp.asarray(_rand(t, h // 8, w // 8, 4, seed=2))

    fused_state, fused_m = jax.jit(trainer.train_step)(
        state, lq, gt, lat, jax.random.PRNGKey(3))

    fl, oc = jax.jit(trainer.frozen_flows)(state, gt)
    st, recon, mg = jax.jit(trainer.gen_step)(state, lq, gt, lat, fl, oc)
    st, md = jax.jit(trainer.disc_step)(st, gt, recon)
    split_m = {**mg, **md}

    assert set(split_m) == set(fused_m)
    for k in fused_m:
        np.testing.assert_allclose(np.asarray(split_m[k]),
                                   np.asarray(fused_m[k]),
                                   rtol=2e-5, atol=1e-6, err_msg=k)
    a = traverse_util.flatten_dict(fused_state.gen_trainable, sep="/")
    b = traverse_util.flatten_dict(st.gen_trainable, sep="/")
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                   rtol=2e-5, atol=1e-6, err_msg=k)
    assert int(st.step) == int(fused_state.step) == 1


def test_vae_use_checkpoint_identical_tree_and_outputs():
    """VAEConfig.use_checkpoint (per-block remat for the pixel-space
    stage-2 fwd+bwd) must not change the parameter tree or the math —
    only the backward's rematerialization schedule."""
    import dataclasses

    from mgldvsr_tpu.models.vae import VideoAutoencoderKLResi

    cfg = VAEConfig(ch=32, ch_mult=(1, 1, 2, 2), num_frames=5,
                    enable_fusion=True, num_res_blocks=1)
    k = jax.random.PRNGKey(0)
    frames = jax.random.uniform(k, (5, 32, 32, 3))
    lat = jnp.zeros((5, 4, 4, 4))
    plain = VideoAutoencoderKLResi(cfg)
    remat = VideoAutoencoderKLResi(
        dataclasses.replace(cfg, use_checkpoint=True))
    params = plain.init(k, frames, lat)
    params_r = remat.init(k, frames, lat)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_r))

    m_a, fea_a = plain.apply(params, frames, method="encode")
    m_b, fea_b = remat.apply(params, frames, method="encode")
    np.testing.assert_array_equal(np.asarray(m_a), np.asarray(m_b))
    d_a = plain.apply(params, lat, fea_a, 1.0, method="decode")
    d_b = remat.apply(params, lat, fea_b, 1.0, method="decode")
    np.testing.assert_array_equal(np.asarray(d_a), np.asarray(d_b))

    # gradient through the remat decoder matches the plain one
    def loss(mod):
        def f(p):
            _, fea = mod.apply(p, frames, method="encode")
            return jnp.mean(
                jnp.abs(mod.apply(p, lat, fea, 1.0, method="decode")))
        return f

    g_a = jax.grad(loss(plain))(params)
    g_b = jax.grad(loss(remat))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_a),
                    jax.tree_util.tree_leaves(g_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-6, rtol=1e-5)
