"""Stage-1 trainer tests: param partitioning, loss decrease direction,
frozen params untouched, EMA update, grad accumulation, mesh sharding."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from flax import traverse_util

from tests.test_pipeline import tiny_config
from mgldvsr_tpu.infer.pipeline import MGLDVSRPipeline
from mgldvsr_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
from mgldvsr_tpu.train.trainer import (
    Stage1Config,
    Stage1Trainer,
    merge_params,
    partition_params,
)


def _jitter(params, key):
    """Random init zero-inits output convs (identity residuals), which kills
    all gradients; pretrained weights are never zero. Perturb for tests."""
    leaves, tree = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    out = [
        l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
        if jnp.issubdtype(l.dtype, jnp.floating)
        else l
        for l, k in zip(leaves, keys)
    ]
    return jax.tree_util.tree_unflatten(tree, out)


def _setup(grad_accum=1, h=32):
    pipe = MGLDVSRPipeline(tiny_config(ddpm_steps=2))
    params = pipe.init_params(jax.random.PRNGKey(0), h, h)
    params = _jitter(params, jax.random.PRNGKey(99))
    trainer = Stage1Trainer(pipe, Stage1Config(grad_accum=grad_accum))
    return pipe, trainer, trainer.init_state(params), params


def test_partition_params_selects_spade_temporal_structcond():
    _, _, state, params = _setup()
    flat_t = traverse_util.flatten_dict(state.trainable, sep="/")
    flat_f = traverse_util.flatten_dict(state.frozen, sep="/")
    # every structcond param is trainable
    assert any(p.startswith("structcond") for p in flat_t)
    assert not any(p.startswith("structcond") for p in flat_f)
    # vae/clip/raft fully frozen
    for tower in ("vae", "clip", "raft"):
        assert not any(p.startswith(tower) for p in flat_t)
        assert any(p.startswith(tower) for p in flat_f)
    # unet spade params trainable, unet conv_in frozen
    assert any(p.startswith("unet") and "spade" in p for p in flat_t)
    assert any(p.startswith("unet") and "conv_in" in p for p in flat_f)
    # round trip
    merged = merge_params(state.trainable, state.frozen)
    orig = traverse_util.flatten_dict(params, sep="/")
    back = traverse_util.flatten_dict(merged, sep="/")
    assert set(orig) == set(back)


def test_train_step_updates_only_trainable():
    _, trainer, state, _ = _setup()
    bt = trainer.pipe.cfg.num_frames
    lq = jnp.asarray(np.random.RandomState(0).rand(bt, 32, 32, 3), jnp.float32)
    gt = jnp.asarray(np.random.RandomState(1).rand(bt, 32, 32, 3), jnp.float32)
    new_state, metrics = jax.jit(trainer.train_step)(state, lq, gt, jax.random.PRNGKey(2))

    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0
    assert int(new_state.step) == 1

    # frozen leaves identical
    f0 = traverse_util.flatten_dict(state.frozen, sep="/")
    f1 = traverse_util.flatten_dict(new_state.frozen, sep="/")
    for k in f0:
        assert np.array_equal(np.asarray(f0[k]), np.asarray(f1[k]))

    # some trainable leaf moved
    t0 = traverse_util.flatten_dict(state.trainable, sep="/")
    t1 = traverse_util.flatten_dict(new_state.trainable, sep="/")
    moved = sum(
        not np.array_equal(np.asarray(t0[k]), np.asarray(t1[k])) for k in t0
    )
    assert moved > 0

    # EMA moved toward new params (warmup decay is small early on)
    e1 = traverse_util.flatten_dict(new_state.ema, sep="/")
    k = next(k for k in t0 if not np.array_equal(np.asarray(t0[k]), np.asarray(t1[k])))
    assert not np.array_equal(np.asarray(e1[k]), np.asarray(t0[k]))


def test_grad_accum_defers_updates():
    _, trainer, state, _ = _setup(grad_accum=2)
    bt = trainer.pipe.cfg.num_frames
    lq = jnp.asarray(np.random.RandomState(0).rand(bt, 32, 32, 3), jnp.float32)
    gt = jnp.asarray(np.random.RandomState(1).rand(bt, 32, 32, 3), jnp.float32)
    t0 = traverse_util.flatten_dict(state.trainable, sep="/")

    step = jax.jit(trainer.train_step)
    s1, _ = step(state, lq, gt, jax.random.PRNGKey(2))
    t1 = traverse_util.flatten_dict(s1.trainable, sep="/")
    # first micro-step: no parameter change yet
    assert all(np.array_equal(np.asarray(t0[k]), np.asarray(t1[k])) for k in t0)

    s2, _ = step(s1, lq, gt, jax.random.PRNGKey(3))
    t2 = traverse_util.flatten_dict(s2.trainable, sep="/")
    assert any(
        not np.array_equal(np.asarray(t1[k]), np.asarray(t2[k])) for k in t1
    )


def test_train_step_sharded_on_mesh():
    pipe, trainer, state, _ = _setup()
    mesh = make_mesh(8, tp=2)
    t = pipe.cfg.num_frames
    bt = 4 * t  # dp=4 clips
    lq = jnp.asarray(np.random.RandomState(0).rand(bt, 32, 32, 3), jnp.float32)
    gt = jnp.asarray(np.random.RandomState(1).rand(bt, 32, 32, 3), jnp.float32)
    with mesh:
        state = state._replace(
            trainable=shard_params(state.trainable, mesh),
            frozen=shard_params(state.frozen, mesh),
        )
        lq = jax.device_put(lq, NamedSharding(mesh, P("data")))
        gt = jax.device_put(gt, NamedSharding(mesh, P("data")))
        new_state, metrics = jax.jit(trainer.train_step)(
            state, lq, gt, jax.random.PRNGKey(2)
        )
    assert np.isfinite(float(metrics["loss"]))


def test_with_ema_swaps_trainables():
    from mgldvsr_tpu.train.trainer import with_ema

    _, trainer, state, params = _setup()
    full = with_ema(state)
    f0 = traverse_util.flatten_dict(full, sep="/")
    p0 = traverse_util.flatten_dict(params, sep="/")
    assert set(f0) == set(p0)


def test_use_checkpoint_remat_matches_plain():
    """Activation remat (use_checkpoint) must not change values or grads —
    identical param tree, identical forward, matching backward."""
    import dataclasses

    from mgldvsr_tpu.models.unet import (
        InflatedUNetDualCond,
        StructCondEncoder,
        StructCondConfig,
        UNetConfig,
    )

    ucfg = UNetConfig(
        model_channels=32, num_head_channels=16, context_dim=32,
        semb_channels=32, channel_mult=(1, 2), attention_resolutions=(1, 2),
        num_frames=5,
    )
    scfg = StructCondConfig(
        model_channels=32, out_channels=32, channel_mult=(1, 1),
        attention_resolutions=(1, 2), num_frames=5,
    )
    unet = InflatedUNetDualCond(ucfg)
    unet_r = InflatedUNetDualCond(dataclasses.replace(ucfg, use_checkpoint=True))
    sc = StructCondEncoder(scfg)
    sc_r = StructCondEncoder(dataclasses.replace(scfg, use_checkpoint=True))

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 8, 8, 4))
    t = jnp.full((5,), 7, jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (5, 3, 32))
    zlq = jax.random.normal(jax.random.PRNGKey(3), (5, 8, 8, 4))

    sp = sc.init(rng, zlq, t)
    sp_r = sc_r.init(rng, zlq, t)
    s_cond = sc.apply(sp, zlq, t)
    up = unet.init(rng, x, t, ctx, s_cond)
    up_r = unet_r.init(rng, x, t, ctx, s_cond)

    # identical param trees (remat must not change init or naming)
    for a, b in zip(jax.tree_util.tree_leaves(up), jax.tree_util.tree_leaves(up_r)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(sp), jax.tree_util.tree_leaves(sp_r)):
        assert np.array_equal(np.asarray(a), np.asarray(b))

    def loss(params, mod_u, mod_s):
        cond = mod_s.apply(params["s"], zlq, t)
        out = mod_u.apply(params["u"], x, t, ctx, cond)
        return jnp.mean(out ** 2)

    p = {"u": up, "s": sp}
    l0, g0 = jax.value_and_grad(loss)(p, unet, sc)
    l1, g1 = jax.value_and_grad(loss)(p, unet_r, sc_r)
    assert np.allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6)


def test_zero1_shards_opt_state_and_matches_unsharded():
    """ZeRO-1 placement: optimizer moments + EMA shard over 'data', params
    stay replicated, and one train step produces the same result as the
    fully-replicated run."""
    from mgldvsr_tpu.parallel import mesh as mesh_mod
    from mgldvsr_tpu.parallel.mesh import place_train_state, state_shardings

    pipe, trainer, state, _ = _setup()
    t = pipe.cfg.num_frames
    lq = jnp.asarray(np.random.RandomState(0).rand(t, 32, 32, 3), jnp.float32)
    gt = jnp.asarray(np.random.RandomState(1).rand(t, 32, 32, 3), jnp.float32)

    ref_state, ref_metrics = jax.jit(trainer.train_step)(
        state, lq, gt, jax.random.PRNGKey(2))

    mesh = make_mesh(8, tp=1)
    old_min = mesh_mod.ZERO1_MIN_SIZE
    mesh_mod.ZERO1_MIN_SIZE = 1  # tiny model: exercise the path anyway
    try:
        placed = place_train_state(state, mesh, zero1=True)
    finally:
        mesh_mod.ZERO1_MIN_SIZE = old_min

    # moments sharded over 'data'; trainable params replicated
    def specs(tree):
        return [x.sharding.spec for x in jax.tree_util.tree_leaves(tree)
                if hasattr(x, "sharding")]
    assert any("data" in (s or ()) for s in specs(placed.opt_state)), \
        "no opt-state leaf picked up a data shard"
    assert any("data" in (s or ()) for s in specs(placed.ema))
    assert all("data" not in (s or ()) for s in specs(placed.trainable))

    with mesh:
        step = jax.jit(trainer.train_step,
                       out_shardings=(state_shardings(placed), None))
        new_state, metrics = step(placed, lq, gt, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=1e-5)

    # the updated state keeps the ZeRO-1 placement
    assert any("data" in (s or ()) for s in specs(new_state.opt_state))

    # parity with the unsharded step: not bitwise — resharding changes the
    # reduction order of conv backward psums, and Adam's rsqrt amplifies
    # those ulps — but a single step must stay within fp32 noise
    ref_flat = traverse_util.flatten_dict(ref_state.trainable, sep="/")
    new_flat = traverse_util.flatten_dict(new_state.trainable, sep="/")
    for k in ref_flat:
        np.testing.assert_allclose(np.asarray(new_flat[k]),
                                   np.asarray(ref_flat[k]),
                                   rtol=1e-2, atol=1e-4, err_msg=k)


def test_frozen_dtype_bf16_storage_and_step():
    """frozen_dtype='bfloat16' halves frozen-tower storage; the donated
    step still runs, updates trainables (fp32 masters), and the loss is
    finite. Single-chip memory lever for 512px stage-1 (r03)."""
    pipe = MGLDVSRPipeline(tiny_config(ddpm_steps=2))
    params = pipe.init_params(jax.random.PRNGKey(0), 32, 32)
    params = _jitter(params, jax.random.PRNGKey(99))
    trainer = Stage1Trainer(
        pipe, Stage1Config(grad_accum=1, frozen_dtype="bfloat16"))
    state = trainer.init_state(params)
    fdts = {str(l.dtype) for l in jax.tree_util.tree_leaves(state.frozen)
            if jnp.issubdtype(l.dtype, jnp.floating)}
    assert fdts == {"bfloat16"}, fdts
    tdts = {str(l.dtype) for l in jax.tree_util.tree_leaves(state.trainable)
            if jnp.issubdtype(l.dtype, jnp.floating)}
    assert tdts == {"float32"}, tdts
    bt = trainer.pipe.cfg.num_frames
    lq = jnp.asarray(np.random.RandomState(0).rand(bt, 32, 32, 3), jnp.float32)
    gt = jnp.asarray(np.random.RandomState(1).rand(bt, 32, 32, 3), jnp.float32)
    step = jax.jit(trainer.train_step, donate_argnums=0)
    state, m = step(state, lq, gt, jax.random.PRNGKey(2))
    state, m = step(state, lq, gt, jax.random.PRNGKey(3))
    assert np.isfinite(float(m["loss"])) and int(state.step) == 2
