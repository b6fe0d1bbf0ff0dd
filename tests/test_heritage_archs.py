"""Heritage architecture tests: shapes, finiteness, and structural
invariants on tiny configs."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mgldvsr_tpu.models.heritage.sr_archs import (
    MSRResNet,
    RCAB,
    RRDBNet,
    SRVGGNetCompact,
    UNetDiscriminatorSN,
    pixel_shuffle,
)
from mgldvsr_tpu.models.heritage.video_archs import (
    BasicVSR,
    BasicVSRPlusPlus,
    CouplePropModule,
    EDVR,
)


def _rand(*s, seed=0):
    return jnp.asarray(np.random.RandomState(seed).rand(*s), jnp.float32)


def test_pixel_shuffle_matches_torch_semantics():
    import torch

    x = np.random.RandomState(0).randn(1, 4, 3, 8).astype(np.float32)
    ours = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
    ref = (
        torch.pixel_shuffle(torch.from_numpy(x).permute(0, 3, 1, 2), 2)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    assert np.allclose(ours, ref)


def test_rrdbnet_x4():
    m = RRDBNet(num_feat=16, num_block=2, num_grow_ch=8)
    x = _rand(1, 8, 8, 3)
    p = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(p, x)
    assert y.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_msrresnet_and_srvgg():
    x = _rand(1, 8, 8, 3, seed=1)
    m = MSRResNet(num_feat=16, num_block=2)
    y = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    assert y.shape == (1, 32, 32, 3)

    m2 = SRVGGNetCompact(num_feat=16, num_conv=2)
    y2 = m2.apply(m2.init(jax.random.PRNGKey(0), x), x)
    assert y2.shape == (1, 32, 32, 3)


def test_rcab_and_unet_discriminator():
    x = _rand(1, 16, 16, 32, seed=2)
    m = RCAB(num_feat=32)
    y = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    assert y.shape == x.shape

    img = _rand(1, 32, 32, 3, seed=3)
    d = UNetDiscriminatorSN(num_feat=16)
    vars_ = d.init(jax.random.PRNGKey(0), img)
    logits = d.apply(vars_, img)
    assert logits.shape == (1, 32, 32, 1)
    assert np.isfinite(np.asarray(logits)).all()


def _fake_flows(b, t, h, w):
    return (jnp.zeros((b, t - 1, h, w, 2)), jnp.zeros((b, t - 1, h, w, 2)))


def test_basicvsr():
    b, t, h, w = 1, 3, 8, 8
    frames = _rand(b, t, h, w, 3, seed=4)
    ff, fb = _fake_flows(b, t, h, w)
    m = BasicVSR(num_feat=8, num_block=1)
    p = m.init(jax.random.PRNGKey(0), frames, ff, fb)
    y = m.apply(p, frames, ff, fb)
    assert y.shape == (b, t, h * 4, w * 4, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_basicvsrpp():
    b, t, h, w = 1, 3, 8, 8
    frames = _rand(b, t, h, w, 3, seed=5)
    ff, fb = _fake_flows(b, t, h, w)
    m = BasicVSRPlusPlus(num_feat=8, num_block=1)
    p = m.init(jax.random.PRNGKey(0), frames, ff, fb)
    y = m.apply(p, frames, ff, fb)
    assert y.shape == (b, t, h * 4, w * 4, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_edvr():
    b, t, h, w = 1, 5, 16, 16
    frames = _rand(b, t, h, w, 3, seed=6)
    m = EDVR(num_feat=8, num_frame=t, num_extract_block=1,
             num_reconstruct_block=1, deform_groups=2)
    p = m.init(jax.random.PRNGKey(0), frames)
    y = m.apply(p, frames)
    assert y.shape == (b, h * 4, w * 4, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_couple_prop_module():
    b, t, h, w, c = 1, 4, 8, 8, 4
    lat = _rand(b, t, h, w, c, seed=7)
    ff, fb = _fake_flows(b, t, h, w)
    m = CouplePropModule(num_ch=c, num_feat=8, num_block=2)
    p = m.init(jax.random.PRNGKey(0), lat, ff, fb)
    y = m.apply(p, lat, ff, fb)
    assert y.shape == lat.shape
    assert np.isfinite(np.asarray(y)).all()


def test_swinir():
    from mgldvsr_tpu.models.heritage.swinir import SwinIR, window_partition, window_reverse

    x = _rand(1, 16, 16, 3, seed=8)
    m = SwinIR(upscale=4, embed_dim=16, depths=(2,), num_heads=(2,),
               window_size=8)
    p = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(p, x)
    assert y.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(y)).all()

    # window partition/reverse round trip
    z = _rand(2, 16, 24, 5, seed=9)
    assert np.allclose(
        np.asarray(window_reverse(window_partition(z, 8), 8, 16, 24)),
        np.asarray(z),
    )


def test_misc_archs():
    from mgldvsr_tpu.models.heritage.misc_archs import (
        DUF, ECBSR, RCAN, RIDNet, TOFlow,
    )

    x = _rand(1, 8, 8, 3, seed=10)
    m = RCAN(num_feat=16, num_group=1, num_block=1)
    y = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    assert y.shape == (1, 32, 32, 3)

    frames = _rand(1, 7, 32, 32, 3, seed=11)
    m = TOFlow()
    y = m.apply(m.init(jax.random.PRNGKey(0), frames), frames)
    assert y.shape == (1, 32, 32, 3)

    frames7 = _rand(1, 7, 8, 8, 3, seed=12)
    m = DUF(scale=4, num_layer=16)
    y = m.apply(m.init(jax.random.PRNGKey(0), frames7), frames7)
    assert y.shape == (1, 32, 32, 3)

    m = ECBSR(num_feat=8, num_block=2)
    y = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    assert y.shape == (1, 32, 32, 3)

    m = RIDNet(num_feat=16, num_block=1)
    y = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    assert y.shape == (1, 8, 8, 3)
    for arr in (y,):
        assert np.isfinite(np.asarray(arr)).all()


def test_stylegan2():
    from mgldvsr_tpu.models.heritage.stylegan2 import (
        StyleGAN2Discriminator, StyleGAN2Generator,
    )

    g = StyleGAN2Generator(out_size=16, num_style_feat=32, num_mlp=2,
                           narrow=0.125)
    z = _rand(2, 32, seed=13)
    p = g.init(jax.random.PRNGKey(0), z, rng=jax.random.PRNGKey(1))
    img = g.apply(p, z, rng=jax.random.PRNGKey(2))
    assert img.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(img)).all()

    d = StyleGAN2Discriminator(in_size=16, narrow=0.125)
    dp = d.init(jax.random.PRNGKey(0), img)
    logits = d.apply(dp, img)
    assert logits.shape == (2, 1)
    assert np.isfinite(np.asarray(logits)).all()
