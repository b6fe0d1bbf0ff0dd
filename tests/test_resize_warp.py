"""Golden tests for resize / flow_warp / occlusion against torch CPU.

torch is only a test-time oracle here (the reference's semantics are defined
in terms of F.interpolate / F.grid_sample); the framework itself never
imports torch on the compute path.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from mgldvsr_tpu.ops.resize import resize2d  # noqa: E402
from mgldvsr_tpu.ops.warp import flow_warp, resize_flow  # noqa: E402
from mgldvsr_tpu.ops.occlusion import forward_backward_consistency_check  # noqa: E402


def _rand(*shape, seed=0):
    return np.random.RandomState(seed).rand(*shape).astype(np.float32)


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
@pytest.mark.parametrize("size", [(8, 8), (17, 23), (64, 48)])
def test_resize_up_matches_torch(mode, size):
    x = _rand(2, 16, 12, 3)
    ours = np.asarray(resize2d(jnp.asarray(x), size, method=mode))
    ref = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=size, mode=mode
    ).permute(0, 2, 3, 1).numpy()
    assert np.allclose(ours, ref, atol=2e-5), np.abs(ours - ref).max()


@pytest.mark.parametrize("size", [(8, 6), (5, 5)])
def test_resize_area_matches_torch(size):
    x = _rand(1, 16, 12, 2, seed=1)
    ours = np.asarray(resize2d(jnp.asarray(x), size, method="area"))
    ref = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=size, mode="area"
    ).permute(0, 2, 3, 1).numpy()
    assert np.allclose(ours, ref, atol=2e-5)


def test_resize_bicubic_downscale_matches_torch():
    x = _rand(1, 32, 32, 3, seed=2)
    ours = np.asarray(resize2d(jnp.asarray(x), (8, 8), method="bicubic"))
    ref = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=(8, 8), mode="bicubic"
    ).permute(0, 2, 3, 1).numpy()
    assert np.allclose(ours, ref, atol=2e-5)


def _torch_flow_warp(x_nchw, flow_nhwc, mode="bilinear", padding_mode="zeros"):
    """Reference semantics: basicsr flow_warp (align_corners=True)."""
    n, c, h, w = x_nchw.shape
    grid_y, grid_x = torch.meshgrid(
        torch.arange(0, h, dtype=torch.float32),
        torch.arange(0, w, dtype=torch.float32),
        indexing="ij",
    )
    grid = torch.stack((grid_x, grid_y), 2)
    vgrid = grid[None] + flow_nhwc
    vx = 2.0 * vgrid[..., 0] / max(w - 1, 1) - 1.0
    vy = 2.0 * vgrid[..., 1] / max(h - 1, 1) - 1.0
    return F.grid_sample(
        x_nchw,
        torch.stack((vx, vy), dim=3),
        mode=mode,
        padding_mode=padding_mode,
        align_corners=True,
    )


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_flow_warp_matches_torch_grid_sample(padding_mode):
    x = _rand(2, 9, 11, 4, seed=3)
    flow = (_rand(2, 9, 11, 2, seed=4) - 0.5) * 6.0
    ours = np.asarray(
        flow_warp(jnp.asarray(x), jnp.asarray(flow), padding_mode=padding_mode)
    )
    ref = _torch_flow_warp(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(flow),
        padding_mode=padding_mode,
    ).permute(0, 2, 3, 1).numpy()
    assert np.allclose(ours, ref, atol=1e-5), np.abs(ours - ref).max()


def test_flow_warp_zero_flow_is_identity():
    x = _rand(1, 8, 8, 2, seed=5)
    out = np.asarray(flow_warp(jnp.asarray(x), jnp.zeros((1, 8, 8, 2))))
    assert np.allclose(out, x, atol=1e-6)


def test_flow_warp_differentiable():
    import jax

    x = jnp.asarray(_rand(1, 8, 8, 2, seed=6))
    flow = jnp.asarray((_rand(1, 8, 8, 2, seed=7) - 0.5) * 2)
    g = jax.grad(lambda z: flow_warp(z, flow).sum())(x)
    assert g.shape == x.shape
    assert np.isfinite(np.asarray(g)).all()
    gf = jax.grad(lambda f: flow_warp(x, f).sum())(flow)
    assert np.isfinite(np.asarray(gf)).all()


def test_resize_flow_scales_displacements():
    flow = jnp.ones((1, 8, 8, 2))
    out = resize_flow(flow, "shape", (4, 16))
    assert out.shape == (1, 4, 16, 2)
    assert np.allclose(np.asarray(out[..., 0]), 2.0, atol=1e-5)  # w ratio 2
    assert np.allclose(np.asarray(out[..., 1]), 0.5, atol=1e-5)  # h ratio 0.5


def test_occlusion_check_consistent_flow_unoccluded():
    # A perfectly consistent constant flow pair: fwd = -bwd => diff = 0.
    fwd = jnp.full((1, 8, 8, 2), 1.5)
    bwd = -fwd
    fwd_occ, bwd_occ = forward_backward_consistency_check(fwd, bwd)
    # interior (away from boundary zero-padding) must be unoccluded
    assert np.all(np.asarray(fwd_occ[:, 2:-2, 2:-2]) == 0)
    assert fwd_occ.shape == (1, 8, 8, 1)


def test_occlusion_check_inconsistent_flow_occluded():
    fwd = jnp.full((1, 8, 8, 2), 4.0)
    bwd = jnp.full((1, 8, 8, 2), 4.0)  # same sign => inconsistent
    fwd_occ, _ = forward_backward_consistency_check(fwd, bwd)
    assert np.asarray(fwd_occ).mean() > 0.5


def test_phase_decomposed_upsample_matches_repeat_conv():
    """Upsample(use_conv=True) = nearest-2x + 3x3 conv exactly, via the
    4-phase 2x2 decomposition (borders included)."""
    import flax.linen as nn

    from mgldvsr_tpu.models.layers import Upsample, conv3x3

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 5, 7, 8), jnp.float32)
    up = Upsample(8)
    params = up.init(jax.random.PRNGKey(0), x)
    got = up.apply(params, x)

    class Ref(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            return conv3x3(8, name="conv")(x)

    want = Ref().apply(params, x)
    assert got.shape == want.shape == (2, 10, 14, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_resident_attention_padded_n():
    """Non-multiple-of-128 sequence lengths pad + key-mask inside the
    kernel and match the fp32-softmax reference exactly."""
    import jax
    import jax.numpy as jnp

    from mgldvsr_tpu.ops.pallas.attention import (
        _reference,
        pick_block_q,
        resident_attention,
    )

    for n in (1100, 2000):
        q = jax.random.normal(jax.random.PRNGKey(0), (2, n, 64))
        k = jax.random.normal(jax.random.PRNGKey(1), (2, n, 64))
        v = jax.random.normal(jax.random.PRNGKey(2), (2, n, 64))
        bq = pick_block_q(n, 64, 4)
        assert bq > 0
        out = resident_attention(q, k, v, bq, interpret=True)
        ref = _reference(q, k, v)
        assert float(jnp.abs(out - ref).max()) < 1e-5
