"""Heritage op tests: DCN equivalences, upfirdn2d vs scipy oracle,
fused leaky relu analytics."""
import numpy as np
import jax
import jax.numpy as jnp
from scipy import signal as sps

from mgldvsr_tpu.ops.dcn import modulated_deform_conv2d
from mgldvsr_tpu.ops.stylegan_ops import (
    fused_leaky_relu,
    make_resample_kernel,
    upfirdn2d,
)


def _rand(*s, seed=0):
    return np.random.RandomState(seed).randn(*s).astype(np.float32)


def test_dcn_zero_offset_equals_conv():
    n, h, w, cin, cout = 1, 8, 8, 4, 6
    x = jnp.asarray(_rand(n, h, w, cin, seed=0))
    weight = jnp.asarray(_rand(3, 3, cin, cout, seed=1) * 0.2)
    offset = jnp.zeros((n, h, w, 2 * 9))
    mask = jnp.ones((n, h, w, 9))
    out = modulated_deform_conv2d(x, offset, mask, weight)

    ref = jax.lax.conv_general_dilated(
        x, weight, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-4), (
        np.abs(np.asarray(out) - np.asarray(ref)).max()
    )


def test_dcn_integer_shift_matches_shifted_conv():
    """Constant integer offset == convolving a shifted input (interior)."""
    n, h, w, cin, cout = 1, 10, 10, 3, 5
    x_np = _rand(n, h, w, cin, seed=2)
    x = jnp.asarray(x_np)
    weight = jnp.asarray(_rand(3, 3, cin, cout, seed=3) * 0.2)
    # shift sampling +1 in x
    offset = jnp.zeros((n, h, w, 9, 2)).at[..., 1].set(1.0).reshape(n, h, w, 18)
    out = modulated_deform_conv2d(x, offset, None, weight)

    shifted = jnp.asarray(np.roll(x_np, -1, axis=2))
    ref = jax.lax.conv_general_dilated(
        shifted, weight, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # compare interior (border differs due to zero vs roll wrap)
    assert np.allclose(
        np.asarray(out)[:, 2:-2, 2:-2], np.asarray(ref)[:, 2:-2, 2:-2],
        atol=1e-4,
    )


def test_dcn_mask_scales_contributions():
    n, h, w, cin, cout = 1, 6, 6, 2, 2
    x = jnp.asarray(_rand(n, h, w, cin, seed=4))
    weight = jnp.asarray(_rand(3, 3, cin, cout, seed=5) * 0.2)
    offset = jnp.zeros((n, h, w, 18))
    half = modulated_deform_conv2d(x, offset, jnp.full((n, h, w, 9), 0.5), weight)
    full = modulated_deform_conv2d(x, offset, jnp.ones((n, h, w, 9)), weight)
    assert np.allclose(np.asarray(half), 0.5 * np.asarray(full), atol=1e-5)


def test_dcn_differentiable():
    x = jnp.asarray(_rand(1, 6, 6, 2, seed=6))
    weight = jnp.asarray(_rand(3, 3, 2, 2, seed=7) * 0.2)
    offset = jnp.full((1, 6, 6, 18), 0.3)

    g = jax.grad(
        lambda o: jnp.sum(modulated_deform_conv2d(x, o, None, weight))
    )(offset)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0  # offsets receive gradient


def _upfirdn_oracle(x, k, up, down, pad):
    """Direct numpy upfirdn for one channel image."""
    h, w = x.shape
    z = np.zeros((h * up, w * up), x.dtype)
    z[::up, ::up] = x
    p0, p1 = pad
    z = np.pad(z, ((max(p0, 0), max(p1, 0)), (max(p0, 0), max(p1, 0))))
    if p0 < 0 or p1 < 0:
        z = z[max(-p0, 0) : z.shape[0] - max(-p1, 0),
              max(-p0, 0) : z.shape[1] - max(-p1, 0)]
    out = sps.convolve2d(z, k, mode="valid")
    return out[::down, ::down]


def test_upfirdn2d_matches_oracle():
    x = _rand(6, 7, seed=8)
    k = make_resample_kernel([1, 3, 3, 1])
    for up, down, pad in [(1, 1, (1, 2)), (2, 1, (2, 1)), (1, 2, (1, 1))]:
        ours = np.asarray(
            upfirdn2d(jnp.asarray(x)[None, :, :, None], jnp.asarray(k),
                      up, down, pad)
        )[0, :, :, 0]
        ref = _upfirdn_oracle(x, k, up, down, pad)
        assert ours.shape == ref.shape, (up, down, pad, ours.shape, ref.shape)
        assert np.allclose(ours, ref, atol=1e-5), np.abs(ours - ref).max()


def test_fused_leaky_relu():
    x = jnp.asarray([-1.0, 2.0])
    b = jnp.asarray([0.5, 0.0])
    out = np.asarray(fused_leaky_relu(x, b))
    expect = np.asarray([-0.5 * 0.2, 2.0]) * np.sqrt(2)
    assert np.allclose(out, expect, atol=1e-6)
