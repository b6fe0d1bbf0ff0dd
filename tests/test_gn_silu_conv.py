"""Fused GN+SiLU+conv3x3 Pallas megakernel vs the XLA composition."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mgldvsr_tpu.ops.pallas.gn_silu_conv import gn_silu_conv3x3


def _ref(x, gw, gb, k, b, groups, eps):
    t, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(t, h * w, groups, c // groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.var(xf, axis=(1, 3), keepdims=True)
    xn = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(t, h, w, c)
    xn = xn * gw + gb
    xn = xn * jax.nn.sigmoid(xn)
    return jax.lax.conv_general_dilated(
        xn.astype(x.dtype), k.astype(x.dtype), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b


@pytest.mark.parametrize("t,h,w,c,co,groups", [
    (2, 8, 8, 64, 96, 32),     # co not a tile multiple
    (1, 16, 8, 32, 32, 8),     # rectangular
    (3, 8, 8, 64, 128, 32),
])
def test_fused_matches_xla(t, h, w, c, co, groups):
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    x = jax.random.normal(ks[0], (t, h, w, c), jnp.float32)
    gw = jax.random.normal(ks[1], (c,)) * 0.5 + 1.0
    gb = jax.random.normal(ks[2], (c,)) * 0.2
    k = jax.random.normal(ks[3], (3, 3, c, co)) * 0.05
    b = jax.random.normal(ks[4], (co,)) * 0.1

    got = gn_silu_conv3x3(x, gw, gb, k, b, groups=groups, co_tile=64)
    want = _ref(x, gw, gb, k, b, groups, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_fused_bf16_io():
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    t, h, w, c, co = 2, 8, 8, 64, 64
    x = jax.random.normal(ks[0], (t, h, w, c), jnp.bfloat16)
    gw = jnp.ones((c,))
    gb = jnp.zeros((c,))
    k = (jax.random.normal(ks[3], (3, 3, c, co)) * 0.05)
    b = jnp.zeros((co,))
    got = gn_silu_conv3x3(x, gw, gb, k, b, groups=16)
    assert got.dtype == jnp.bfloat16
    want = _ref(x, gw, gb, k, b, 16, 1e-5)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=0.1)


def test_fused_zero_padding_borders():
    """Border pixels must see zero-padded (not wrapped/replicated) taps."""
    t, h, w, c, co = 1, 8, 8, 32, 32
    x = jnp.ones((t, h, w, c), jnp.float32)
    gw = jnp.ones((c,))
    # constant input normalizes to exactly gn_bias — make it nonzero so the
    # conv's tap count (4 at corners vs 9 inside) shows up in the output
    gb = jnp.full((c,), 0.5)
    k = jnp.ones((3, 3, c, co), jnp.float32)
    b = jnp.zeros((co,))
    got = np.asarray(gn_silu_conv3x3(x, gw, gb, k, b, groups=8))
    want = np.asarray(_ref(x, gw, gb, k, b, 8, 1e-5))
    np.testing.assert_allclose(got, want, atol=1e-4)
    # corner has 4 valid taps, center 9 — the ratio proves zero padding
    assert got[0, 0, 0, 0] != got[0, 4, 4, 0]


def test_fused_grad_matches_xla():
    """custom_vjp: grads of the fused op equal the XLA composition's."""
    ks = jax.random.split(jax.random.PRNGKey(2), 5)
    t, h, w, c, co, groups = 1, 8, 8, 32, 32, 8
    x = jax.random.normal(ks[0], (t, h, w, c), jnp.float32)
    gw = jnp.ones((c,)) + 0.1
    gb = jnp.zeros((c,)) + 0.05
    k = jax.random.normal(ks[3], (3, 3, c, co)) * 0.05
    b = jnp.zeros((co,))

    def loss_fused(x, gw, gb, k, b):
        return jnp.sum(gn_silu_conv3x3(x, gw, gb, k, b, groups=groups) ** 2)

    def loss_ref(x, gw, gb, k, b):
        return jnp.sum(_ref(x, gw, gb, k, b, groups, 1e-5) ** 2)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, gw, gb, k, b)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, gw, gb, k, b)
    for a, bb in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=2e-3)


def test_vmem_guard_falls_back():
    from mgldvsr_tpu.ops.pallas.gn_silu_conv import fits_vmem

    assert fits_vmem(64, 64, 320, 2)          # UNet latent scale
    assert not fits_vmem(512, 512, 512, 2)    # VAE pixel scale
    # 1920-ch skip-concat block: wants 19.1M on hardware (double-buffered
    # blocks) — must fall back
    assert not fits_vmem(32, 32, 1920, 2)


def test_module_param_tree_and_output_equivalence(monkeypatch):
    """The fused flag must not change the param tree, and the module output
    must match the unfused path."""
    from flax import traverse_util

    from mgldvsr_tpu.models.unet import DualResBlock

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 32))
    emb = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    s = {"8": jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 16))}
    mod = DualResBlock(64, 16, 16)

    monkeypatch.delenv("MGLD_FUSED_GN_CONV", raising=False)
    p0 = mod.init(jax.random.PRNGKey(3), x, emb, s)
    out0 = mod.apply(p0, x, emb, s)

    monkeypatch.setenv("MGLD_FUSED_GN_CONV", "1")
    p1 = mod.init(jax.random.PRNGKey(3), x, emb, s)
    k0 = set(traverse_util.flatten_dict(p0, sep="/"))
    k1 = set(traverse_util.flatten_dict(p1, sep="/"))
    assert k0 == k1, (sorted(k0 - k1), sorted(k1 - k0))
    out1 = mod.apply(p0, x, emb, s)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0), atol=2e-4)


def test_int8_conv_approximates_fp(monkeypatch):
    """MGLD_INT8_CONV quantized conv tracks the fp conv within dynamic-range
    quantization error (sanity for the perf experiment)."""
    import os

    import numpy as np
    import jax
    import jax.numpy as jnp

    monkeypatch.setenv("MGLD_INT8_CONV", "1")
    from mgldvsr_tpu.models.layers import Int8Conv3x3, conv3x3

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 32))
    q = Int8Conv3x3(64)
    p = q.init(jax.random.PRNGKey(1), x)
    yq = q.apply(p, x)

    monkeypatch.delenv("MGLD_INT8_CONV")
    f = conv3x3(64)
    yf = f.apply({"params": dict(p["params"])}, x)
    err = np.abs(np.asarray(yq - yf))
    ref = np.abs(np.asarray(yf)).max()
    assert err.max() < 0.05 * ref, (err.max(), ref)
