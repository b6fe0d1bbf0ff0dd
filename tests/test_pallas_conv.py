"""Pallas shifted-matmul 3x3 conv (ops/pallas/conv3x3.py): parity vs XLA's
conv, VJP exactness, and the layers.Conv dispatch gate."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _ref_conv(x, k, b, strides=(1, 1)):
    return jax.lax.conv_general_dilated(
        x, k, strides, ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-5),
                                       (jnp.bfloat16, 0.05)])
def test_conv3x3_pallas_forward_parity(dtype, tol):
    from mgldvsr_tpu.ops.pallas.conv3x3 import conv3x3_pallas

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 144, 128, 128), dtype)
    k = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, 128, 128)) * 0.05
         ).astype(dtype)
    b = jax.random.normal(jax.random.PRNGKey(2), (128,)) * 0.1
    y = conv3x3_pallas(x, k, b, True)
    ref = _ref_conv(x.astype(jnp.float32), k.astype(jnp.float32), b)
    assert y.dtype == dtype
    assert float(jnp.abs(y.astype(jnp.float32) - ref).max()) < tol


def test_conv3x3_pallas_vjp_parity():
    from mgldvsr_tpu.ops.pallas.conv3x3 import conv3x3_pallas

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 160, 128, 128))
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 128, 128)) * 0.05
    b = jax.random.normal(jax.random.PRNGKey(2), (128,)) * 0.1
    g = jax.grad(lambda *a: (conv3x3_pallas(*a, True) ** 2).mean(),
                 argnums=(0, 1, 2))(x, k, b)
    gr = jax.grad(lambda *a: (_ref_conv(*a) ** 2).mean(),
                  argnums=(0, 1, 2))(x, k, b)
    for got, want in zip(g, gr):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)


def test_conv3x3_pallas_vjp_mixed_dtypes():
    """bf16 x/kernel with an fp32 bias (the layers.Conv reality: kernel is
    astype(self.dtype)'d, bias stays a fp32 param) — cotangents must match
    the PRIMAL dtypes or JAX rejects the custom VJP."""
    from mgldvsr_tpu.ops.pallas.conv3x3 import conv3x3_pallas

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 160, 128, 128),
                          jnp.bfloat16)
    k = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, 128, 128)) * 0.05
         ).astype(jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(2), (128,))  # fp32
    dx, dk, db = jax.grad(
        lambda *a: (conv3x3_pallas(*a, True).astype(jnp.float32) ** 2).mean(),
        argnums=(0, 1, 2))(x, k, b)
    assert dx.dtype == jnp.bfloat16
    assert dk.dtype == jnp.bfloat16
    assert db.dtype == jnp.float32
    gr = jax.grad(
        lambda *a: (_ref_conv(*a).astype(jnp.float32) ** 2).mean(),
        argnums=(0, 1, 2))(x.astype(jnp.float32), k.astype(jnp.float32), b)
    np.testing.assert_allclose(np.asarray(db), np.asarray(gr[2]), atol=0.02,
                               rtol=0.05)


def test_conv3x3_impl_fp32_no_tile_falls_back():
    """ADVICE r3: a shape whose fp32 scratch exceeds VMEM must not crash
    with ZeroDivisionError — the impl falls back to lax.conv."""
    from mgldvsr_tpu.ops.pallas.conv3x3 import (_pick_th, conv3x3_applicable,
                                                conv3x3_pallas)

    h, w, c = 160, 1024, 512
    if _pick_th(h, w, c, c, 4) >= 1:  # scratch math changed; keep test honest
        pytest.skip("fp32 tile now fits VMEM at this shape")
    assert not conv3x3_applicable((1, h, w, c), c, c, itemsize=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, h, w, c)) * 0.1
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, c, c)) * 0.01
    b = jnp.zeros((c,))
    y = conv3x3_pallas(x, k, b, True)  # must not raise
    assert y.shape == (1, h, w, c)


def test_conv3x3_applicable_gate():
    from mgldvsr_tpu.ops.pallas.conv3x3 import conv3x3_applicable

    assert conv3x3_applicable((5, 512, 512, 128), 128, 128)
    assert conv3x3_applicable((5, 128, 128, 512), 512, 512, (1, 1))
    assert not conv3x3_applicable((5, 64, 64, 512), 512, 512)    # small
    assert not conv3x3_applicable((5, 512, 512, 96), 96, 128)    # lanes
    assert not conv3x3_applicable((5, 512, 512, 128), 128, 64)   # lanes out
    assert not conv3x3_applicable((5, 512, 512, 128), 128, 128, 2)  # stride


def test_layers_conv_dispatch_parity(monkeypatch):
    """layers.Conv with the flag on == nn.Conv numerics, identical params."""
    import flax.linen as nn

    from mgldvsr_tpu.models import layers

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 144, 128, 128))
    mod = layers.conv3x3(128, jnp.float32, name=None)
    monkeypatch.setenv("MGLD_PALLAS_CONV", "0")
    params = mod.init(jax.random.PRNGKey(1), x)
    y_off = mod.apply(params, x)
    monkeypatch.setenv("MGLD_PALLAS_CONV", "1")
    params_on = mod.init(jax.random.PRNGKey(1), x)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params_on)
    y_on = mod.apply(params, x)
    assert float(jnp.abs(y_on - y_off).max()) < 2e-5
    # below the size gate the flag must fall back to nn.Conv
    xs = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 128))
    ys_on = mod.apply(params, xs)
    monkeypatch.setenv("MGLD_PALLAS_CONV", "0")
    ys_off = mod.apply(params, xs)
    np.testing.assert_allclose(np.asarray(ys_on), np.asarray(ys_off))
