"""Pallas flow-warp kernel vs the XLA reference implementation
(interpret mode on CPU; compiled path exercised on TPU separately)."""
import numpy as np
import jax
import jax.numpy as jnp

from mgldvsr_tpu.ops.pallas.flow_warp import pallas_flow_warp
from mgldvsr_tpu.ops.warp import flow_warp


def test_pallas_warp_matches_xla_reference():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 8, 16, 4).astype(np.float32))
    flow = jnp.asarray((rs.randn(2, 8, 16, 2) * 3).astype(np.float32))
    ref = flow_warp(x, flow)
    out = pallas_flow_warp(x, flow, True)  # interpret mode
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-5), (
        np.abs(np.asarray(out) - np.asarray(ref)).max()
    )


def test_pallas_warp_gradient_matches():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(1, 8, 8, 2).astype(np.float32))
    flow = jnp.asarray((rs.randn(1, 8, 8, 2)).astype(np.float32))

    g_ref = jax.grad(lambda a: jnp.abs(flow_warp(a, flow)).sum())(x)
    g_pal = jax.grad(
        lambda a: jnp.abs(pallas_flow_warp(a, flow, True)).sum()
    )(x)
    assert np.allclose(np.asarray(g_pal), np.asarray(g_ref), atol=1e-5)

    gf_ref = jax.grad(lambda f: (flow_warp(x, f) ** 2).sum())(flow)
    gf_pal = jax.grad(
        lambda f: (pallas_flow_warp(x, f, True) ** 2).sum()
    )(flow)
    assert np.allclose(np.asarray(gf_pal), np.asarray(gf_ref), atol=1e-4)


def test_flow_warp_guided_dx_matmul_matches():
    from mgldvsr_tpu.ops.pallas.flow_warp import flow_warp_guided

    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(2, 8, 8, 4).astype(np.float32))
    flow = jnp.asarray((rs.randn(2, 8, 8, 2) * 2).astype(np.float32))

    out = flow_warp_guided(x, flow, True)
    assert np.allclose(np.asarray(out), np.asarray(flow_warp(x, flow)),
                       atol=1e-5)

    g_ref = jax.grad(lambda a: jnp.abs(flow_warp(a, flow)).sum())(x)
    g_pal = jax.grad(
        lambda a: jnp.abs(flow_warp_guided(a, flow, True)).sum()
    )(x)
    assert np.allclose(np.asarray(g_pal), np.asarray(g_ref), atol=1e-5), (
        np.abs(np.asarray(g_pal) - np.asarray(g_ref)).max()
    )

    # flow cotangent is zero by contract
    gf = jax.grad(
        lambda f: (flow_warp_guided(x, f, True) ** 2).sum()
    )(flow)
    assert float(jnp.abs(gf).max()) == 0.0


def test_pallas_warp_vmem_gate():
    """Row-block picker shrinks rb (and refuses the kernel) before the
    kernel's working set — one-hot weight matrix [rb*W, H*W] fp32 PLUS the
    same-sized p_iota int32 matrix — blows the 16 MB scoped-VMEM stack.
    Regression for two measured compile OOMs on v5e: the 960px-tile latent
    (92x120, 16.8 MB at rb=4) and the whole-frame 1280px latent (92x160,
    16.18 MB even at rb=1 — the old weights-only accounting said 9.4 MB
    and let it through)."""
    from mgldvsr_tpu.ops.pallas.flow_warp import _pick_rb, pallas_warp_fits

    assert _pick_rb(64, 64, 4) == 4          # segment latents: full block
    assert _pick_rb(92, 120, 4) == 1         # the 960-tile shape shrinks
    assert _pick_rb(92, 160, 4) == 0         # whole-1280px-frame: refuse
    assert _pick_rb(480, 270, 4) == 0        # 4K-frame latents: refuse
    assert pallas_warp_fits(64, 64, 4)
    assert not pallas_warp_fits(92, 160, 4)
    assert not pallas_warp_fits(480, 270, 4)

    # the fit==0 refusal is an explicit error, not a Mosaic OOM
    import pytest

    x = jnp.zeros((1, 256, 512, 16), jnp.float32)
    fl = jnp.zeros((1, 256, 512, 2), jnp.float32)
    if not pallas_warp_fits(256, 512, 16):
        with pytest.raises(ValueError, match="scoped-VMEM"):
            pallas_flow_warp(x, fl, False)


def test_pallas_corr_lookup_matches_xla_reference():
    """Interpret-mode Pallas window lookup == the XLA block-gather lookup,
    including bilinear blending, level scaling, and far-out-of-range zeros."""
    from mgldvsr_tpu.flow.raft import build_corr_pyramid, lookup_corr
    from mgldvsr_tpu.ops.pallas.corr_lookup import (
        lookup_corr_pallas,
        pad_pyramid,
    )

    rs = np.random.RandomState(0)
    b, h, w, c = 2, 8, 8, 16
    f1 = jnp.asarray(rs.randn(b, h, w, c), jnp.float32)
    f2 = jnp.asarray(rs.randn(b, h, w, c), jnp.float32)
    pyr = build_corr_pyramid(f1, f2, num_levels=3)

    coords = jnp.asarray(
        rs.rand(b, h, w, 2) * 14 - 3, jnp.float32)  # includes out-of-range
    want = lookup_corr(pyr, coords, radius=2)
    got = lookup_corr_pallas(pad_pyramid(pyr, radius=2), coords, radius=2,
                             q_block=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_resident_attention_matches_reference():
    """Single-pass fused attention kernel (interpret mode) == fp32-softmax
    reference, forward and gradients."""
    from mgldvsr_tpu.ops.pallas.attention import (
        _reference,
        resident_attention,
    )

    rs = np.random.RandomState(0)
    bh, n, d = 3, 512, 64
    q = jnp.asarray(rs.randn(bh, n, d), jnp.float32)
    k = jnp.asarray(rs.randn(bh, n, d), jnp.float32)
    v = jnp.asarray(rs.randn(bh, n, d), jnp.float32)
    out = resident_attention(q, k, v, 256, True)
    want = _reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    # grads flow through the XLA reference VJP
    g1 = jax.grad(lambda q: resident_attention(q, k, v, 256, True).sum())(q)
    g2 = jax.grad(lambda q: _reference(q, k, v).sum())(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=2e-5, atol=2e-5)


def test_gn_channel_sums_matches_jnp():
    from mgldvsr_tpu.ops.pallas.groupnorm import channel_sums

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(3, 12, 8, 16) * 7 + 2, jnp.float32)
    s1, s2 = channel_sums(x, interpret=True)
    np.testing.assert_allclose(np.asarray(s1),
                               np.asarray(x.sum(axis=(1, 2))), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s2),
                               np.asarray((x * x).sum(axis=(1, 2))),
                               rtol=1e-5)
    # odd H exercises the row-block divisor search
    x2 = jnp.asarray(rs.randn(2, 7, 8, 32), jnp.bfloat16)
    s1, s2 = channel_sums(x2, interpret=True)
    ref = np.asarray(x2, np.float32)
    np.testing.assert_allclose(np.asarray(s1), ref.sum(axis=(1, 2)),
                               rtol=1e-2, atol=1e-2)


def test_fused_group_norm_matches_flax():
    import flax.linen as nn

    from mgldvsr_tpu.ops.pallas.groupnorm import fused_group_norm

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(3, 8, 8, 64) * 5 + 3, jnp.float32)
    gn = nn.GroupNorm(num_groups=32, epsilon=1e-5)
    p = gn.init(jax.random.PRNGKey(0), x)
    scale = jnp.asarray(rs.randn(64), jnp.float32)
    bias = jnp.asarray(rs.randn(64), jnp.float32)
    p = {"params": {"scale": scale, "bias": bias}}
    want = gn.apply(p, x)
    got = fused_group_norm(x, scale, bias, 32, 1e-5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_gn_channel_sums_grad():
    """channel_sums must be differentiable (stage-2 backprops through the
    video decoder's Pallas GN stats): d(sum)/dx = 1, d(sumsq)/dx = 2x.
    Regression for the bare pallas_call AssertionError under jax.grad that
    killed the 512px stage-2 train bench (round 3)."""
    from mgldvsr_tpu.ops.pallas.groupnorm import channel_sums

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 32))

    def f(z):
        s1, s2 = channel_sums(z, interpret=True)
        return jnp.sum(s1 * 0.3) + jnp.sum(s2 * 0.7)

    g = jax.grad(f)(x)
    np.testing.assert_allclose(
        np.asarray(g), 0.3 + 1.4 * np.asarray(x), atol=1e-5)
