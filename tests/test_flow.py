"""Flow network tests: correlation volume + lookup vs torch oracle,
convex upsampling vs torch oracle, RAFT/SpyNet shape+finiteness, and the
clip-flow protocol."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from mgldvsr_tpu.flow.raft import (
    RAFT,
    RAFTConfig,
    build_corr_pyramid,
    convex_upsample_flow,
    lookup_corr,
)
from mgldvsr_tpu.flow.spynet import SpyNet
from mgldvsr_tpu.flow.compute import (
    compute_clip_flows,
    compute_occlusion_masks,
    flows_to_latent_res,
)


def _rand(*shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def _torch_corr_lookup(f1, f2, coords, num_levels=4, radius=4):
    """Independent oracle for all-pairs correlation pyramid + window lookup.

    f1/f2: [B,C,H,W] torch; coords: [B,H,W,2] (x,y) level-0 units."""
    b, c, h, w = f1.shape
    corr = torch.matmul(
        f1.reshape(b, c, h * w).transpose(1, 2), f2.reshape(b, c, h * w)
    ) / (c**0.5)
    corr = corr.reshape(b * h * w, 1, h, w)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        corr = F.avg_pool2d(corr, 2, stride=2)
        pyramid.append(corr)

    r = radius
    out = []
    for lvl, cp in enumerate(pyramid):
        hl, wl = cp.shape[-2:]
        dx = torch.linspace(-r, r, 2 * r + 1)
        dy = torch.linspace(-r, r, 2 * r + 1)
        delta = torch.stack(torch.meshgrid(dy, dx, indexing="ij"), dim=-1)
        ctr = coords.reshape(b * h * w, 1, 1, 2) / 2**lvl
        # NO component flip: the reference adds (dy, dx)-ordered deltas to
        # (x, y)-ordered coords (raft_arch.py:62-66), which transposes the
        # flattened window order. Verified against the real module in
        # test_ref_oracle.py::test_raft_sr_oracle.
        pts = ctr + delta.reshape(1, 2 * r + 1, 2 * r + 1, 2)
        gx = 2 * pts[..., 0] / max(wl - 1, 1) - 1
        gy = 2 * pts[..., 1] / max(hl - 1, 1) - 1
        sampled = F.grid_sample(
            cp, torch.stack([gx, gy], dim=-1), align_corners=True
        )
        out.append(sampled.reshape(b, h, w, -1))
    return torch.cat(out, dim=-1)


def test_corr_pyramid_and_lookup_match_torch():
    b, h, w, c = 1, 8, 8, 16
    f1 = _rand(b, h, w, c, seed=0)
    f2 = _rand(b, h, w, c, seed=1)
    coords = _rand(b, h, w, 2, seed=2) * 2 + 4  # wander around center

    pyr = build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), 3)
    ours = np.asarray(lookup_corr(pyr, jnp.asarray(coords), radius=2))

    ref = _torch_corr_lookup(
        torch.from_numpy(f1).permute(0, 3, 1, 2),
        torch.from_numpy(f2).permute(0, 3, 1, 2),
        torch.from_numpy(coords),
        num_levels=3,
        radius=2,
    ).numpy()
    assert ours.shape == ref.shape
    assert np.allclose(ours, ref, atol=2e-4), np.abs(ours - ref).max()


def _torch_convex_upsample(flow_nchw, mask_nchw):
    n, _, h, w = flow_nchw.shape
    mask = mask_nchw.view(n, 1, 9, 8, 8, h, w)
    mask = torch.softmax(mask, dim=2)
    up = F.unfold(8 * flow_nchw, [3, 3], padding=1)
    up = up.view(n, 2, 9, 1, 1, h, w)
    up = torch.sum(mask * up, dim=2)
    up = up.permute(0, 1, 4, 2, 5, 3)
    return up.reshape(n, 2, 8 * h, 8 * w)


def test_convex_upsample_matches_torch():
    n, h, w = 1, 4, 5
    flow = _rand(n, h, w, 2, seed=3)
    mask = _rand(n, h, w, 9 * 64, seed=4)

    ours = np.asarray(convex_upsample_flow(jnp.asarray(flow), jnp.asarray(mask)))

    # torch channel layout for the mask is (9, 8, 8) flattened = ours
    mask_t = torch.from_numpy(mask).permute(0, 3, 1, 2)
    flow_t = torch.from_numpy(flow).permute(0, 3, 1, 2)
    ref = _torch_convex_upsample(flow_t, mask_t).permute(0, 2, 3, 1).numpy()
    assert np.allclose(ours, ref, atol=1e-5), np.abs(ours - ref).max()


@pytest.mark.slow
def test_raft_forward_shapes():
    cfg = RAFTConfig(iters=2)
    model = RAFT(cfg)
    ref = jnp.asarray(np.random.RandomState(0).rand(1, 36, 44, 3), jnp.float32)
    supp = jnp.asarray(np.random.RandomState(1).rand(1, 36, 44, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), ref, supp)
    flow = model.apply(params, ref, supp)
    assert flow.shape == (1, 36, 44, 2)
    assert np.isfinite(np.asarray(flow)).all()


def test_spynet_forward_shapes():
    model = SpyNet()
    ref = jnp.asarray(np.random.RandomState(0).rand(2, 40, 48, 3), jnp.float32)
    supp = jnp.asarray(np.random.RandomState(1).rand(2, 40, 48, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), ref, supp)
    flow = model.apply(params, ref, supp)
    assert flow.shape == (2, 40, 48, 2)
    assert np.isfinite(np.asarray(flow)).all()


def test_clip_flow_protocol():
    """With a deterministic fake flownet, check pair ordering and shapes."""

    def fake_flownet(ref, supp):
        # flow = mean brightness difference, broadcast; encodes pair identity
        d = jnp.mean(ref - supp, axis=(1, 2, 3), keepdims=True)
        return jnp.broadcast_to(d, ref.shape[:3] + (1,)).repeat(2, -1)

    b, t, h, w = 1, 4, 8, 8
    frames = jnp.arange(t, dtype=jnp.float32).reshape(1, t, 1, 1, 1)
    frames = jnp.broadcast_to(frames, (b, t, h, w, 3))
    ff, fb = compute_clip_flows(fake_flownet, frames)
    assert ff.shape == (b, t - 1, h, w, 2)
    # flows_forward[k] = flownet(frame_{k+1}, frame_k) -> mean diff = +1
    assert np.allclose(np.asarray(ff), 1.0)
    assert np.allclose(np.asarray(fb), -1.0)

    occ_f, occ_b = compute_occlusion_masks(ff, fb)
    assert occ_f.shape == (b, t - 1, h, w, 1)
    # consistent fwd/bwd (ff + fb = 0) -> interior unoccluded; the +1-px
    # displacement leaves only the zero-padded border inconsistent
    assert float(occ_f[:, :, : h - 1, : w - 1].sum()) == 0.0
    assert float(occ_f[:, :, -1, :].sum()) > 0.0

    lat = flows_to_latent_res(ff, 0.5)
    assert lat.shape == (b, t - 1, h // 2, w // 2, 2)
    # magnitudes rescaled by the ratio
    assert np.allclose(np.asarray(lat), 0.5)


# ---------------------------------------------------------------------------
# MaskFlownet_S
# ---------------------------------------------------------------------------


def test_local_correlation_matches_bruteforce():
    from mgldvsr_tpu.flow.maskflownet import local_correlation

    rs = np.random.RandomState(0)
    f1 = jnp.asarray(rs.rand(2, 6, 7, 3), jnp.float32)
    f2 = jnp.asarray(rs.rand(2, 6, 7, 3), jnp.float32)
    md = 2
    out = np.asarray(local_correlation(f1, f2, md))
    side = 2 * md + 1
    assert out.shape == (2, 6, 7, side * side)
    a1, a2 = np.asarray(f1), np.asarray(f2)
    for b in (0, 1):
        for y in (0, 3, 5):
            for x in (0, 4, 6):
                for dy in (-2, 0, 1):
                    for dx in (-1, 0, 2):
                        yy, xx = y + dy, x + dx
                        want = (
                            np.mean(a1[b, y, x] * a2[b, yy, xx])
                            if 0 <= yy < 6 and 0 <= xx < 7 else 0.0
                        )
                        k = (dy + md) * side + (dx + md)
                        np.testing.assert_allclose(
                            out[b, y, x, k], want, rtol=1e-5, atol=1e-6)


def test_triangle_resample_preserves_constants():
    from mgldvsr_tpu.flow.maskflownet import downsample2d, upsample2d

    x = jnp.full((1, 8, 8, 2), 3.25, jnp.float32)
    up = upsample2d(x, 2)
    assert up.shape == (1, 16, 16, 2)
    # interior of a constant image stays constant under triangle interpolation
    np.testing.assert_allclose(np.asarray(up)[0, 2:-2, 2:-2], 3.25, rtol=1e-5)
    down = downsample2d(jnp.full((1, 16, 16, 1), -1.5, jnp.float32), 2)
    assert down.shape == (1, 8, 8, 1)
    # normalized kernel => exactly constant everywhere (incl. borders)
    np.testing.assert_allclose(np.asarray(down), -1.5, rtol=1e-5)


def test_maskflownet_forward_shapes_and_scale_equivariance():
    from mgldvsr_tpu.flow.maskflownet import MaskFlownetS

    net = MaskFlownetS()
    rs = np.random.RandomState(1)
    ref = jnp.asarray(rs.rand(1, 96, 128, 3), jnp.float32)
    sup = jnp.asarray(rs.rand(1, 96, 128, 3), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), ref, sup)
    flow = net.apply(params, ref, sup)
    assert flow.shape == (1, 96, 128, 2)
    assert np.isfinite(np.asarray(flow)).all()
    # brightness-shift invariance from centralize(): adding a constant to
    # both frames must not change the flow
    flow2 = net.apply(params, ref + 0.3, sup + 0.3)
    np.testing.assert_allclose(np.asarray(flow), np.asarray(flow2),
                               rtol=1e-4, atol=1e-4)


def test_raft_pallas_lookup_matches_xla():
    """RAFT with the Pallas window-lookup kernel (interpret mode on CPU)
    must produce the same flow as the XLA block-gather implementation."""
    import dataclasses

    from mgldvsr_tpu.flow.raft import RAFT, RAFTConfig

    cfg = RAFTConfig(iters=2)
    rs = np.random.RandomState(3)
    ref = jnp.asarray(rs.rand(1, 48, 64, 3), jnp.float32)
    sup = jnp.asarray(rs.rand(1, 48, 64, 3), jnp.float32)
    net_x = RAFT(cfg)
    net_p = RAFT(dataclasses.replace(cfg, lookup_impl="pallas"))
    params = net_x.init(jax.random.PRNGKey(0), ref, sup)
    fx = net_x.apply(params, ref, sup)
    fp = net_p.apply(params, ref, sup)
    np.testing.assert_allclose(np.asarray(fx), np.asarray(fp),
                               rtol=1e-4, atol=1e-4)


def test_flow_chunked_pairs_equals_batched():
    """flow_chunk_pairs runs RAFT over lax.map groups — the enabler for
    full-res flows at large window batches (the 96-pair 512px batch
    compile-OOMs at 27.66G, r05). Pairs are independent through RAFT, so
    chunked output must equal the one-shot batch exactly."""
    import dataclasses

    import jax
    import numpy as np

    from tests.test_pipeline import tiny_config
    from mgldvsr_tpu.infer.pipeline import MGLDVSRPipeline

    cfg = tiny_config(num_frames=3)
    pipe = MGLDVSRPipeline(cfg)
    pipe_ck = MGLDVSRPipeline(
        dataclasses.replace(cfg, flow_chunk_pairs=3))
    params = pipe.init_params(jax.random.PRNGKey(0), 32, 32)
    frames = jax.random.uniform(jax.random.PRNGKey(1), (6, 32, 32, 3))
    (ff, fb), (of, ob) = pipe.compute_flows(params, frames)
    (cf, cb), (co, cb2) = pipe_ck.compute_flows(params, frames)
    np.testing.assert_allclose(np.asarray(cf), np.asarray(ff), atol=1e-6)
    np.testing.assert_allclose(np.asarray(cb), np.asarray(fb), atol=1e-6)
    np.testing.assert_allclose(np.asarray(co), np.asarray(of), atol=1e-6)
    np.testing.assert_allclose(np.asarray(cb2), np.asarray(ob), atol=1e-6)
