"""Patch-parallel tiled restore: shard_map over a ('patch',) device mesh
must produce exactly the sequential path's output (same per-patch keys)."""
import numpy as np
import jax

from tests.test_pipeline import tiny_config

from mgldvsr_tpu.infer.pipeline import MGLDVSRPipeline


def test_patch_parallel_equivalence():
    pipe = MGLDVSRPipeline(tiny_config(num_frames=2, ddpm_steps=2))
    params = pipe.init_params(jax.random.PRNGKey(0), 64, 64)
    lq = jax.random.uniform(jax.random.PRNGKey(1), (2, 24, 40, 3))
    rng = jax.random.PRNGKey(2)
    common = dict(pch_size=64, pch_stride=48, min_side=64,
                  use_guidance=False)
    seq = pipe.restore_video(params, lq, rng, **common)
    par = pipe.restore_video(params, lq, rng, **common,
                             patch_devices=jax.devices()[:4])
    assert par.shape == seq.shape
    np.testing.assert_allclose(par, seq, atol=2e-5)


def test_patch_parallel_equivalence_guided():
    """Same equivalence with guidance ON: the full-frame flows are split
    into per-patch trees and must route identically through the shard_map
    stack (lax.map pytree leaves) and the sequential jitted path."""
    pipe = MGLDVSRPipeline(tiny_config(num_frames=2, ddpm_steps=2))
    params = pipe.init_params(jax.random.PRNGKey(0), 64, 64)
    lq = jax.random.uniform(jax.random.PRNGKey(1), (2, 24, 40, 3))
    rng = jax.random.PRNGKey(2)
    common = dict(pch_size=64, pch_stride=48, min_side=64,
                  use_guidance=True)
    seq = pipe.restore_video(params, lq, rng, **common)
    par = pipe.restore_video(params, lq, rng, **common,
                             patch_devices=jax.devices()[:4])
    assert par.shape == seq.shape
    np.testing.assert_allclose(par, seq, atol=2e-5)


def test_patch_batch_equivalence():
    """Single-device patch batching (K patches stacked along the window
    axis of ONE compiled program) must reproduce the sequential per-patch
    path bit-for-bit in protocol terms: with ``window_noise`` every draw
    (posterior, x_T, per-step sampler noise) is made for one window and
    tiled, so each batched window sees exactly the draws a solo same-rng
    call makes (the reference re-seeds identically per patch,
    oldcanvas_tile.py:428). Non-deterministic on purpose — this is the
    test that the noise plumbing, not just the math, matches."""
    pipe = MGLDVSRPipeline(tiny_config(num_frames=2, ddpm_steps=2))
    params = pipe.init_params(jax.random.PRNGKey(0), 64, 64)
    lq = jax.random.uniform(jax.random.PRNGKey(1), (2, 24, 40, 3))
    rng = jax.random.PRNGKey(2)
    for guided in (False, True):
        common = dict(pch_size=64, pch_stride=48, min_side=64,
                      use_guidance=guided)
        seq = pipe.restore_video(params, lq, rng, **common, patch_batch=1)
        # 6 patches, batch of 4 -> one full group + one padded group
        bat = pipe.restore_video(params, lq, rng, **common, patch_batch=4)
        assert bat.shape == seq.shape
        np.testing.assert_allclose(bat, seq, atol=3e-5,
                                   err_msg=f"guided={guided}")


def test_restore_video_patch_work_is_jitted(monkeypatch):
    """Dispatch-count guard (round-3 regression: the single-device tile
    loop called restore_segment_canvas UNJITTED — eager per-op dispatch
    made the tiled path ~40x slower than the identical shape through the
    fixed path). Under jit, the traced body runs once per compile; if the
    loop is ever un-jitted again, the body runs once per patch and this
    fails."""
    pipe = MGLDVSRPipeline(tiny_config(num_frames=2, ddpm_steps=2))
    params = pipe.init_params(jax.random.PRNGKey(0), 64, 64)
    lq = jax.random.uniform(jax.random.PRNGKey(1), (2, 24, 40, 3))

    calls = []
    orig = pipe.restore_segment_canvas

    def counting(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    fcalls = []
    forig = pipe.compute_flows

    def fcounting(*a, **k):
        fcalls.append(1)
        return forig(*a, **k)

    monkeypatch.setattr(pipe, "restore_segment_canvas", counting)
    monkeypatch.setattr(pipe, "compute_flows", fcounting)
    out = pipe.restore_video(params, lq, jax.random.PRNGKey(2),
                             pch_size=64, pch_stride=48, min_side=64,
                             use_guidance=True)
    # 6 same-shape patches -> ONE trace of the per-patch program
    assert len(calls) == 1, f"per-patch program traced {len(calls)} times"
    assert len(fcalls) == 1, f"flows traced {len(fcalls)} times"
    # and a second restore_video on the same shapes must reuse the cached
    # compiled programs (no retrace — a fresh jax.jit(lambda) per call
    # retraces RAFT every call; that bug cost ~20s/clip on hardware)
    pipe.restore_video(params, lq, jax.random.PRNGKey(3),
                       pch_size=64, pch_stride=48, min_side=64,
                       use_guidance=True)
    assert len(calls) == 1, "per-patch program retraced on the second call"
    assert len(fcalls) == 1, "flows retraced on the second call"
    assert np.isfinite(out).all()


def test_patch_batch_envelope_scales_with_hbm():
    """The auto patch-batch envelope derives from the device's reported
    HBM limit (VERDICT r4 #7): v5e-band chips use the measured 6x512px
    constant verbatim; a hypothetical 32 GB chip doubles it; an 8 GB chip
    halves it; absent stats (the axon tunnel reports {}) behave as v5e."""
    pipe = MGLDVSRPipeline(tiny_config(num_frames=2, ddpm_steps=2))

    class FakeDev:
        def __init__(self, limit):
            self._limit = limit

        def memory_stats(self):
            if self._limit is None:
                return {}
            return {"bytes_limit": self._limit}

    base = pipe._patch_batch_envelope(512, 512, device=FakeDev(None))
    assert base == 6
    # within the v5e band (+-25% of 16e9): measured constant, no scaling
    assert pipe._patch_batch_envelope(512, 512,
                                      device=FakeDev(15.5e9)) == 6
    big = pipe._patch_batch_envelope(512, 512, device=FakeDev(32e9))
    assert big == 12, big
    small = pipe._patch_batch_envelope(512, 512, device=FakeDev(8e9))
    assert small == 3, small
    # smaller patches pack quadratically more windows
    assert pipe._patch_batch_envelope(256, 256, device=FakeDev(None)) == 24
