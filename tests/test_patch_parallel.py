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
