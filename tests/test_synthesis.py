"""On-device synthesis degradation tests."""
import numpy as np
import jax
import jax.numpy as jnp

from mgldvsr_tpu.train.synthesis import (
    SynthesisConfig,
    sample_degradation_kernels,
    synthesize_lq,
)


def test_kernel_sampler_shapes_and_norm():
    rng = np.random.RandomState(0)
    for _ in range(5):
        k = sample_degradation_kernels(rng)
        for name in ("kernel1", "kernel2", "sinc_kernel"):
            assert k[name].shape == (21, 21)
            assert abs(k[name].sum() - 1.0) < 1e-4, name


def test_synthesize_lq_end_to_end_jitted():
    cfg = SynthesisConfig(sf=4, n_scale_buckets=5)
    rng = np.random.RandomState(1)
    kernels = {k: jnp.asarray(v) for k, v in
               sample_degradation_kernels(rng).items()}
    gt = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 64, 3))

    fn = jax.jit(lambda k, g: synthesize_lq(k, g, kernels, cfg))
    lq, gt_usm = fn(jax.random.PRNGKey(1), gt)
    assert lq.shape == (2, 16, 16, 3)
    assert gt_usm.shape == gt.shape
    l = np.asarray(lq)
    assert np.isfinite(l).all()
    assert l.min() >= 0 and l.max() <= 1
    # degraded: should differ substantially from a clean bicubic downscale
    from mgldvsr_tpu.ops.resize import resize2d

    clean = np.asarray(resize2d(gt, (16, 16), method="bicubic"))
    assert np.abs(l - clean).mean() > 0.005

    # one compiled program serves different keys (no shape recompiles):
    lq2, _ = fn(jax.random.PRNGKey(2), gt)
    assert not np.allclose(np.asarray(lq2), l)
