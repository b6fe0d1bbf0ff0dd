"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; the JAX idiom for testing
sharding/collectives without a pod is to force the host platform and split it
into virtual devices. This must happen before jax is imported anywhere.
"""
import os
import sys

# Force-override: the environment may pin JAX_PLATFORMS to a TPU plugin via
# sitecustomize; tests must run on the virtual CPU mesh. Set MGLD_TEST_TPU=1
# to run the suite against real hardware instead.
if not os.environ.get("MGLD_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: repeated suite runs skip recompiles.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mgld_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# sitecustomize may have imported jax (axon TPU tunnel) before this conftest
# ran, in which case the env var above was captured too late — update the
# live config as well (backends are initialised lazily, so this still wins).
if not os.environ.get("MGLD_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _deterministic_rngs(request):
    """Order-robust global RNG: seed torch/numpy/random per-test from the
    test's node id.

    Without this, any test drawing from the torch global generator sees a
    position that depends on how much RNG every *earlier* test consumed —
    the round-4 full-suite-only failure of
    ``test_hifacegan_generator_oracle`` (passes in isolation, fails after
    3000s of preceding tests) was exactly this: an earlier test's
    ``seed_everything`` pinned the stream so the full ordering
    deterministically landed on an ill-conditioned draw. Node-id-derived
    seeds make every test's draws a pure function of its own name.
    """
    import random as _random
    import zlib

    seed = zlib.crc32(request.node.nodeid.encode())
    _random.seed(seed)
    import numpy as _np

    _np.random.seed(seed & 0x7FFFFFFF)
    _torch = sys.modules.get("torch")
    if _torch is not None:
        _torch.manual_seed(seed)
    yield


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)


import jax.numpy as _jnp  # noqa: E402


@pytest.fixture(scope="session")
def tiny_pipe():
    """Shared tiny pipeline + params (init is the slowest test fixture)."""
    from tests.test_pipeline import tiny_config
    from mgldvsr_tpu.infer.pipeline import MGLDVSRPipeline

    pipe = MGLDVSRPipeline(tiny_config())
    params = pipe.init_params(jax.random.PRNGKey(0), 32, 32)
    return pipe, params
