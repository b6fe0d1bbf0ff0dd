"""2-minute Mosaic compile probe for ops/pallas/conv3x3.py on real TPU.

The full microbench burns ~20 min of chip queue time; this compiles and
parity-checks ONE small-but-applicable shape first so a Mosaic rejection
costs minutes, not a queue slot. Prints PROBE_OK or the exception.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mgldvsr_tpu.ops.pallas.conv3x3 import conv3x3_applicable, conv3x3_pallas


def main():
    shape = (1, 128, 128, 128)
    assert conv3x3_applicable(shape, 128, 128)
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
    k = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, 128, 128))
         * 0.05).astype(jnp.bfloat16)
    b = jnp.zeros((128,), jnp.float32)
    y = jax.block_until_ready(conv3x3_pallas(x, k, b))
    ref = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), k.astype(jnp.float32), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    err = float(jnp.abs(y.astype(jnp.float32) - ref).max())
    assert err < 0.05, err
    print(f"PROBE_OK maxerr={err:.4f} backend={jax.default_backend()}",
          flush=True)


if __name__ == "__main__":
    main()
