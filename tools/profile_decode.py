"""Profile the flagship-scale VAE decode (and optionally the denoise step)
on the real chip: e2e timing + a jax.profiler trace for tools/xplane_top.py.

The VAE decode is the pipeline's worst roofline stage (round-2 NOTES: 303 ms
measured vs a 95 ms bf16 floor, 31%% of SoL). This captures where the time
actually goes.

Usage:
  python tools/profile_decode.py [--stage decode|denoise|encode] \
      [--logdir /tmp/mgld_prof] [--iters 5]
  python tools/xplane_top.py /tmp/mgld_prof -k 30
"""
from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/mgld_tpu_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="decode",
                    choices=["decode", "denoise", "encode"])
    ap.add_argument("--logdir", default="/tmp/mgld_prof")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--consume", action="store_true",
                    help="encode only: reduce outputs in-program so XLA "
                         "chooses layouts freely (see comment)")
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mgldvsr_tpu.flow.raft import RAFTConfig
    from mgldvsr_tpu.infer.pipeline import MGLDVSRPipeline, PipelineConfig
    from mgldvsr_tpu.models.cliptext import CLIPTextConfig
    from mgldvsr_tpu.models.unet import StructCondConfig, UNetConfig
    from mgldvsr_tpu.models.vae import VAEConfig

    t, size = args.frames, args.size
    cfg = PipelineConfig(
        num_frames=t,
        unet=UNetConfig(num_frames=t, dtype=jnp.bfloat16),
        structcond=StructCondConfig(num_frames=t, dtype=jnp.bfloat16),
        vae=VAEConfig(num_frames=t, enable_fusion=True, dtype=jnp.bfloat16),
        clip=CLIPTextConfig(dtype=jnp.bfloat16),
        raft=RAFTConfig(iters=10),
    )
    pipe = MGLDVSRPipeline(cfg)
    params = pipe.init_params(jax.random.PRNGKey(0), size, size)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)

    hl = size // 8
    lat = jax.random.normal(jax.random.PRNGKey(1), (t, hl, hl, 4))
    frames_pm1 = jax.random.uniform(jax.random.PRNGKey(2),
                                    (t, size, size, 3)) * 2 - 1

    if args.stage == "encode":
        if args.consume:
            # Consume the outputs inside the program: returning the raw
            # (z, enc_fea) tuple pins default row-major layouts on the
            # outputs, which XLA back-propagates into every conv (r03: the
            # standalone encode ran 1.7 s vs ~0.1 s worth of in-pipeline
            # ops). Summing frees the layout choice, measuring the cost the
            # pipeline actually pays.
            def enc_sum(p, f):
                z, fea = pipe.encode(p, f, jax.random.PRNGKey(3))
                return z.sum(), [x.sum() for x in fea]
            fn = jax.jit(enc_sum)
        else:
            fn = jax.jit(
                lambda p, f: pipe.encode(p, f, jax.random.PRNGKey(3)))
        call = lambda: fn(params, frames_pm1)
    elif args.stage == "decode":
        _, enc_fea = jax.jit(
            lambda p, f: pipe.encode(p, f, jax.random.PRNGKey(3)))(
                params, frames_pm1)
        enc_fea = jax.block_until_ready(enc_fea)
        fn = jax.jit(lambda p, l, e: pipe.decode(p, l, e))
        call = lambda: fn(params, lat, enc_fea)
    else:  # denoise: structcond + UNet + posterior + guidance grad, 1 step
        from mgldvsr_tpu.core.diffusion import SamplerConfig, p_sample

        ctx = pipe.embed_empty_prompt(params, t)
        scfg = SamplerConfig(num_frames=t, temperature=0.0)
        ff = 0.3 * jax.random.normal(jax.random.PRNGKey(4),
                                     (1, t - 1, hl, hl, 2))
        occ = jnp.zeros((1, t - 1, hl, hl, 1))

        def step(p, x):
            dn = pipe.denoise_fn(p, lat, ctx)
            return p_sample(pipe.sched, dn, x, jnp.int32(25),
                            jax.random.PRNGKey(5), scfg,
                            flows=(ff, ff), masks=(occ, occ))

        fn = jax.jit(step)
        call = lambda: fn(params, lat)

    print(f"compiling {args.stage} ...", flush=True)
    t0 = time.perf_counter()
    jax.block_until_ready(call())
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)

    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        jax.block_until_ready(call())
        times.append(time.perf_counter() - t0)
    print(f"{args.stage}: best {min(times) * 1e3:.1f} ms  "
          f"median {sorted(times)[len(times) // 2] * 1e3:.1f} ms  {times}")

    os.makedirs(args.logdir, exist_ok=True)
    jax.profiler.start_trace(args.logdir)
    for _ in range(3):
        jax.block_until_ready(call())
    jax.profiler.stop_trace()
    print(f"trace written to {args.logdir}; "
          f"analyze: python tools/xplane_top.py {args.logdir}")


if __name__ == "__main__":
    main()
