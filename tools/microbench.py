"""Decompose the per-step cost of the flagship restore path on real hardware.

Times each sub-program of the 50x denoise loop independently:
  structcond fwd | unet fwd | denoise (both) | guidance grad | full p_sample
plus the prep stages (VAE encode, RAFT flows, VAE decode).

Usage:
  python tools/microbench.py [--size 512] [--stage all|denoise|prep]
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


def timeit(fn, *args, iters=10, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def timeit_amortized(op, x0, n=32, iters=5, warmup=1):
    """Per-application time of ``op`` with the dispatch cost amortized:
    chains n applications inside ONE jitted fori_loop (output feeds the
    next input), so the axon-tunnel round trip (~27 ms, which drowns
    single-op timings) is paid once per n ops."""
    import jax

    @jax.jit
    def loop(x):
        return jax.lax.fori_loop(0, n, lambda i, x: op(x), x)

    return timeit(loop, x0, iters=iters, warmup=warmup) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--stage", default="all",
                    choices=["all", "denoise", "prep", "guidance", "canvas",
                             "raft", "vae", "int8", "pconv"])
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mgldvsr_tpu.core.diffusion import SamplerConfig, p_sample, temporal_warp_loss
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
    tsteps = jnp.full((t,), 500, jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (t, 77, cfg.clip.width))
    frames = jax.random.uniform(jax.random.PRNGKey(3), (t, size, size, 3))

    res = {}

    if args.stage in ("all", "denoise"):
        sc_fwd = jax.jit(lambda p, z, ts: pipe.structcond.apply(p, z, ts))
        res["structcond_fwd"] = timeit(sc_fwd, params["structcond"], lat,
                                       tsteps, iters=args.iters)
        s_cond = sc_fwd(params["structcond"], lat, tsteps)
        unet_fwd = jax.jit(
            lambda p, x, ts, c, sc: pipe.unet.apply(p, x, ts, c, sc))
        res["unet_fwd"] = timeit(unet_fwd, params["unet"], lat, tsteps, ctx,
                                 s_cond, iters=args.iters)
        den = jax.jit(lambda p, x, ts: pipe.denoise_fn(p, lat, ctx)(x, ts))
        res["denoise_both"] = timeit(den, params, lat, tsteps, iters=args.iters)

    if args.stage in ("all", "guidance", "denoise"):
        flows, masks = jax.jit(pipe.compute_flows)(params, frames)
        gfn = jax.jit(jax.grad(lambda l: temporal_warp_loss(
            l, flows, masks, t, "reference")))
        res["guidance_grad"] = timeit(gfn, lat, iters=args.iters)

        scfg = SamplerConfig(num_frames=t)
        full = jax.jit(lambda p, x, k: p_sample(
            pipe.sched, pipe.denoise_fn(p, lat, ctx), x,
            jnp.asarray(25, jnp.int32), k, scfg, flows, masks))
        res["p_sample_full"] = timeit(full, params, lat,
                                      jax.random.PRNGKey(5), iters=args.iters)

    if args.stage in ("all", "prep"):
        enc = jax.jit(lambda p, f, k: pipe.encode(p, f, k))
        res["vae_encode"] = timeit(enc, params, frames * 2 - 1,
                                   jax.random.PRNGKey(4), iters=args.iters)
        z, fea = enc(params, frames * 2 - 1, jax.random.PRNGKey(4))
        res["raft_flows"] = timeit(jax.jit(pipe.compute_flows), params,
                                   frames, iters=args.iters)
        dec = jax.jit(lambda p, z, fea: pipe.decode(p, z, fea))
        res["vae_decode"] = timeit(dec, params, z, fea, iters=args.iters)
        res["clip_embed"] = timeit(
            jax.jit(lambda p: pipe.embed_empty_prompt(p, t)), params,
            iters=args.iters)

    if args.stage == "vae":
        # Isolate the temporal-conv cost: decode with num_frames=5 (temporal
        # convs active) vs num_frames=1 (pure SD decoder), same fusion.
        import dataclasses as dc

        from mgldvsr_tpu.models.vae import VideoAutoencoderKLResi

        z = jax.random.normal(jax.random.PRNGKey(9), (t, hl, hl, 4))
        enc = jax.jit(lambda p, f, k: pipe.encode(p, f, k))
        _, fea = enc(params, frames * 2 - 1, jax.random.PRNGKey(4))
        dec5 = jax.jit(lambda p, z, fea: pipe.decode(p, z, fea))
        res["decode_t5"] = timeit(dec5, params, z * 0.18215, fea,
                                  iters=args.iters)

        vae1 = VideoAutoencoderKLResi(dc.replace(cfg.vae, num_frames=1))
        p1 = jax.eval_shape(
            lambda: vae1.init(jax.random.PRNGKey(0), frames * 2 - 1, z))
        from mgldvsr_tpu.infer.pipeline import _synthesize_leaves

        p1 = _synthesize_leaves(p1, jax.random.PRNGKey(0))
        p1 = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, p1)
        dec1 = jax.jit(lambda p, z, fea: vae1.apply(
            p, z, fea, 1.0, method="decode"))
        res["decode_t1"] = timeit(dec1, p1, z, fea, iters=args.iters)

    if args.stage == "raft":
        # Isolate per-iteration cost: fixed = encoders + corr build +
        # convex upsample; slope = lookup + GRU update.
        import dataclasses as dc

        from mgldvsr_tpu.flow.raft import RAFT

        hs = int(size * cfg.flow_scale)
        pair = jax.random.uniform(jax.random.PRNGKey(8), (8, hs, hs, 3))
        for impl in ("xla", "pallas"):
            for it in (1, 10):
                net = RAFT(dc.replace(cfg.raft, iters=it, lookup_impl=impl))
                fn = jax.jit(lambda p, a, b, n=net: n.apply(p, a, b))
                res[f"raft_{impl}_{it}it_b8"] = timeit(
                    fn, params["raft"], pair, pair, iters=args.iters)
            per_it = (res[f"raft_{impl}_10it_b8"]
                      - res[f"raft_{impl}_1it_b8"]) / 9
            res[f"raft_{impl}_per_iter"] = per_it

    if args.stage == "canvas":
        # Tiled (canvas) restore protocol at a non-native size: 768px input
        # -> 96x96 latent, 64-tile/32-overlap grid (4 tiles, batched).
        size_c = 768
        frames_c = jax.random.uniform(jax.random.PRNGKey(6),
                                      (t, size_c, size_c, 3))
        fn = jax.jit(lambda p, f, k: pipe.restore_segment_canvas(p, f, k))
        res["canvas_restore"] = timeit(fn, params, frames_c,
                                       jax.random.PRNGKey(7), iters=3,
                                       warmup=1)
        print(f"canvas fps @768px: {t / res['canvas_restore']:.3f}")

    if args.stage == "int8":
        # int8 MXU experiment (round-2 lever): bf16 vs int8 3x3 convs at the
        # UNet's dominant shapes. v5e int8 peak is 2x bf16; if XLA lowers
        # int8 conv to the MXU, quantized UNet convs could cut the 12 ms
        # conv pool substantially (quality-gated until real weights exist).
        import functools

        shapes = [
            (t, 64, 64, 320, 320),
            (t, 32, 32, 640, 640),
            (t, 16, 16, 1280, 1280),
            (t, 8, 8, 1280, 1280),
        ]
        dn = ("NHWC", "HWIO", "NHWC")
        for (n, h, w, ci, co) in shapes:
            x = jax.random.normal(jax.random.PRNGKey(0), (n, h, w, ci),
                                  jnp.bfloat16)
            k_ = jax.random.normal(jax.random.PRNGKey(1), (3, 3, ci, co),
                                   jnp.bfloat16)
            xq = (x * 10).astype(jnp.int8)
            kq = (k_ * 10).astype(jnp.int8)

            conv = functools.partial(
                jax.lax.conv_general_dilated, window_strides=(1, 1),
                padding="SAME", dimension_numbers=dn)
            # chained-application timing: ci==co at all these shapes, so the
            # output feeds the next conv; int8 result (int32) recast to int8
            t_bf = timeit_amortized(lambda v: conv(v, k_), x,
                                    iters=args.iters)
            try:
                t_i8 = timeit_amortized(
                    lambda v: conv(v, kq,
                                   preferred_element_type=jnp.int32)
                    .astype(jnp.int8),
                    xq, iters=args.iters)
            except Exception as e:  # unsupported lowering
                t_i8 = float("nan")
                print(f"int8 conv failed at {ci}ch: {type(e).__name__} {e}")
            gflop = 2 * n * h * w * ci * co * 9 / 1e9
            print(f"conv3x3 {n}x{h}x{w}x{ci}->{co}: "
                  f"bf16 {t_bf * 1e3:7.3f} ms ({gflop / t_bf / 1e3:6.1f} TF/s)"
                  f"  int8 {t_i8 * 1e3:7.3f} ms "
                  f"({gflop / t_i8 / 1e3:6.1f} Top/s)  "
                  f"speedup {t_bf / t_i8:5.2f}x")

    if args.stage == "pconv":
        # RETIRED (r04): the Pallas shifted-matmul conv3x3 measured
        # 0.65-0.82x vs XLA on every decoder hot shape and OOMed at the
        # 4-window batch (/tmp/bench_r04/pconv_micro3.log); the kernel and
        # its MGLD_PALLAS_CONV dispatch were deleted. See NOTES.md
        # "Retired experiments".
        print("pconv stage retired: the Pallas conv3x3 lost to XLA on "
              "hardware (0.65-0.82x) and was deleted; see NOTES.md")
        return

    for k, v in res.items():
        print(f"{k:18s} {v * 1e3:9.2f} ms")
    if "denoise_both" in res and "p_sample_full" in res:
        print(f"{'50-step denoise est':18s} {res['p_sample_full'] * 50:9.2f} s"
              .replace("ms", "s"))


if __name__ == "__main__":
    main()
