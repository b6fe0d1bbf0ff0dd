"""Benchmark: frames/sec/chip for the flagship restore path.

Measures the north-star workload (BASELINE.json): x4 VSR @512px, 50 DDPM
steps, 5-frame windows — the full motion-guided sampling loop (struct-cond
encoder + dual-cond UNet + guidance grad per step) plus VAE encode/decode
and RAFT flows, with random weights (identical FLOP/memory profile to
trained weights).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is measured fps divided by the reference A100 anchor
(an estimated 0.25 frames/sec for the same workload — MGLD-VSR runs ~20s
per 5-frame segment at 512px on A100-class GPUs; override with
--baseline-fps when a driver-measured number exists).

Usage: python bench.py [--tiny] [--steps N] [--size 512] [--baseline-fps X]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/mgld_tpu_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="tiny config smoke run (CPU ok)")
    ap.add_argument("--steps", type=int, default=None, help="DDPM steps")
    ap.add_argument("--size", type=int, default=None, help="input (=output) px size")
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--iters", type=int, default=3, help="timed repetitions")
    ap.add_argument("--windows", type=int, default=None,
                    help="segment mode: independent num_frames windows "
                         "batched per call (throughput lever; windows are "
                         "processed exactly as separate segments would be). "
                         "Default 4 at full scale (the measured-best batch "
                         "on v5e 16GB: 1.84 vs 1.63 fps solo; equivalence-"
                         "tested), 1 for --tiny.")
    ap.add_argument("--baseline-fps", type=float, default=0.25)
    ap.add_argument("--flow-scale", type=float, default=None,
                    help="segment mode: resolution RAFT runs at relative "
                         "to the working size (default: config 1.0, the "
                         "reference fixed-script protocol, old.py:344-348;"
                         " measured 1.7751 fps/chip at the 6-window "
                         "headline). 0.5 is the measured speed knob "
                         "(1.9174 fps — flows are only consumed at 1/8 "
                         "latent res).")
    ap.add_argument("--flow-chunk", type=int, default=None,
                    help="run RAFT over groups of this many frame pairs "
                         "under lax.map (default: config 8 — required "
                         "for flow_scale 1.0 at the 6-window batch, "
                         "whose one-shot full-res RAFT call compile-OOMs "
                         "at 27.66G; 0 = one batched call). Outputs "
                         "identical to the one-shot batch.")
    ap.add_argument("--no-guidance", action="store_true")
    ap.add_argument("--decode-chunk", type=int, default=None,
                    help="segment mode: VAE-decode this many windows per "
                         "lax.map step (bounds decoder activations; the "
                         "windows=8 batch OOMed r03 with full-batch decode)")
    ap.add_argument("--pch-size", type=int, default=0,
                    help="tile mode: pixel patch size (the reference's "
                         "vqgantile_size, default 960). 0 = auto: one "
                         "canvas tile per patch (512 at the default tile "
                         "size), stride 7/8 — measured 0.2935 fps at "
                         "1280x720 vs 0.125 for the reference-default "
                         "960/750 geometry (2x the UNet tile-evals) and "
                         "0.1111 for a whole-frame patch. Pass 960 "
                         "explicitly for the reference default.")
    ap.add_argument("--pch-stride", type=int, default=0,
                    help="tile mode: pixel patch stride (reference "
                         "default 750; 0 = auto, 7/8 of the patch size)")
    ap.add_argument("--tile-overlap", type=int, default=32,
                    help="tile mode: latent canvas tile overlap (reference "
                         "--tile_overlap default 32; 16 with a whole-frame "
                         "patch gives the minimum tile cover at 1280x736)")
    ap.add_argument("--split-step", action="store_true",
                    help="train2: jit flows/generator/discriminator as "
                         "three programs instead of one fused step "
                         "(identical math; the fused 512px compile "
                         "crashed the remote helper)")
    ap.add_argument("--remat-min-res", type=int, default=0,
                    help="train2 + --remat2: only VAE blocks at spatial "
                         "height >= this are rematerialized (0 = all, the "
                         "r4 behavior); low-res blocks are cheap to save "
                         "and expensive to recompute")
    ap.add_argument("--remat2", action="store_true",
                    help="train2: per-block activation remat in the VAE "
                         "(VAEConfig.use_checkpoint) — the generator step "
                         "runs fwd+bwd over pixel-space activations, the "
                         "same lever stage-1 needs at 512px")
    ap.add_argument("--patch-batch", type=int, default=None,
                    help="tile mode: canvas patches batched per compiled "
                         "call along the window axis (default: auto-fit "
                         "from the measured 6x512px envelope; 1 disables)")
    ap.add_argument("--variants", default=None,
                    help="train mode: comma-selected subset of "
                         "remat,remat_lean,noremat")
    ap.add_argument("--mode", choices=["segment", "tile", "train", "train2"],
                    default="segment",
                    help="segment: fixed 512px window (the headline metric);"
                         " tile: arbitrary-resolution canvas protocol"
                         " (320x180 -> 1280x720, the reference's VideoLQ"
                         " use case); train: stage-1 step throughput with"
                         " and without activation remat; train2: stage-2"
                         " video-VAE GAN step throughput")
    args = ap.parse_args()

    if args.tiny:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.tiny:
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    from mgldvsr_tpu.flow.raft import RAFTConfig
    from mgldvsr_tpu.infer.pipeline import MGLDVSRPipeline, PipelineConfig
    from mgldvsr_tpu.models.cliptext import CLIPTextConfig
    from mgldvsr_tpu.models.unet import StructCondConfig, UNetConfig
    from mgldvsr_tpu.models.vae import VAEConfig

    t = args.frames
    if args.tiny:
        size = args.size or 32
        steps = args.steps or 2
        cfg = PipelineConfig(
            num_frames=t,
            ddpm_steps=steps,
            unet=UNetConfig(
                model_channels=32, num_head_channels=16, context_dim=32,
                semb_channels=32, channel_mult=(1, 2),
                attention_resolutions=(1, 2), num_frames=t,
            ),
            structcond=StructCondConfig(
                model_channels=32, out_channels=32, channel_mult=(1, 1),
                attention_resolutions=(1, 2), num_frames=t,
            ),
            vae=VAEConfig(ch=32, ch_mult=(1, 1, 2, 2), num_res_blocks=1,
                          num_frames=t, enable_fusion=True, num_fuse_block=1),
            clip=CLIPTextConfig(width=32, heads=2, layers=2),
            raft=RAFTConfig(iters=2),
        )
    else:
        size = args.size or 512
        steps = args.steps or 50
        cfg = PipelineConfig(
            num_frames=t,
            ddpm_steps=steps,
            unet=UNetConfig(num_frames=t, dtype=jnp.bfloat16),
            structcond=StructCondConfig(num_frames=t, dtype=jnp.bfloat16),
            vae=VAEConfig(num_frames=t, enable_fusion=True, dtype=jnp.bfloat16),
            clip=CLIPTextConfig(dtype=jnp.bfloat16),
            raft=RAFTConfig(iters=10),
        )

    if args.mode == "train":
        import dataclasses as _dc

        from mgldvsr_tpu.train.trainer import Stage1Config, Stage1Trainer

        results = {}
        # remat first: without activation checkpointing the 512px 5-frame
        # step may not fit a single v5e chip at all (16 GB HBM) — an OOM on
        # the noremat variant is itself a meaningful datapoint, not a crash.
        # Memory levers (r03: even 128px OOM'd without them): the TrainState
        # is DONATED into the step (without donation XLA holds input+output
        # copies of the full ~6.7 GiB state), and the frozen towers (5.0 of
        # 5.4 GiB of params; bf16 compute regardless) are stored in bf16.
        # remat_lean additionally drops the EMA shadows and stores the Adam
        # first moment in bf16 — the single-chip memory floor; multi-chip
        # uses --zero1 sharding instead.
        variants = (("remat", True, True, None),
                    ("remat_lean", True, False, "bfloat16"),
                    ("noremat", False, True, None))
        if args.variants:
            want = set(args.variants.split(","))
            variants = tuple(v for v in variants if v[0] in want)
        for key, remat, use_ema, mu_dtype in variants:
            tcfg = _dc.replace(
                cfg,
                unet=_dc.replace(cfg.unet, use_checkpoint=remat),
                structcond=_dc.replace(cfg.structcond, use_checkpoint=remat),
            )
            # everything device-touching inside the try: phase-1 r03 saw the
            # OOM fire at init (device already full) and kill the process
            try:
                tpipe = MGLDVSRPipeline(tcfg)
                tparams = tpipe.init_params(jax.random.PRNGKey(0), size, size)
                trainer = Stage1Trainer(
                    tpipe, Stage1Config(grad_accum=1, use_ema=use_ema,
                                        adam_mu_dtype=mu_dtype,
                                        frozen_dtype=None if args.tiny
                                        else "bfloat16"))
                state = trainer.init_state(tparams)
                jax.block_until_ready(jax.tree_util.tree_leaves(
                    state.trainable)[0])
                pre = jax.devices()[0].memory_stats() or {}
                state_gb = sum(
                    x.size * x.dtype.itemsize
                    for x in jax.tree_util.tree_leaves(state)
                    if hasattr(x, "dtype")) / 2**30
                print(json.dumps({"variant": key, "static_hbm_gb": round(
                    pre.get("bytes_in_use", 0) / 2**30, 3),
                    "state_gb": round(state_gb, 3)}), flush=True)
                step_fn = jax.jit(trainer.train_step, donate_argnums=0)
                lq = jax.random.uniform(
                    jax.random.PRNGKey(1), (t, size, size, 3))
                gt = jax.random.uniform(
                    jax.random.PRNGKey(2), (t, size, size, 3))
                state, m = jax.block_until_ready(
                    step_fn(state, lq, gt, jax.random.PRNGKey(3)))
                times = []
                for i in range(args.iters):
                    t0 = time.perf_counter()
                    state, m = jax.block_until_ready(
                        step_fn(state, lq, gt, jax.random.PRNGKey(4 + i)))
                    times.append(time.perf_counter() - t0)
                stats = jax.local_devices()[0].memory_stats() or {}
                results[key] = {
                    "steps_per_sec": round(1.0 / min(times), 4),
                    "peak_hbm_gb": round(
                        stats.get("peak_bytes_in_use", 0) / 2**30, 3),
                }
            except Exception as e:  # RESOURCE_EXHAUSTED on noremat
                import traceback
                tb = traceback.format_exc().splitlines()
                results[key] = {"oom": True,
                                "error": type(e).__name__,
                                "detail": (str(e).split("\n")[0]
                                           or repr(e))[:200],
                                "at": " | ".join(tb[-4:-1])[:300]}
            # flush per-variant results immediately: a queue timeout killing
            # a later variant's 15-25 min compile must not lose this one
            print(json.dumps({"variant_result": key, **results[key]}),
                  flush=True)
            state = step_fn = trainer = tparams = tpipe = None  # release
        headline = results.get("remat", {}).get("steps_per_sec", 0.0)
        print(json.dumps({
            "metric": f"stage1 train steps/sec @{size}px {t}-frame clip"
                      " (remat)",
            "value": headline,
            "unit": "steps/sec",
            "vs_baseline": 0.0,
            "detail": results,
        }))
        return

    if args.mode == "train2":
        from mgldvsr_tpu.train.stage2 import Stage2Config, Stage2Trainer

        try:
            import dataclasses as _dc
            vae_cfg = (_dc.replace(cfg.vae, use_checkpoint=True,
                                   remat_min_res=args.remat_min_res)
                       if args.remat2 else cfg.vae)
            trainer = Stage2Trainer(
                vae_cfg, Stage2Config(grad_accum=1, num_frames=t))
            state = trainer.init_state(jax.random.PRNGKey(0), size, size)
            if args.split_step:
                # three programs instead of one fused step: at 512px the
                # fused compile crashed the remote helper twice (r04a/b);
                # identical math, each compile a fraction of the fused one
                flows_fn = jax.jit(trainer.frozen_flows)
                gen_fn = jax.jit(trainer.gen_step)
                disc_fn = jax.jit(trainer.disc_step, donate_argnums=0)

                def step_fn(st, lq_, gt_, lat_, _rng):
                    fl, oc = flows_fn(st, gt_)
                    st, recon, mg = gen_fn(st, lq_, gt_, lat_, fl, oc)
                    st, md = disc_fn(st, gt_, recon)
                    return st, {**mg, **md}
            else:
                step_fn = jax.jit(trainer.train_step, donate_argnums=0)
            lq = jax.random.uniform(jax.random.PRNGKey(1), (t, size, size, 3))
            gt = jax.random.uniform(jax.random.PRNGKey(2), (t, size, size, 3))
            lat = jax.random.normal(
                jax.random.PRNGKey(3), (t, size // 8, size // 8, 4))
            state, m = jax.block_until_ready(
                step_fn(state, lq, gt, lat, jax.random.PRNGKey(4)))
            times = []
            for i in range(args.iters):
                t0 = time.perf_counter()
                state, m = jax.block_until_ready(
                    step_fn(state, lq, gt, lat, jax.random.PRNGKey(5 + i)))
                times.append(time.perf_counter() - t0)
            stats = jax.local_devices()[0].memory_stats() or {}
            detail = {"steps_per_sec": round(1.0 / min(times), 4),
                      "peak_hbm_gb": round(
                          stats.get("peak_bytes_in_use", 0) / 2**30, 3)}
        except Exception as e:
            import traceback
            tb = traceback.format_exc().splitlines()
            detail = {"oom": True, "error": type(e).__name__,
                      "detail": (str(e).split("\n")[0] or repr(e))[:200],
                      "at": " | ".join(tb[-4:-1])[:300]}
        print(json.dumps({
            "metric": f"stage2 video-VAE GAN train steps/sec @{size}px"
                      f" {t}-frame clip",
            "value": detail.get("steps_per_sec", 0.0),
            "unit": "steps/sec",
            "vs_baseline": 0.0,
            "detail": detail,
        }))
        return

    if args.decode_chunk:
        import dataclasses as _dc
        cfg = _dc.replace(cfg, decode_chunk_windows=args.decode_chunk)
    if args.flow_scale is not None:
        import dataclasses as _dc
        cfg = _dc.replace(cfg, flow_scale=args.flow_scale)
    if args.flow_chunk:
        import dataclasses as _dc
        cfg = _dc.replace(cfg, flow_chunk_pairs=args.flow_chunk)
    pipe = MGLDVSRPipeline(cfg)
    rng = jax.random.PRNGKey(0)
    # fast shape-based init (host-side; no XLA compile)
    params = pipe.init_params(rng, size, size)
    if not args.tiny:
        # bf16 parameter storage for inference: halves weight HBM traffic
        # and removes the per-step fp32->bf16 casts inside the scan
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            params,
        )
    if args.mode == "tile":
        # the reference's real use case (oldcanvas_tile): 320x180 LQ -> x4
        # 1280x720 via bicubic pre-upscale, /32 pad, overlapping 960px
        # patches, canvas restore per patch, overlap-average gather
        lh, lw = (24, 40) if args.tiny else (180, 320)
        lq = jax.random.uniform(jax.random.PRNGKey(1), (t, lh, lw, 3))
        tile_kw = dict(use_guidance=not args.no_guidance,
                       pch_size=args.pch_size, pch_stride=args.pch_stride,
                       tile_overlap=args.tile_overlap,
                       patch_batch=args.patch_batch)
        if args.tiny:  # keep the working size tiny (default min_side=512)
            tile_kw.update(min_side=lh * 4,
                           pch_size=min(args.pch_size or 64, 64),
                           pch_stride=min(args.pch_stride or 48, 48))
        t0 = time.perf_counter()
        out = pipe.restore_video(params, lq, jax.random.PRNGKey(2),
                                 **tile_kw)
        first = time.perf_counter() - t0
        assert np.isfinite(out[0, 0, 0]).all()
        times = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            pipe.restore_video(params, lq, jax.random.PRNGKey(3 + i),
                               **tile_kw)
            times.append(time.perf_counter() - t0)
        best = min(times)
        fps = t / best
        print(json.dumps({
            "metric": (f"frames/sec/chip x4 VSR {lw}x{lh}->"
                       f"{lw * 4}x{lh * 4} tiled-canvas "
                       f"{steps}-step guided DDPM"),
            "value": round(fps, 4),
            "unit": "frames/sec",
            "vs_baseline": round(fps / args.baseline_fps, 3),
            "baseline_fps": args.baseline_fps,
            "first_call_s": round(first, 2),
            "steady_s_per_clip": round(best, 3),
        }))
        return

    if args.windows is None:
        # Measured ladder on v5e (r03, 512px 50-step): 1w 1.6545, 2w 1.6646,
        # 4w 1.8512, 6w 1.9173 fps/chip; 8w OOMs the 16 GB chip. 6 is the
        # best batch that fits — bigger conv/matmul M amortizes the GN/glue
        # overhead per frame at identical math.
        args.windows = 1 if args.tiny else 6
    nb = t * args.windows
    frames = jax.random.uniform(jax.random.PRNGKey(1), (nb, size, size, 3))

    restore = jax.jit(
        lambda p, f, k: pipe.restore_segment(
            p, f, k, use_guidance=not args.no_guidance))

    # compile + warmup
    out = jax.block_until_ready(restore(params, frames, jax.random.PRNGKey(2)))
    assert np.isfinite(np.asarray(out[0, 0, 0])).all()

    times = []
    for i in range(args.iters):
        k = jax.random.PRNGKey(3 + i)
        t0 = time.perf_counter()
        jax.block_until_ready(restore(params, frames, k))
        times.append(time.perf_counter() - t0)
    best = min(times)
    fps = nb / best
    wtag = f" ({args.windows}-window batch)" if args.windows > 1 else ""
    if cfg.flow_scale >= 1.0:
        # r5 protocol change: flows at the reference's full working res
        # (old.py:344-348) — label it so cross-round comparisons don't
        # read the default flip (r3/r4 benched the 0.5 speed knob at
        # 1.9174) as a regression
        wtag += " [full-res flows]"

    print(
        json.dumps(
            {
                "metric": f"frames/sec/chip x4 VSR @{size}px {steps}-step guided DDPM{wtag}",
                "value": round(fps, 4),
                "unit": "frames/sec",
                "vs_baseline": round(fps / args.baseline_fps, 3),
                "windows": args.windows,
                "flow_scale": cfg.flow_scale,
                "baseline_fps": args.baseline_fps,
                "baseline_provenance": (
                    "ESTIMATE (see BASELINE.md 'Anchor provenance'): the "
                    "reference publishes no throughput; 0.25 fps assumes "
                    "~20 s per 5-frame 512px segment on A100 for its "
                    "unfused eager-torch 50-step guided loop. Override "
                    "with --baseline-fps when a measured number exists."
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
