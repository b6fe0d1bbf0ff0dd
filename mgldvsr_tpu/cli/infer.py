"""Inference CLI — the counterpart of the reference's three vsr_val scripts
(/root/reference/scripts/vsr_val_ddpm_text_T_vqganfin_{old,oldcanvas_tile,
w_latent}.py) in one entry point:

  python -m mgldvsr_tpu.cli.infer --seqs-path LQ_ROOT --out-path OUT \
      [--params orbax_dir] [--mode fixed|tile|latent] [--ddpm-steps 50] \
      [--dec-w 1.0] [--colorfix adain|wavelet|none] [--guidance -10] \
      [--shard 0 --num-shards 1] [--seed 42]

Sequence-level sharding matches the reference's multi-process protocol
(seq_idx % num_shards == shard, scripts old.py:294-296) — run one process
per chip/host. ``--mode latent`` additionally dumps per-frame latents as
.npy for stage-2 training data (w_latent path).
"""
from __future__ import annotations

import argparse
import os

# persistent XLA compilation cache: repeated CLI runs skip recompiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/mgld_jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import time


def build_pipeline(args):
    import jax.numpy as jnp

    from mgldvsr_tpu.flow.raft import RAFTConfig
    from mgldvsr_tpu.infer.pipeline import MGLDVSRPipeline, PipelineConfig
    from mgldvsr_tpu.models.cliptext import CLIPTextConfig
    from mgldvsr_tpu.models.unet import StructCondConfig, UNetConfig
    from mgldvsr_tpu.models.vae import VAEConfig

    dt = jnp.bfloat16 if args.bf16 else jnp.float32

    def _mk(cfg):
        # --flow-scale overrides the config's RAFT working-resolution knob
        # (segment/latent modes; tile mode passes its own protocol scale)
        import dataclasses

        if getattr(args, "flow_scale", None) is not None:
            cfg = dataclasses.replace(cfg, flow_scale=args.flow_scale)
        if getattr(args, "flow_chunk", None):
            cfg = dataclasses.replace(cfg,
                                      flow_chunk_pairs=args.flow_chunk)
        return MGLDVSRPipeline(cfg)

    if args.preset == "tiny":
        # CI/smoke config: same graph shapes, 10x smaller widths
        cfg = PipelineConfig(
            ddpm_steps=args.ddpm_steps,
            guidance_scale=args.guidance,
            dec_w=args.dec_w,
            colorfix=args.colorfix,
            unet=UNetConfig(model_channels=32, num_head_channels=16,
                            context_dim=32, semb_channels=32,
                            channel_mult=(1, 2), attention_resolutions=(1, 2),
                            dtype=dt),
            structcond=StructCondConfig(model_channels=32, out_channels=32,
                                        channel_mult=(1, 1),
                                        attention_resolutions=(1, 2),
                                        dtype=dt),
            vae=VAEConfig(ch=32, ch_mult=(1, 1, 2, 2), num_res_blocks=1,
                          num_frames=5, enable_fusion=True, num_fuse_block=1,
                          dtype=dt),
            clip=CLIPTextConfig(width=32, heads=2, layers=2, dtype=dt),
            raft=RAFTConfig(iters=2),
        )
        return _mk(cfg)
    if getattr(args, "model_cfg", None):
        import dataclasses

        from mgldvsr_tpu.utils.config import pipeline_config_from_dict

        cfg = pipeline_config_from_dict(args.model_cfg)
        # CLI-resolved knobs (whose argparse defaults already absorbed the
        # config values) win over the raw model subtree
        cfg = dataclasses.replace(
            cfg, ddpm_steps=args.ddpm_steps, guidance_scale=args.guidance,
            dec_w=args.dec_w, colorfix=args.colorfix)
        # dtype: an explicit per-module config dtype wins; otherwise the
        # CLI-level choice applies (bf16 default / --no-bf16 = fp32) —
        # same behavior as the non-config path
        for name in ("unet", "structcond", "vae", "clip"):
            if "dtype" not in (args.model_cfg.get(name) or {}):
                cfg = dataclasses.replace(
                    cfg, **{name: dataclasses.replace(
                        getattr(cfg, name), dtype=dt)})
        return _mk(cfg)
    cfg = PipelineConfig(
        ddpm_steps=args.ddpm_steps,
        guidance_scale=args.guidance,
        dec_w=args.dec_w,
        colorfix=args.colorfix,
        unet=UNetConfig(dtype=dt),
        structcond=StructCondConfig(dtype=dt),
        vae=VAEConfig(num_frames=5, enable_fusion=True, dtype=dt),
        clip=CLIPTextConfig(dtype=dt),
        raft=RAFTConfig(),
    )
    return _mk(cfg)


def load_or_init_params(pipe, args):
    import jax

    if args.params:
        from mgldvsr_tpu.io.checkpoint import load_params

        return load_params(args.params)
    if args.torch_ckpt:
        from mgldvsr_tpu.io.ckpt_convert import (
            convert_mgld_checkpoint,
            convert_raft,
            load_torch_state_dict,
            to_jax,
        )

        sd = load_torch_state_dict(args.torch_ckpt)
        params = to_jax(convert_mgld_checkpoint(sd))
        if args.raft_ckpt:
            params["raft"] = to_jax(
                convert_raft(load_torch_state_dict(args.raft_ckpt))
            )
        if args.vqgan_ckpt:
            from mgldvsr_tpu.io.ckpt_convert import convert_autoencoder

            vsd = load_torch_state_dict(args.vqgan_ckpt)
            params["vae"] = to_jax(
                convert_autoencoder(vsd, prefix="", video=True, fusion=True)
            )
        return params
    print("WARNING: no checkpoint given — using random weights (smoke mode)")
    return pipe.init_params(jax.random.PRNGKey(0), args.size, args.size)


def main(argv=None):
    # config files + dotlist overrides (see configs/infer_mgldvsr.yaml);
    # config values become argparse defaults, explicit CLI flags win
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--config", action="append", default=[])
    pre.add_argument("--set", dest="overrides", action="append", default=[],
                     metavar="KEY.PATH=VALUE")
    pre_args, _ = pre.parse_known_args(argv)
    cfg = {}
    if pre_args.config or pre_args.overrides:
        from mgldvsr_tpu.utils.config import load_config

        cfg = load_config(pre_args.config, pre_args.overrides)

    ap = argparse.ArgumentParser(description=__doc__, parents=[pre])
    ap.add_argument("--seqs-path", required=True)
    ap.add_argument("--out-path", required=True)
    ap.add_argument("--params", help="orbax params dir")
    ap.add_argument("--torch-ckpt", help="MGLD/SD torch checkpoint")
    ap.add_argument("--vqgan-ckpt", help="video VAE torch checkpoint")
    ap.add_argument("--raft-ckpt", help="raft-things torch checkpoint")
    ap.add_argument("--mode", choices=["fixed", "tile", "latent"],
                    default="fixed")
    ap.add_argument("--ddpm-steps", type=int, default=50)
    ap.add_argument("--dec-w", type=float, default=1.0)
    ap.add_argument("--guidance", type=float, default=-10.0)
    ap.add_argument("--colorfix", default="adain",
                    choices=["adain", "wavelet", "none"])
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--shard", type=int, default=0)
    ap.add_argument("--num-shards", type=int, default=1)
    ap.add_argument("--patch-parallel", action="store_true",
                    help="tile mode: distribute canvas patches over all "
                         "local devices (shard_map; outputs identical to "
                         "sequential)")
    ap.add_argument("--vqgantile-size", type=int, default=960,
                    help="tile mode: pixel patch size (reference "
                         "oldcanvas_tile.py --vqgantile_size default 960; "
                         "measured on v5e at 1280x720 the 512/448 grid is "
                         "2.3x faster than the 960/750 default — see "
                         "NOTES.md tile geometry accounting; 0 = auto: "
                         "one canvas tile per patch, stride 7/8)")
    ap.add_argument("--vqgantile-stride", type=int, default=750,
                    help="tile mode: pixel patch stride (reference "
                         "--vqgantile_stride default 750; pair with "
                         "--vqgantile-size 512 -> stride 448; 0 = auto: "
                         "7/8 of the patch in latent units. With "
                         "--vqgantile-size 0 a stale stride >= the auto "
                         "patch size is auto-resolved too, so the "
                         "recommended '--vqgantile-size 0' alone yields "
                         "the measured 512/448 overlap grid)")
    ap.add_argument("--tile-overlap", type=int, default=32,
                    help="tile mode: latent canvas tile overlap (reference "
                         "--tile_overlap default 32)")
    ap.add_argument("--patch-batch", type=int, default=None,
                    help="tile mode: canvas patches batched per compiled "
                         "call along the window axis (default: auto-fit; "
                         "1 disables; outputs identical to sequential — "
                         "noise is drawn per window)")
    ap.add_argument("--min-side", type=int, default=512,
                    help="tile mode: minimum working-frame side (the "
                         "reference hardcodes 512, oldcanvas_tile.py:352; "
                         "override for small smoke runs)")
    ap.add_argument("--window-parallel", action="store_true",
                    help="fixed mode: run one num_frames window per local "
                         "device with per-step ICI boundary-latent halo "
                         "(cross-window coherent guidance); remainder "
                         "windows run per-device")
    ap.add_argument("--boundary-weight", type=float, default=1.0,
                    help="window-parallel: weight of the cross-window "
                         "boundary guidance term (0 = independent windows)")
    ap.add_argument("--window-batch", type=int, default=1,
                    help="fixed mode, single device: batch N consecutive "
                         "num_frames windows into one compiled restore call "
                         "(throughput lever; deterministic computation is "
                         "bitwise-equal to solo calls, but the batch shares "
                         "one RNG key so noise realizations differ — "
                         "statistically, not bitwise, equivalent at "
                         "temperature>0)")
    ap.add_argument("--flow-scale", type=float, default=None,
                    help="resolution RAFT runs at, relative to the working "
                         "size. Default: the pipeline config (1.0 — the "
                         "reference's fixed script computes flows at FULL "
                         "working resolution, old.py:344-348). 0.5 is the "
                         "measured speed knob (+8%% fps; flows are only "
                         "consumed at 1/8 latent res). Tile mode has its "
                         "own protocol scale (0.25, oldcanvas_tile.py:396) "
                         "and ignores this flag unless set explicitly.")
    ap.add_argument("--flow-chunk", type=int, default=None,
                    help="run RAFT over groups of this many frame pairs "
                         "under lax.map (bounds corr-volume memory; the "
                         "enabler for --flow-scale 1.0 at large window "
                         "batches; outputs identical to the one-shot "
                         "batch)")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--no-bf16", dest="bf16", action="store_false")
    ap.add_argument("--preset", choices=["full", "tiny"], default="full",
                    help="'tiny' = smoke-test widths (random weights)")
    if cfg.get("infer"):
        known = {a.dest for a in ap._actions}
        unknown = set(cfg["infer"]) - known
        if unknown:
            raise KeyError(f"config infer: unknown keys {sorted(unknown)}")
        ap.set_defaults(**cfg["infer"])
    # model-level knobs the CLI also exposes: config wins over the argparse
    # default, an explicit flag wins over the config
    model_cfg = cfg.get("model") or {}
    for cfg_key, dest in [("ddpm_steps", "ddpm_steps"),
                          ("guidance_scale", "guidance"),
                          ("dec_w", "dec_w"), ("colorfix", "colorfix"),
                          ("num_frames", None)]:
        if dest and cfg_key in model_cfg:
            ap.set_defaults(**{dest: model_cfg[cfg_key]})
    args = ap.parse_args(argv)
    args.model_cfg = model_cfg

    import cv2
    import jax
    import numpy as np

    from mgldvsr_tpu.data.datasets import VideoFolderDataset
    from mgldvsr_tpu.infer.pipeline import upscale_frames

    pipe = build_pipeline(args)
    params = load_or_init_params(pipe, args)
    ds = VideoFolderDataset(args.seqs_path, num_frame=pipe.cfg.num_frames)

    if args.mode == "fixed":
        restore = jax.jit(
            lambda p, f, k: pipe.restore_segment(p, f, k)
        )
    elif args.mode == "latent":
        restore = jax.jit(
            lambda p, f, k: pipe.restore_with_latents(p, f, k)
        )

    rng = jax.random.PRNGKey(args.seed)
    n_dev = len(jax.devices())
    # one flag decides BOTH the group size and the group dispatch below:
    # --window-parallel with a single device falls back to --window-batch
    # batching rather than hitting restore_windows_sharded's one-device-
    # per-window assertion
    use_sharded = args.window_parallel and args.mode == "fixed" and n_dev > 1
    if use_sharded:
        group_size = n_dev
    elif args.mode == "fixed":
        group_size = max(1, args.window_batch)
    else:
        group_size = 1
    for seq_idx in range(len(ds)):
        if seq_idx % args.num_shards != args.shard:
            continue
        t0 = time.time()
        n_frames = 0
        segments = list(ds.segments(seq_idx))
        grouped = []
        i = 0
        while i < len(segments):
            g = segments[i : i + group_size]
            if len(g) >= 2 and group_size > 1:
                # any >=2 consecutive windows parallelize (the mesh sizes
                # itself to the group); a lone remainder runs per-device
                grouped.append(("group", g))
                i += len(g)
            else:
                grouped.append(("single", [segments[i]]))
                i += 1
        for kind, group in grouped:
            clip = group[0][0]
            outdir = os.path.join(args.out_path, clip)
            os.makedirs(outdir, exist_ok=True)
            if kind == "group":
                key = jax.random.fold_in(
                    rng, hash((clip, group[0][1][0])) % 2**31)
                ups = np.concatenate(
                    [np.asarray(upscale_frames(f, pipe.cfg.sf))
                     for _, _, f in group])
                if use_sharded:
                    # consecutive windows, one per device, halo-coupled
                    out_all = np.asarray(pipe.restore_windows_sharded(
                        params, jax.numpy.asarray(ups), key,
                        dec_w=args.dec_w,
                        boundary_weight=args.boundary_weight))
                else:
                    # single-device window batch: one compiled call,
                    # windows stay fully independent
                    out_all = np.asarray(restore(
                        params, jax.numpy.asarray(ups), key))
                t_w = pipe.cfg.num_frames
                for w_idx, (_, names, _) in enumerate(group):
                    out_w = out_all[w_idx * t_w : (w_idx + 1) * t_w]
                    for i2, name in enumerate(names):
                        img = (np.clip(out_w[i2], 0, 1)[..., ::-1]
                               * 255).round().astype(np.uint8)
                        cv2.imwrite(os.path.join(outdir, name), img)
                    n_frames += len(names)
                continue
            _, names, frames = group[0]
            key = jax.random.fold_in(rng, hash((clip, names[0])) % 2**31)
            if args.mode == "tile":
                out = pipe.restore_video(
                    params, frames, key, dec_w=args.dec_w,
                    pch_size=args.vqgantile_size,
                    pch_stride=args.vqgantile_stride,
                    tile_overlap=args.tile_overlap,
                    min_side=args.min_side,
                    **({"flow_scale": args.flow_scale}
                       if args.flow_scale is not None else {}),
                    patch_batch=args.patch_batch,
                    patch_devices=(jax.devices()
                                   if args.patch_parallel else None))
                latents = None
            else:
                up = upscale_frames(frames, pipe.cfg.sf)
                result = restore(params, up, key)
                if args.mode == "latent":
                    out, latents = result
                else:
                    out, latents = result, None
                out = np.asarray(out)
            for i, name in enumerate(names):
                img = (np.clip(out[i], 0, 1)[..., ::-1] * 255).round().astype(
                    np.uint8
                )
                cv2.imwrite(os.path.join(outdir, name), img)
                if latents is not None:
                    np.save(
                        os.path.join(outdir,
                                     os.path.splitext(name)[0] + ".npy"),
                        np.asarray(latents[i]),
                    )
            n_frames += len(names)
        dt = time.time() - t0
        print(f"[{seq_idx}] {ds.clips[seq_idx]}: {n_frames} frames in "
              f"{dt:.1f}s ({n_frames / max(dt, 1e-9):.2f} fps)", flush=True)


if __name__ == "__main__":
    main()
