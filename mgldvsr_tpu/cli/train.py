"""Training CLI — the counterpart of the reference's Lightning ``main.py``:

  python -m mgldvsr_tpu.cli.train --stage 1 --data-root REDS_GT \
      [--config cfg.yaml ...] [--logdir runs/exp] [--max-steps N] \
      [--batch-clips 1] [--resume] [--tiny] [key.path=value ...]

Stage 1 finetunes SPADE+temporal+structcond on degraded clips; stage 2
finetunes the video-VAE fusion/temporal layers against dumped latents.
Data parallelism: the flattened frame batch shards over the mesh's 'data'
axis; gradient psums are inserted by the XLA partitioner (no DDP).
SIGUSR1 checkpoints immediately; KeyboardInterrupt saves 'last'.
"""
from __future__ import annotations

import argparse
import os

# persistent XLA compilation cache: repeated CLI runs skip recompiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/mgld_jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def default_degradation_cfg():
    """The shipped stage-1 degradation recipe (SURVEY §2.7 defaults)."""
    blur = dict(
        kernel_size=[7, 9, 11, 13, 15, 17, 19, 21],
        kernel_list=["iso", "aniso", "generalized_iso", "generalized_aniso",
                     "plateau_iso", "plateau_aniso", "sinc"],
        kernel_prob=[0.405, 0.225, 0.108, 0.027, 0.108, 0.027, 0.1],
        sigma_x=[0.2, 3], sigma_y=[0.2, 3],
        rotate_angle=[-3.1416, 3.1416],
        beta_gaussian=[0.5, 4], beta_plateau=[1, 2],
        sigma_x_step=0.02, sigma_y_step=0.02, rotate_angle_step=0.31416,
        beta_gaussian_step=0.05, beta_plateau_step=0.1, omega_step=0.0628,
    )
    deg1 = dict(
        random_blur=dict(params=blur),
        random_resize=dict(params=dict(
            resize_mode_prob=[0.2, 0.7, 0.1], resize_scale=[0.15, 1.5],
            resize_opt=["bilinear", "area", "bicubic"],
            resize_prob=[0.3333, 0.3333, 0.3334], resize_step=0.015,
            is_size_even=True)),
        random_noise=dict(params=dict(
            noise_type=["gaussian", "poisson"], noise_prob=[0.5, 0.5],
            gaussian_sigma=[1, 30], gaussian_gray_noise_prob=0.4,
            poisson_scale=[0.05, 3], poisson_gray_noise_prob=0.4,
            gaussian_sigma_step=0.1, poisson_scale_step=0.005)),
        random_jpeg=dict(params=dict(quality=[30, 95], quality_step=3)),
        random_mpeg=dict(params=dict(
            codec=["libx264", "h264", "mpeg4"],
            codec_prob=[0.3333, 0.3333, 0.3334],
            bitrate=[1e4, 1e5])),
    )
    blur2 = dict(blur, prob=0.8, sigma_x=[0.2, 1.5], sigma_y=[0.2, 1.5])
    deg2 = dict(
        random_blur=dict(params=blur2),
        random_resize=dict(params=dict(
            resize_mode_prob=[0.3, 0.4, 0.3], resize_scale=[0.3, 1.2],
            resize_opt=["bilinear", "area", "bicubic"],
            resize_prob=[0.3333, 0.3333, 0.3334], resize_step=0.03,
            is_size_even=True)),
        random_noise=dict(params=dict(
            noise_type=["gaussian", "poisson"], noise_prob=[0.5, 0.5],
            gaussian_sigma=[1, 25], gaussian_gray_noise_prob=0.4,
            poisson_scale=[0.05, 2.5], poisson_gray_noise_prob=0.4,
            gaussian_sigma_step=0.1, poisson_scale_step=0.005)),
        random_jpeg=dict(params=dict(quality=[30, 95], quality_step=3)),
        random_mpeg=dict(params=dict(
            codec=["libx264", "h264", "mpeg4"],
            codec_prob=[0.3333, 0.3333, 0.3334],
            bitrate=[1e4, 1e5])),
        resize_final=dict(params=dict(
            target_size=[128, 128], resize_opt=["bilinear", "area", "bicubic"],
            resize_prob=[0.3333, 0.3333, 0.3334])),
        blur_final=dict(params=dict(
            prob=0.8, kernel_size=[7, 9, 11, 13, 15, 17, 19, 21],
            kernel_list=["sinc"], kernel_prob=[1.0],
            omega=[1.0472, 3.1416], omega_step=0.0628)),
    )
    return deg1, deg2


def batched_items(it, clips_per_step: int):
    """Group dataset items into one multi-clip batch (frame axes
    concatenate: [k*t, ...]) so a dp-way mesh gets one clip per slot."""
    if clips_per_step <= 1:
        yield from it
        return
    import numpy as np

    buf = []
    for item in it:
        buf.append(item)
        if len(buf) == clips_per_step:
            yield {
                key: (np.concatenate([b[key] for b in buf])
                      if isinstance(val, np.ndarray) else val)
                for key, val in buf[0].items()
            }
            buf = []
    if buf:  # tail clips were loaded+degraded but don't fill a batch
        print(f"batched_items: dropping {len(buf)} tail clip(s) "
              f"(< {clips_per_step} per step)", flush=True)


def main(argv=None):
    # pass 1: config files + dotlist overrides (the reference's
    # `--base cfg.yaml ... key=value` OmegaConf flow, main.py:530-548).
    # Config values become argparse defaults, so explicit CLI flags win.
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--config", action="append", default=[],
                     help="YAML config(s), merged left-to-right "
                          "(see configs/)")
    pre.add_argument("--set", dest="overrides", action="append", default=[],
                     metavar="KEY.PATH=VALUE",
                     help="dotlist config overrides")
    pre_args, _ = pre.parse_known_args(argv)
    cfg = {}
    if pre_args.config or pre_args.overrides:
        from mgldvsr_tpu.utils.config import load_config

        cfg = load_config(pre_args.config, pre_args.overrides)

    ap = argparse.ArgumentParser(description=__doc__, parents=[pre])
    ap.add_argument("--stage", type=int, choices=[1, 2], default=1)
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--lq-root", help="stage 2: LQ frames root")
    ap.add_argument("--latent-root", help="stage 2: dumped latents root")
    ap.add_argument("--logdir", default="runs/default")
    ap.add_argument("--max-steps", type=int, default=800_000)
    ap.add_argument("--gt-size", type=int, default=512)
    ap.add_argument("--num-frames", type=int, default=5)
    ap.add_argument("--lr", type=float, default=5e-5)
    ap.add_argument("--grad-accum", type=int, default=4)
    ap.add_argument("--frozen-dtype", default=None,
                    choices=[None, "bfloat16"],
                    help="storage dtype for the FROZEN towers (no optimizer "
                         "updates; compute is bf16 regardless) — halves "
                         "their HBM; the single-chip fit lever for 512px "
                         "stage-1 (measured r03: 4.2 GiB state vs ~6.7 fp32)")
    ap.add_argument("--mu-dtype", default=None, choices=[None, "bfloat16"],
                    help="Adam first-moment dtype (bfloat16 halves its "
                         "bytes; variance stays fp32)")
    ap.add_argument("--ckpt-every", type=int, default=3000)
    ap.add_argument("--log-every", type=int, default=100)
    ap.add_argument("--image-every", type=int, default=750)
    ap.add_argument("--params", help="initial params (orbax dir)")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--seed", type=int, default=23)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model configs (smoke/CI)")
    ap.add_argument("--platform", choices=["cpu", "tpu"], default=None,
                    help="pin the JAX platform in-process (the axon "
                         "sitecustomize overrides the JAX_PLATFORMS env "
                         "var, so CI/smoke runs that must NOT touch the "
                         "chip need --platform cpu)")
    ap.add_argument("--no-tb", action="store_true",
                    help="disable tensorboard event files")
    ap.add_argument("--sample-rows", action="store_true",
                    help="log sampler rows (reconstruction/samples/"
                         "denoise_row) at every image-log step")
    ap.add_argument("--mesh", action="store_true",
                    help="shard the train step over all visible devices "
                         "(('data','tensor') mesh; batch = one clip per "
                         "data-mesh slot)")
    ap.add_argument("--multihost", action="store_true",
                    help="join the JAX distributed runtime first (TPU pod: "
                         "autodetected; implies --mesh). Run one identical "
                         "process per host.")
    ap.add_argument("--tensor-parallel", type=int, default=1,
                    help="tensor axis size of the mesh (weights' out-dims "
                         "split megatron-style; degrades gracefully)")
    ap.add_argument("--split-step", action="store_true",
                    help="stage 2: jit flows/generator/discriminator as "
                         "three programs instead of one fused step "
                         "(identical math; the fused 512px compile "
                         "crashes the remote helper — measured r04/r05)")
    ap.add_argument("--zero1", action="store_true",
                    help="ZeRO stage-1: shard optimizer moments, grad-accum "
                         "buffers and EMA shadows over the mesh's data axis "
                         "(params stay replicated; each device holds 1/dp "
                         "of the optimizer state)")
    if cfg.get("train"):
        known = {a.dest for a in ap._actions}
        defaults = {k: v for k, v in cfg["train"].items() if k in known}
        unknown = set(cfg["train"]) - known
        if unknown:
            raise KeyError(f"config train: unknown keys {sorted(unknown)}")
        ap.set_defaults(**defaults)
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from mgldvsr_tpu.data.datasets import (
        REDSAutoencoderDataset,
        RealVSRRecurrentDataset,
        ShardedSampler,
        prefetch_iterator,
    )
    from mgldvsr_tpu.infer.pipeline import MGLDVSRPipeline, upscale_frames
    from mgldvsr_tpu.io.checkpoint import CheckpointManager, install_signal_save
    from mgldvsr_tpu.utils.logging import ImageLogger, MessageLogger, env_info

    # distribution: multihost joins the pod runtime (jax.devices() becomes
    # global), --mesh shards the step over whatever is visible. Each host
    # feeds its own sampler shard; grads psum across the 'data' axis.
    proc_idx, proc_cnt = 0, 1
    mesh = None
    if args.multihost:
        from mgldvsr_tpu.parallel.mesh import init_multihost

        proc_idx, proc_cnt = init_multihost()
        args.mesh = True
    if args.mesh:
        from mgldvsr_tpu.parallel.mesh import (
            host_local_to_global,
            make_mesh,
            place_train_state,
        )

        mesh = make_mesh(tp=args.tensor_parallel)
        print(f"mesh {dict(mesh.shape)} over {len(mesh.devices.flat)} "
              f"devices, host {proc_idx}/{proc_cnt}", flush=True)

    is_main = proc_idx == 0
    print(env_info(), flush=True)
    os.makedirs(args.logdir, exist_ok=True)
    tb = None
    if not args.no_tb:
        from mgldvsr_tpu.utils.tb import TBEventWriter

        tb = TBEventWriter(os.path.join(args.logdir, "tb"))
    msg = MessageLogger(args.max_steps,
                        os.path.join(args.logdir, "metrics.jsonl"),
                        args.log_every, tb=tb)
    imglog = ImageLogger(args.logdir, args.image_every, tb=tb)
    ckpt = CheckpointManager(os.path.join(args.logdir, "ckpt"),
                             save_interval_steps=args.ckpt_every)

    if args.tiny:
        from tests.test_pipeline import tiny_config

        pipe_cfg = tiny_config(num_frames=args.num_frames)
        pipe = MGLDVSRPipeline(pipe_cfg)
        gt_size = 32
    elif cfg.get("model"):
        from mgldvsr_tpu.utils.config import pipeline_config_from_dict

        pipe = MGLDVSRPipeline(pipeline_config_from_dict(cfg["model"]))
        gt_size = args.gt_size
    else:
        pipe = MGLDVSRPipeline()
        gt_size = args.gt_size

    if args.stage == 1:
        from mgldvsr_tpu.train.trainer import Stage1Config, Stage1Trainer

        deg1, deg2 = default_degradation_cfg()
        data_cfg = dict(cfg.get("data", {}))
        deg1 = data_cfg.pop("degradation_1", deg1)
        deg2 = data_cfg.pop("degradation_2", deg2)
        if args.tiny:
            # single stage, fixed LQ size (static shapes => one compile)
            deg1 = dict(deg1, resize_final=dict(params=dict(
                target_size=[gt_size // 4, gt_size // 4],
                resize_opt=["bicubic"], resize_prob=[1.0])))
            deg1.pop("random_mpeg", None)
            deg2 = None
        ds = RealVSRRecurrentDataset(
            args.data_root, num_frame=args.num_frames, gt_size=gt_size,
            degradation_1=deg1, degradation_2=deg2,
            seed=args.seed,
            **data_cfg,  # meta_info_file / val_partition / packed_root / ...
        )
        trainer = Stage1Trainer(
            pipe, Stage1Config(learning_rate=args.lr,
                               grad_accum=args.grad_accum,
                               adam_mu_dtype=args.mu_dtype,
                               frozen_dtype=args.frozen_dtype)
        )
        if args.params:
            from mgldvsr_tpu.io.checkpoint import load_params

            params = load_params(args.params)
        else:
            params = pipe.init_params(jax.random.PRNGKey(args.seed),
                                      gt_size, gt_size)
        state = trainer.init_state(params)
        if args.resume and ckpt.latest_step() is not None:
            state = ckpt.restore(template=state)
            print(f"resumed at step {int(state.step)}", flush=True)

        if mesh is not None:
            state = place_train_state(state, mesh, zero1=args.zero1)
        if mesh is not None and args.zero1:
            from mgldvsr_tpu.parallel.mesh import state_shardings
            # pin the updated state to its ZeRO-1 placement every step
            step_fn = jax.jit(trainer.train_step, donate_argnums=0,
                              out_shardings=(state_shardings(state), None))
        else:
            # donate: without aliasing, XLA holds input+output copies of the
            # full train state (2x ~GiB-scale on a 16 GB chip)
            step_fn = jax.jit(trainer.train_step, donate_argnums=0)
        install_signal_save(lambda: (int(state.step), state), ckpt)

        rng = jax.random.PRNGKey(args.seed)
        clips_per_step = (max(mesh.shape["data"] // proc_cnt, 1)
                          if mesh is not None else 1)
        # enlarge epochs (EnlargedSampler ratio) so every shard yields at
        # least one full multi-clip batch per epoch even on tiny datasets
        ratio = -(-clips_per_step * proc_cnt // max(len(ds), 1))
        sampler = ShardedSampler(len(ds), shard=proc_idx,
                                 num_shards=proc_cnt, ratio=ratio,
                                 seed=args.seed)
        if len(sampler.epoch(0)) < clips_per_step:  # would spin silently
            raise ValueError(
                f"dataset too small: epoch yields {len(sampler.epoch(0))} "
                f"clips on this shard but each step needs {clips_per_step}")
        step = int(state.step)
        try:
            epoch = 0
            while step < args.max_steps:
                for item in batched_items(
                        prefetch_iterator(ds, sampler.epoch(epoch)),
                        clips_per_step):
                    lq = upscale_frames(jnp.asarray(item["lqs"]), pipe.cfg.sf)
                    gt = jnp.asarray(item["gts"])
                    # host-local handles for image logging (no copy here;
                    # device->host transfer only when a log step fires)
                    lq_local, gt_local = lq, gt
                    if mesh is not None:
                        lq, gt = host_local_to_global((lq, gt), mesh)
                    rng, k = jax.random.split(rng)
                    state, metrics = step_fn(state, lq, gt, k)
                    step = int(state.step)
                    if is_main:
                        if step % args.log_every == 0:
                            # peak HBM at log cadence (a host RPC per query;
                            # soak runs watch for allocator creep over hours)
                            _st = jax.local_devices()[0].memory_stats() or {}
                            metrics = dict(metrics, peak_hbm_gb=_st.get(
                                "peak_bytes_in_use", 0) / 2**30)
                        msg(step, metrics, lr=args.lr)
                    ckpt.save(step, state,
                              metrics={k_: float(v) for k_, v in metrics.items()})
                    if is_main and imglog.should_log(step):
                        rows = {"lq": np.asarray(lq_local),
                                "gt": np.asarray(gt_local)}
                        if args.sample_rows:
                            from mgldvsr_tpu.train.trainer import merge_params

                            rng, ks = jax.random.split(rng)
                            rows.update({
                                k_: np.asarray(v) for k_, v in
                                pipe.log_images(
                                    merge_params(state.trainable,
                                                 state.frozen),
                                    lq_local, ks,
                                ).items()
                            })
                        imglog.log_images(step, rows)
                    if step >= args.max_steps:
                        break
                epoch += 1
        except KeyboardInterrupt:
            ckpt.save(step, state, force=True)
            print("interrupted — checkpoint saved", flush=True)
        ckpt.wait()

    else:  # stage 2
        from mgldvsr_tpu.train.stage2 import Stage2Config, Stage2Trainer

        ds = REDSAutoencoderDataset(
            args.data_root, args.lq_root, args.latent_root,
            num_frame=args.num_frames,
        )
        trainer = Stage2Trainer(
            pipe.cfg.vae,
            Stage2Config(learning_rate=args.lr, grad_accum=args.grad_accum,
                         num_frames=args.num_frames),
        )
        state = trainer.init_state(jax.random.PRNGKey(args.seed),
                                   gt_size, gt_size)
        if args.resume and ckpt.latest_step() is not None:
            state = ckpt.restore(template=state)

        if mesh is not None:
            state = place_train_state(state, mesh, zero1=args.zero1)
        if mesh is not None and args.zero1:
            from mgldvsr_tpu.parallel.mesh import state_shardings
            # pin the updated state to its ZeRO-1 placement every step
            step_fn = jax.jit(trainer.train_step, donate_argnums=0,
                              out_shardings=(state_shardings(state), None))
        elif args.split_step:
            assert mesh is None, "--split-step is a single-chip fit lever"
            # three programs instead of one fused step: identical math;
            # the 512px fused compile crashes the remote helper (r04/r05)
            flows_fn = jax.jit(trainer.frozen_flows)
            gen_fn = jax.jit(trainer.gen_step)
            disc_fn = jax.jit(trainer.disc_step, donate_argnums=0)

            def step_fn(st, lq_, gt_, lat_, _rng):
                fl, oc = flows_fn(st, gt_)
                st, recon, mg = gen_fn(st, lq_, gt_, lat_, fl, oc)
                st, md = disc_fn(st, gt_, recon)
                return st, {**mg, **md}
        else:
            # donate: without aliasing, XLA holds input+output copies of the
            # full train state (2x ~GiB-scale on a 16 GB chip)
            step_fn = jax.jit(trainer.train_step, donate_argnums=0)
        install_signal_save(lambda: (int(state.step), state), ckpt)
        rng = jax.random.PRNGKey(args.seed)
        clips_per_step = (max(mesh.shape["data"] // proc_cnt, 1)
                          if mesh is not None else 1)
        # enlarge epochs (EnlargedSampler ratio) so every shard yields at
        # least one full multi-clip batch per epoch even on tiny datasets
        ratio = -(-clips_per_step * proc_cnt // max(len(ds), 1))
        sampler = ShardedSampler(len(ds), shard=proc_idx,
                                 num_shards=proc_cnt, ratio=ratio,
                                 seed=args.seed)
        if len(sampler.epoch(0)) < clips_per_step:  # would spin silently
            raise ValueError(
                f"dataset too small: epoch yields {len(sampler.epoch(0))} "
                f"clips on this shard but each step needs {clips_per_step}")
        step = int(state.step)
        try:
            epoch = 0
            while step < args.max_steps:
                for item in batched_items(
                        prefetch_iterator(ds, sampler.epoch(epoch)),
                        clips_per_step):
                    lq = upscale_frames(jnp.asarray(item["lqs"]), 4)
                    gt = jnp.asarray(item["gts"])
                    lat = jnp.asarray(item["lts"])
                    if mesh is not None:
                        lq, gt, lat = host_local_to_global((lq, gt, lat),
                                                           mesh)
                    rng, k = jax.random.split(rng)
                    state, metrics = step_fn(state, lq, gt, lat, k)
                    step = int(state.step)
                    if is_main:
                        metrics = {k_: v for k_, v in metrics.items()
                                   if np.ndim(v) == 0}
                        if step % args.log_every == 0:
                            _st = jax.local_devices()[0].memory_stats() or {}
                            metrics = dict(metrics, peak_hbm_gb=_st.get(
                                "peak_bytes_in_use", 0) / 2**30)
                        msg(step, metrics, lr=args.lr)
                    ckpt.save(step, state)
                    if step >= args.max_steps:
                        break
                epoch += 1
        except KeyboardInterrupt:
            ckpt.save(step, state, force=True)
        ckpt.wait()


if __name__ == "__main__":
    main()
