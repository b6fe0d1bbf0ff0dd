"""Sustained-training soak with a mid-run SIGUSR1 checkpoint + kill +
auto-resume cycle — the evidence VERDICT r4 #2 asked for.

The reference's defining workload is an 800k-step Lightning finetune
(/root/reference/main.py:717-745; schedule
configs/mgldvsr/mgldvsr_512_realbasicvsr_deg.yaml). Microbench steps/s says
nothing about whether the loop SURVIVES: loss actually decreasing over
hundreds of steps, steps/s stable (no HBM creep / retrace), the input
pipeline feeding ahead of the chip, and the SIGUSR1-checkpoint + resume
cycle working ON DEVICE mid-run. This driver runs all of it end-to-end
through the real CLI (`mgldvsr_tpu.cli.train`) exactly as a user would:

  1. synthesize a tiny overfit dataset (structured clips, deterministic)
  2. launch the CLI as a subprocess; poll its metrics.jsonl
  3. at --sig-frac of the run: SIGUSR1 (forced checkpoint), then SIGKILL
     -- an unclean death, not a polite shutdown
  4. relaunch with --resume; verify the step counter continues from the
     checkpoint and the loss trajectory is continuous
  5. write workdir/soak_summary.json: loss slope, steps/s stability,
     peak/steady HBM, resume assertion

Usage (serialized TPU queue; stage 2 is the shorter variant):
  python tools/soak_train.py --stage 1 --steps 2000 --workdir /tmp/soak1
  python tools/soak_train.py --stage 2 --steps 600 --workdir /tmp/soak2
"""
from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_clip_frames(clip_idx: int, n_frames: int, size: int):
    """Deterministic structured frames: smooth gradients + moving discs.
    Random noise is unfittable; an overfit-tiny soak needs signal."""
    import numpy as np

    rng = np.random.default_rng(100 + clip_idx)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    base = np.stack([
        0.5 + 0.4 * np.sin(2 * np.pi * (xx * rng.uniform(1, 3) + rng.random())),
        0.5 + 0.4 * np.sin(2 * np.pi * (yy * rng.uniform(1, 3) + rng.random())),
        0.5 + 0.4 * np.sin(2 * np.pi * ((xx + yy) * rng.uniform(1, 2))),
    ], axis=-1)
    discs = [(rng.uniform(0.2, 0.8, 2), rng.uniform(0.05, 0.15),
              rng.uniform(0, 1, 3), rng.uniform(-0.02, 0.02, 2))
             for _ in range(4)]
    frames = []
    for t in range(n_frames):
        img = base.copy()
        for (c0, r, col, v) in discs:
            c = c0 + v * t
            m = ((xx - c[1]) ** 2 + (yy - c[0]) ** 2) < r ** 2
            img[m] = col
        frames.append((np.clip(img, 0, 1) * 255).astype(np.uint8))
    return frames


def make_stage1_data(root: str, n_clips: int, n_frames: int, size: int):
    import cv2

    for ci in range(n_clips):
        # clip ids start at 100: RealVSRRecurrentDataset drops the REDS4
        # val partition ("000","011","015","020") from training
        d = os.path.join(root, f"{100 + ci:03d}")
        os.makedirs(d, exist_ok=True)
        for t, img in enumerate(make_clip_frames(ci, n_frames, size)):
            cv2.imwrite(os.path.join(d, f"{t:08d}.png"), img[..., ::-1])


def make_stage2_data(gt_root: str, lq_root: str, lat_root: str,
                     n_clips: int, n_frames: int, size: int):
    import cv2
    import numpy as np

    rng = np.random.default_rng(7)
    for ci in range(n_clips):
        for r in (gt_root, lq_root, lat_root):
            os.makedirs(os.path.join(r, f"{ci:03d}"), exist_ok=True)
        for t, img in enumerate(make_clip_frames(ci, n_frames, size)):
            name = f"{t:08d}"
            cv2.imwrite(os.path.join(gt_root, f"{ci:03d}", name + ".png"),
                        img[..., ::-1])
            lq = cv2.resize(img, (size // 4, size // 4),
                            interpolation=cv2.INTER_CUBIC)
            cv2.imwrite(os.path.join(lq_root, f"{ci:03d}", name + ".png"),
                        lq[..., ::-1])
            np.save(os.path.join(lat_root, f"{ci:03d}", name + ".npy"),
                    rng.normal(size=(size // 8, size // 8, 4)
                               ).astype(np.float32))


def read_metrics(path: str):
    rows = []
    if not os.path.exists(path):
        return rows
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                pass  # partial last line during a live poll
    return rows


def launch(args, logdir, resume: bool, tag: str):
    cmd = [sys.executable, "-m", "mgldvsr_tpu.cli.train",
           "--stage", str(args.stage),
           "--logdir", logdir,
           "--max-steps", str(args.steps),
           "--grad-accum", "1",
           "--gt-size", str(args.size),
           "--ckpt-every", str(args.ckpt_every),
           "--log-every", str(args.log_every),
           "--seed", "23", "--no-tb"]
    if args.stage == 1:
        cmd += ["--data-root", os.path.join(args.workdir, "gt"),
                "--frozen-dtype", "bfloat16"]
        if args.packed:
            cmd += ["--set", "data.packed_root="
                    + os.path.join(args.workdir, "packed")]
        if not args.tiny:
            # the shipped 512px single-chip config: per-block remat in the
            # UNet towers (measured REQUIRED at 512px on 16 GB, r03)
            cmd += ["--config",
                    os.path.join(REPO, "configs",
                                 "mgldvsr_512_realbasicvsr_deg.yaml"),
                    "--set", "model.unet.use_checkpoint=true",
                    "--set", "model.structcond.use_checkpoint=true",
                    "--set", "train.grad_accum=1",
                    "--set", f"train.max_steps={args.steps}",
                    "--set", f"train.ckpt_every={args.ckpt_every}",
                    "--set", f"train.log_every={args.log_every}"]
    else:
        cmd += ["--data-root", os.path.join(args.workdir, "gt"),
                "--lq-root", os.path.join(args.workdir, "lq"),
                "--latent-root", os.path.join(args.workdir, "lat")]
        if not args.tiny:
            # the only compiling 512px stage-2 config (r05 measured):
            # split-step + per-block remat with the 64px-res blocks saved
            # (mr128: 0.5221 steps/s vs 0.4582 full remat; fused and
            # mr256 both crash the remote compile helper)
            cmd += ["--set", "model.vae.use_checkpoint=true",
                    "--set", "model.vae.remat_min_res=128",
                    "--set", "model.vae.dtype=bfloat16",
                    "--split-step"]
    if args.tiny:
        # env-var pinning does NOT survive the axon sitecustomize; the CLI
        # flag pins in-process (NOTES.md operational lessons)
        cmd += ["--tiny", "--platform", "cpu"]
    if resume:
        cmd += ["--resume"]
    out = open(os.path.join(args.workdir, f"train_{tag}.log"), "ab")
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.expanduser("~/.cache/mgld_tpu_cache"))
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    if args.tiny:
        env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.Popen(cmd, cwd=REPO, stdout=out, stderr=out, env=env)
    return proc


def wait_for_step(proc, metrics_path, target_step, timeout_s, label):
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        rows = read_metrics(metrics_path)
        if rows and rows[-1]["step"] >= target_step:
            return rows
        if proc.poll() is not None:
            rows = read_metrics(metrics_path)
            if rows and rows[-1]["step"] >= target_step:
                return rows
            raise RuntimeError(
                f"{label}: trainer exited rc={proc.returncode} at step "
                f"{rows[-1]['step'] if rows else 0} before {target_step}")
        time.sleep(1)
    raise TimeoutError(f"{label}: step {target_step} not reached in "
                       f"{timeout_s}s (last: "
                       f"{read_metrics(metrics_path)[-1:]})")


def latest_ckpt_step(ckpt_dir: str):
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(d) for d in os.listdir(ckpt_dir) if d.isdigit()]
    return max(steps) if steps else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, choices=[1, 2], default=1)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--workdir", default="/tmp/soak1")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--clips", type=int, default=4)
    ap.add_argument("--frames-per-clip", type=int, default=10)
    ap.add_argument("--sig-frac", type=float, default=0.4,
                    help="fraction of the run at which SIGUSR1+SIGKILL fire")
    ap.add_argument("--ckpt-every", type=int, default=10 ** 9,
                    help="periodic checkpoint interval (default: effectively "
                         "off, so the mid-run checkpoint provably comes from "
                         "the SIGUSR1 handler, not the cadence)")
    ap.add_argument("--log-every", type=int, default=25)
    ap.add_argument("--compile-timeout", type=int, default=4800,
                    help="seconds allowed for first metrics row (cold "
                         "512px compile through the remote helper)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model + CPU (CI smoke of this driver itself)")
    ap.add_argument("--throughput-only", action="store_true",
                    help="no signal/kill/resume: run phase 1 to --steps "
                         "and report steps/s only (input-pipeline A/B "
                         "mode)")
    ap.add_argument("--packed", action="store_true",
                    help="stage 1: pack the synthetic gt tree once "
                         "(native/loader.pack_image_dir) and feed the "
                         "trainer through the native C++ clip loader "
                         "(--set data.packed_root=...)")
    ap.add_argument("--phase2-only", action="store_true",
                    help="skip phase 1: resume from the existing workdir "
                         "checkpoint and run to --steps (recovery mode for "
                         "a phase-2 killed by an outer queue timeout; the "
                         "SIGUSR1 checkpoint from the original phase 1 is "
                         "reused)")
    args = ap.parse_args()
    if args.tiny:
        args.size = 32
    os.makedirs(args.workdir, exist_ok=True)

    if args.stage == 1:
        if not os.path.isdir(os.path.join(args.workdir, "gt")):
            make_stage1_data(os.path.join(args.workdir, "gt"), args.clips,
                             args.frames_per_clip, args.size)
        if args.packed and not os.path.isdir(
                os.path.join(args.workdir, "packed")):
            from mgldvsr_tpu.native.loader import pack_image_dir

            n = pack_image_dir(os.path.join(args.workdir, "gt"),
                               os.path.join(args.workdir, "packed"))
            print(f"packed {n} frames", flush=True)
    else:
        if not os.path.isdir(os.path.join(args.workdir, "gt")):
            make_stage2_data(os.path.join(args.workdir, "gt"),
                             os.path.join(args.workdir, "lq"),
                             os.path.join(args.workdir, "lat"),
                             args.clips, args.frames_per_clip, args.size)

    logdir = os.path.join(args.workdir, "run")
    metrics_path = os.path.join(logdir, "metrics.jsonl")
    ckpt_dir = os.path.join(logdir, "ckpt")
    sig_step = max(2, int(args.steps * args.sig_frac))

    if args.throughput_only:
        proc = launch(args, logdir, resume=False, tag="tp")
        try:
            rows = wait_for_step(proc, metrics_path, args.steps,
                                 args.compile_timeout
                                 + args.steps * 30, "throughput")
            proc.wait(timeout=600)
        finally:
            if proc.poll() is None:
                proc.kill()
                proc.wait()
        ts = [(r["step"], r["time"]) for r in rows]
        rates = sorted((s1 - s0) / (t1 - t0)
                       for (s0, t0), (s1, t1) in zip(ts, ts[1:])
                       if t1 > t0 and s1 > s0)
        # skip the warmup quarter for the steady rate
        steady = rates and sorted(
            (s1 - s0) / (t1 - t0)
            for (s0, t0), (s1, t1) in zip(ts[len(ts) // 4:],
                                          ts[len(ts) // 4 + 1:])
            if t1 > t0 and s1 > s0) or [0.0]
        summary = {
            "mode": "throughput_only", "stage": args.stage,
            "steps": args.steps, "gt_size": args.size,
            "packed": bool(args.packed),
            "steps_per_sec_median": round(steady[len(steady) // 2], 4),
            "steps_per_sec_p10": round(steady[len(steady) // 10], 4),
            "steps_per_sec_p90": round(steady[(len(steady) * 9) // 10], 4),
            "ok": True,
        }
        with open(os.path.join(args.workdir, "soak_summary.json"),
                  "w") as f:
            json.dump(summary, f, indent=1)
        print(json.dumps(summary), flush=True)
        return

    if args.phase2_only:
        ck = latest_ckpt_step(ckpt_dir)
        if ck is None:
            raise SystemExit("--phase2-only: no checkpoint in workdir")
        rows1 = read_metrics(metrics_path)
        last_before = rows1[-1]["step"]
        print(f"phase2-only: resuming from checkpoint {ck} "
              f"(metrics last step {last_before})", flush=True)
    else:
        rows1 = None

    # ---- phase 1: run to sig_step, SIGUSR1, wait for ckpt, SIGKILL -------
    if not args.phase2_only:
        proc = launch(args, logdir, resume=False, tag="a")
        try:
            wait_for_step(proc, metrics_path, 1, args.compile_timeout,
                          "compile")
            wait_for_step(proc, metrics_path, sig_step,
                          args.compile_timeout, "phase1")
            proc.send_signal(signal.SIGUSR1)
            print(f"SIGUSR1 sent at >= step {sig_step}", flush=True)
            t0 = time.time()
            ck = None
            while time.time() - t0 < 600:
                ck = latest_ckpt_step(ckpt_dir)
                if ck is not None and ck >= sig_step:
                    break
                if proc.poll() is not None:
                    raise RuntimeError("trainer died after SIGUSR1")
                time.sleep(3)
            if ck is None:
                raise TimeoutError("no checkpoint appeared after SIGUSR1")
            # give orbax a moment to finalize, then UNCLEAN kill
            time.sleep(10)
            ck = latest_ckpt_step(ckpt_dir)
        finally:
            if proc.poll() is None:
                proc.kill()
                proc.wait()
        rows1 = read_metrics(metrics_path)
        last_before = rows1[-1]["step"]
        print(f"phase1 killed at step {last_before}; checkpoint at {ck}",
              flush=True)

    # ---- phase 2: resume, run to completion ------------------------------
    n_rows1 = len(rows1)
    proc = launch(args, logdir, resume=True, tag="b")
    try:
        rows = wait_for_step(proc, metrics_path, args.steps,
                             args.compile_timeout
                             + int((args.steps - ck) * 30), "phase2")
        proc.wait(timeout=600)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()

    # ---- analysis --------------------------------------------------------
    if len(rows) <= n_rows1:
        raise RuntimeError(
            "phase 2 appended no metric rows — phase 1 already hit "
            "max_steps before the SIGUSR1 fired (raise --steps or lower "
            "--sig-frac so the kill lands mid-run)")
    resumed_first = rows[n_rows1]["step"]
    resume_ok = resumed_first == ck + 1
    # Judge convergence on a loss that SHOULD decrease on an overfit set:
    # stage-1 "loss" (eps-MSE), stage-2 "rec_loss" (L1+LPIPS recon) — NOT
    # the adversarial g_loss/loss_g, which a healthy GAN does not shrink.
    loss_key = None
    for cand in ("loss", "rec_loss", "nll_loss"):
        if any(cand in r for r in rows):
            loss_key = cand
            break
    if loss_key is None:  # fall back to the first *loss* metric present
        cands = [k for k in rows[-1] if "loss" in k]
        loss_key = cands[0] if cands else None
    losses = [(r["step"], r[loss_key]) for r in rows if loss_key in r]
    k = max(10, len(losses) // 10)
    head = sum(v for _, v in losses[:k]) / k
    tail = sum(v for _, v in losses[-k:]) / k
    # steps/s stability: consecutive "time" deltas within each launch
    def seg_rates(seg_rows):
        ts = [(r["step"], r["time"]) for r in seg_rows]
        rates = []
        for (s0, t0), (s1, t1) in zip(ts, ts[1:]):
            if t1 > t0 and s1 > s0:
                rates.append((s1 - s0) / (t1 - t0))
        return rates
    rates = seg_rates(rows1[max(1, n_rows1 // 4):]) + \
        seg_rates(rows[n_rows1 + 1:])
    rates_sorted = sorted(rates)
    med = rates_sorted[len(rates_sorted) // 2] if rates_sorted else 0.0
    hbm = [r.get("peak_hbm_gb") for r in rows if r.get("peak_hbm_gb")]
    # loss continuity across the resume seam: the first resumed window must
    # be in-family with the pre-kill window (10x the pre-kill spread bound)
    pre = [v for _, v in losses if _ <= last_before][-k:]
    post = [v for s, v in losses if s > last_before][:k]
    pre_m = sum(pre) / len(pre)
    spread = max(1e-6, max(pre) - min(pre))
    post_m = sum(post) / len(post)
    seam_ok = abs(post_m - pre_m) < 10 * spread

    summary = {
        "stage": args.stage, "steps": args.steps, "gt_size": args.size,
        "sig_step_target": sig_step, "ckpt_step": ck,
        "killed_at_step": last_before,
        "resumed_first_step": resumed_first, "resume_exact": resume_ok,
        "loss_key": loss_key,
        "loss_head_mean": round(head, 5), "loss_tail_mean": round(tail, 5),
        "loss_decreased": tail < head,
        "seam_pre_mean": round(pre_m, 5), "seam_post_mean": round(post_m, 5),
        "seam_ok": seam_ok,
        "steps_per_sec_median": round(med, 4),
        "steps_per_sec_p10": round(
            rates_sorted[len(rates_sorted) // 10], 4) if rates_sorted else 0,
        "steps_per_sec_p90": round(
            rates_sorted[(len(rates_sorted) * 9) // 10], 4
        ) if rates_sorted else 0,
        "peak_hbm_first_gb": round(hbm[0], 3) if hbm else None,
        "peak_hbm_last_gb": round(hbm[-1], 3) if hbm else None,
        "n_metric_rows": len(rows),
        "ok": bool(resume_ok and seam_ok and tail < head),
    }
    with open(os.path.join(args.workdir, "soak_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)
    sys.exit(0 if summary["ok"] else 1)


if __name__ == "__main__":
    main()
