"""End-to-end proof of the quality-parity harness with random weights
(VERDICT r4 #8): restore synthetic clips through the real CLI, score them
with tools/quality_eval.py (PSNR/SSIM + LPIPS/E*warp/FID plumbing via
random-init towers + NIQE via freshly fitted pristine params), and score a
bicubic baseline the same way — so the first real-weights session only
swaps checkpoints into an already-proven harness.

  python tools/quality_smoke.py --workdir /tmp/qsmoke [--preset tiny]
      [--platform cpu]

Emits one JSON line: the harness outputs for both restorations plus sanity
verdicts (all metrics finite; bicubic beats a random-weight restore on
PSNR — if it didn't, the metric plumbing would be suspect).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/qsmoke")
    ap.add_argument("--preset", choices=["tiny", "full"], default="tiny")
    ap.add_argument("--platform", choices=["cpu", "tpu"], default=None)
    ap.add_argument("--clips", type=int, default=2)
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--gt-size", type=int, default=256)
    args = ap.parse_args()

    import cv2
    import numpy as np

    from soak_train import make_clip_frames

    wd = args.workdir
    gt_dir, lq_dir, bic_dir, ours_dir = (
        os.path.join(wd, d) for d in ("gt", "lq", "bicubic", "ours"))
    for ci in range(args.clips):
        clip = f"{ci:03d}"
        for d in (gt_dir, lq_dir, bic_dir):
            os.makedirs(os.path.join(d, clip), exist_ok=True)
        for t, img in enumerate(
                make_clip_frames(ci, args.frames, args.gt_size)):
            name = f"{t:08d}.png"
            cv2.imwrite(os.path.join(gt_dir, clip, name), img[..., ::-1])
            s4 = args.gt_size // 4
            lq = cv2.resize(img, (s4, s4), interpolation=cv2.INTER_CUBIC)
            cv2.imwrite(os.path.join(lq_dir, clip, name), lq[..., ::-1])
            bic = cv2.resize(lq, (args.gt_size, args.gt_size),
                             interpolation=cv2.INTER_CUBIC)
            cv2.imwrite(os.path.join(bic_dir, clip, name), bic[..., ::-1])

    # NIQE pristine params fitted from the synthetic GT corpus (the
    # reference ships its npz as a binary asset; ours is self-contained)
    niqe_npz = os.path.join(wd, "niqe_params.npz")
    if not os.path.exists(niqe_npz):
        if args.platform == "cpu":
            os.environ["JAX_PLATFORMS"] = "cpu"
        from mgldvsr_tpu.metrics.niqe import fit_niqe_params

        gray = []
        for clip in sorted(os.listdir(gt_dir)):
            for f in sorted(os.listdir(os.path.join(gt_dir, clip))):
                img = cv2.imread(os.path.join(gt_dir, clip, f))
                gray.append(cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
                            .astype(np.float64))
        fit_niqe_params(gray, out_path=niqe_npz)

    # restore through the real CLI (random weights — harness proof)
    infer_cmd = [sys.executable, "-m", "mgldvsr_tpu.cli.infer",
                 "--seqs-path", lq_dir, "--out-path", ours_dir,
                 "--mode", "fixed", "--preset", args.preset,
                 "--ddpm-steps", "4" if args.preset == "tiny" else "50",
                 "--size", str(args.gt_size)]
    env = dict(os.environ)
    if args.platform == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
        # cli.infer has no --platform flag; JAX_PLATFORMS may be overridden
        # by sitecustomize — tiny preset tolerates either device
    rc = subprocess.run(infer_cmd, cwd=REPO, env=env,
                        capture_output=True, text=True)
    if rc.returncode != 0:
        print(rc.stdout[-2000:], rc.stderr[-2000:], file=sys.stderr)
        raise SystemExit(f"cli.infer failed rc={rc.returncode}")

    def run_eval(restored, tag):
        cmd = [sys.executable, "tools/quality_eval.py",
               "--restored", restored, "--gt", gt_dir,
               "--lpips-ckpt", "random", "--raft-ckpt", "random",
               "--niqe-params", niqe_npz,
               "--fid-against", gt_dir, "--inception-ckpt", "random"]
        r = subprocess.run(cmd, cwd=REPO, env=env,
                           capture_output=True, text=True)
        if r.returncode != 0:
            print(r.stdout[-2000:], r.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"quality_eval({tag}) failed rc={r.returncode}")
        rows = [json.loads(line) for line in r.stdout.splitlines()
                if line.startswith("{")]
        return next(r_ for r_ in rows if r_["clip"] == "__mean__")

    ours = run_eval(ours_dir, "ours")
    bic = run_eval(bic_dir, "bicubic")

    keys = ("psnr", "ssim", "lpips", "niqe", "ewarp", "fid_vs_against")
    finite = all(
        np.isfinite(row[k]) for row in (ours, bic) for k in keys
        if k in row)
    summary = {
        "ours": {k: round(ours[k], 4) for k in keys if k in ours},
        "bicubic": {k: round(bic[k], 4) for k in keys if k in bic},
        "metrics_finite": bool(finite),
        "bicubic_beats_random_restore_psnr":
            bool(bic.get("psnr", 0) > ours.get("psnr", 0)),
        "ok": bool(finite),
    }
    with open(os.path.join(wd, "quality_smoke.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)
    raise SystemExit(0 if summary["ok"] else 1)


if __name__ == "__main__":
    main()


