"""Quality-parity harness: score restored clips against a ground truth
and/or a reference restoration.

This is the first thing to run when real checkpoints exist (BASELINE.md
north star): restore VideoLQ/REDS clips with `cli.infer`, restore the same
clips with the reference repo on GPU, then:

  python tools/quality_eval.py --restored OURS_DIR [--gt GT_DIR]
      [--other REF_DIR] [--lpips-ckpt vgg.pth] [--niqe-params niqe.npz]

Directory layout: <dir>/<clip>/<frame>.png (the reference scripts' output
layout). Emits one JSON line per clip and an aggregate line:
PSNR / SSIM (MATLAB-parity Y), LPIPS (when a converted vgg.pth is given),
NIQE (when pristine params are given), E*warp (temporal consistency, the
paper's protocol), and per-frame L1 against --other (code-parity check:
same weights + same seeds should agree to numerical tolerance).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_clip(d: str):
    import cv2
    import numpy as np

    frames = []
    for name in sorted(os.listdir(d)):
        if not name.lower().endswith((".png", ".jpg", ".jpeg")):
            continue
        img = cv2.imread(os.path.join(d, name), cv2.IMREAD_COLOR)
        frames.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
    return np.stack(frames).astype(np.float32)  # [T,H,W,3] in [0,255]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--restored", required=True)
    ap.add_argument("--gt", default=None)
    ap.add_argument("--other", default=None,
                    help="a second restoration (e.g. the reference repo's "
                         "output) for direct output-parity deltas")
    ap.add_argument("--lpips-ckpt", default=None)
    ap.add_argument("--niqe-params", default=None)
    ap.add_argument("--raft-ckpt", default=None,
                    help="flow weights for E*warp (random-init flows are "
                         "meaningless; omit to skip E*warp)")
    ap.add_argument("--crop-border", type=int, default=0)
    ap.add_argument("--fid-against", default=None,
                    help="second directory: report FID between the two "
                         "frame populations (InceptionV3 pool features)")
    ap.add_argument("--inception-ckpt", default=None,
                    help="pt_inception weights for FID; 'random' "
                         "exercises the path with random init")
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from mgldvsr_tpu.metrics.image import calculate_psnr, calculate_ssim

    lpips_fn = None
    if args.lpips_ckpt:
        from mgldvsr_tpu.models.lpips import LPIPS

        lp = LPIPS()
        if args.lpips_ckpt == "random":
            # harness-proof mode (no checkpoints in the environment):
            # random weights exercise the exact metric path; numbers are
            # meaningless until real weights are swapped in
            lp_params = lp.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 64, 64, 3)),
                                jnp.zeros((1, 64, 64, 3)))
        else:
            import torch

            from mgldvsr_tpu.io.ckpt_convert import convert_lpips

            sd = torch.load(args.lpips_ckpt, map_location="cpu")
            lp_params = convert_lpips(sd)

        def lpips_fn(a01, b01):  # [T,H,W,3] in [0,1]
            val = lp.apply(lp_params, jnp.asarray(a01 * 2 - 1),
                           jnp.asarray(b01 * 2 - 1))
            return float(jnp.mean(val))

    niqe_fn = None
    if args.niqe_params:
        from mgldvsr_tpu.metrics.niqe import calculate_niqe

        def niqe_fn(a255):
            return float(np.mean([
                calculate_niqe(f, params_path=args.niqe_params)
                for f in a255]))

    ewarp_fn = None
    if args.raft_ckpt:
        from mgldvsr_tpu.flow.raft import RAFT, RAFTConfig
        from mgldvsr_tpu.metrics.temporal import calculate_ewarp

        if args.raft_ckpt == "random":
            raft = RAFT(RAFTConfig(iters=4))
            rp = raft.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)),
                           jnp.zeros((1, 64, 64, 3)))
        else:
            import torch

            from mgldvsr_tpu.io.ckpt_convert import convert_raft

            raft = RAFT(RAFTConfig())
            rp = convert_raft(torch.load(args.raft_ckpt,
                                         map_location="cpu"))

        def ewarp_fn(a01):
            return float(calculate_ewarp(
                jnp.asarray(a01),
                lambda x, y: raft.apply(rp, x, y)))

    clips = sorted(
        d for d in os.listdir(args.restored)
        if os.path.isdir(os.path.join(args.restored, d)))
    agg: dict = {}
    for clip in clips:
        ours = _load_clip(os.path.join(args.restored, clip))
        row = {"clip": clip, "frames": int(ours.shape[0])}
        if args.gt:
            gt = _load_clip(os.path.join(args.gt, clip))
            row["psnr"] = float(np.mean([
                calculate_psnr(o, g, args.crop_border, test_y_channel=True)
                for o, g in zip(ours, gt)]))
            row["ssim"] = float(np.mean([
                calculate_ssim(o, g, args.crop_border, test_y_channel=True)
                for o, g in zip(ours, gt)]))
            if lpips_fn:
                row["lpips"] = lpips_fn(ours / 255.0, gt / 255.0)
        if niqe_fn:
            row["niqe"] = niqe_fn(ours)
        if ewarp_fn:
            row["ewarp"] = ewarp_fn(ours / 255.0)
        if args.other:
            other = _load_clip(os.path.join(args.other, clip))
            row["l1_vs_other"] = float(np.mean(np.abs(ours - other)))
            row["max_vs_other"] = float(np.max(np.abs(ours - other)))
        print(json.dumps(row))
        for k, v in row.items():
            if isinstance(v, float):
                agg.setdefault(k, []).append(v)
    final = {"clip": "__mean__",
             **{k: float(np.mean(v)) for k, v in agg.items()}}
    if args.fid_against:
        from mgldvsr_tpu.metrics.fid import (
            calculate_activation_statistics,
            calculate_fid,
            extract_features,
            load_patched_inception,
        )

        if args.inception_ckpt == "random":
            # harness-proof mode: random InceptionV3 exercises the exact
            # FID path; numbers are meaningless until real weights arrive
            from mgldvsr_tpu.metrics.inception import InceptionV3FID

            model = InceptionV3FID(resize_input=True,
                                   normalize_input=False)
            ip = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)))
            feat_fn = jax.jit(lambda x: model.apply(ip, x))
        else:
            feat_fn = load_patched_inception(args.inception_ckpt)

        def _pop(root):
            frames = []
            for clip in sorted(os.listdir(root)):
                d = os.path.join(root, clip)
                if os.path.isdir(d):
                    frames.append(_load_clip(d))
            x = np.concatenate(frames) / 255.0
            batches = [x[i : i + 8] for i in range(0, len(x), 8)]
            return extract_features(feat_fn, batches)

        mu1, s1 = calculate_activation_statistics(_pop(args.restored))
        mu2, s2 = calculate_activation_statistics(_pop(args.fid_against))
        final["fid_vs_against"] = float(calculate_fid(mu1, s1, mu2, s2))
    if agg or args.fid_against:
        print(json.dumps(final))


if __name__ == "__main__":
    main()
