"""Dataset preparation: crop large GT frames into overlapping sub-images.

Counterpart of the reference's dataset-prep script
(/root/reference/scripts/extract_sub_images.py: walk a frame folder, slide a
crop window with a fixed step, keep remainder crops past a threshold, write
compressed PNGs, multiprocess over images) — used to build the REDS
sub-image training set for stage-1.

  python -m mgldvsr_tpu.cli.prepare_data --input REDS/train_sharp \
      --output REDS/train_sharp_sub [--crop-size 480] [--step 240] \
      [--thresh-size 48] [--workers 8] [--meta-info meta_info.txt]

Also writes an optional meta_info txt (one relative path per line) usable by
data.datasets meta-file loading.
"""
from __future__ import annotations

import argparse
import os
from concurrent.futures import ProcessPoolExecutor
from typing import List, Tuple


def _crop_positions(full: int, crop: int, step: int, thresh: int) -> List[int]:
    """Window starts covering ``full``: stride ``step``, plus a final
    flush-right window when the remainder exceeds ``thresh``."""
    if full <= crop:
        return [0]
    pos = list(range(0, full - crop + 1, step))
    if full - (pos[-1] + crop) > thresh:
        pos.append(full - crop)
    return pos


def extract_sub_images(
    img_path: str,
    out_dir: str,
    crop_size: int = 480,
    step: int = 240,
    thresh_size: int = 48,
    compression: int = 3,
) -> List[str]:
    """Crop one image into sub-images; returns the written relative names."""
    import cv2
    import numpy as np

    img = cv2.imread(img_path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(img_path)
    h, w = img.shape[:2]
    base = os.path.splitext(os.path.basename(img_path))[0]
    names = []
    idx = 0
    for y in _crop_positions(h, crop_size, step, thresh_size):
        for x in _crop_positions(w, crop_size, step, thresh_size):
            idx += 1
            sub = img[y : y + crop_size, x : x + crop_size]
            sub = np.ascontiguousarray(sub)
            name = f"{base}_s{idx:03d}.png"
            cv2.imwrite(
                os.path.join(out_dir, name), sub,
                [cv2.IMWRITE_PNG_COMPRESSION, compression],
            )
            names.append(name)
    return names


def _worker(job: Tuple[str, str, str, int, int, int, int]) -> List[str]:
    path, in_root, out_root, crop, step, thresh, comp = job
    # full relative clip path, not just the parent basename: nested layouts
    # (train/000 vs val/000) must not collide in the output tree
    rel_dir = os.path.relpath(os.path.dirname(path), in_root)
    out_dir = os.path.join(out_root, rel_dir)
    os.makedirs(out_dir, exist_ok=True)
    names = extract_sub_images(path, out_dir, crop, step, thresh, comp)
    return [os.path.join(rel_dir, n) for n in names]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="root of clip folders")
    ap.add_argument("--output", required=True)
    ap.add_argument("--crop-size", type=int, default=480)
    ap.add_argument("--step", type=int, default=240)
    ap.add_argument("--thresh-size", type=int, default=48)
    ap.add_argument("--compression", type=int, default=3)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--meta-info", help="write a meta_info txt here")
    args = ap.parse_args(argv)

    jobs = []
    for root, _, files in sorted(os.walk(args.input)):
        for f in sorted(files):
            if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp")):
                jobs.append((os.path.join(root, f), args.input, args.output,
                             args.crop_size, args.step, args.thresh_size,
                             args.compression))
    os.makedirs(args.output, exist_ok=True)
    all_names: List[str] = []
    if args.workers > 1:
        with ProcessPoolExecutor(max_workers=args.workers) as ex:
            for names in ex.map(_worker, jobs):
                all_names.extend(names)
    else:
        for job in jobs:
            all_names.extend(_worker(job))
    if args.meta_info:
        with open(args.meta_info, "w") as f:
            f.write("\n".join(sorted(all_names)) + "\n")
    print(f"wrote {len(all_names)} sub-images from {len(jobs)} frames")


if __name__ == "__main__":
    main()
