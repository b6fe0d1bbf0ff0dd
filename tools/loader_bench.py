"""Host data-path throughput: native C++ clip loader vs the Python
disk/cv2 path.

Synthesizes a small REDS-like tree, packs it, then measures clips/sec for
(a) disk + cv2.imread + numpy crop, (b) packed + native decode/crop pool.
The native pool also overlaps with a busy main thread (simulating device
feeding), which is where the GIL-free path pays off.

Usage: python tools/loader_bench.py [--frames 5] [--size 128] [--iters 40]
"""
from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--size", type=int, default=128, help="crop size")
    ap.add_argument("--src-size", type=int, default=360)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--threads", type=int, default=4)
    args = ap.parse_args()

    import cv2

    from mgldvsr_tpu.native import native_available

    if not native_available():
        print("native loader unavailable (toolchain missing)")
        return

    from mgldvsr_tpu.native.loader import NativeClipLoader, pack_image_dir

    d = tempfile.mkdtemp(prefix="loaderbench_")
    rng = np.random.RandomState(0)
    n_frames_total = 30
    clipdir = os.path.join(d, "gt", "000")
    os.makedirs(clipdir)
    for i in range(n_frames_total):
        img = rng.randint(0, 256, (args.src_size, args.src_size, 3), np.uint8)
        cv2.imwrite(os.path.join(clipdir, f"{i:08d}.png"), img)
    pack_image_dir(os.path.join(d, "gt"), os.path.join(d, "pk"))

    keysets = []
    crops = []
    for it in range(args.iters):
        s = it % (n_frames_total - args.frames)
        keysets.append([f"000/{s + j:08d}.png" for j in range(args.frames)])
        crops.append((it % 16, it % 13))

    # (a) python disk path
    t0 = time.perf_counter()
    for keys, (top, left) in zip(keysets, crops):
        frames = [
            cv2.imread(os.path.join(d, "gt", k)).astype(np.float32) / 255.0
            for k in keys
        ]
        _ = np.stack([f[top : top + args.size, left : left + args.size]
                      for f in frames])
    t_py = time.perf_counter() - t0

    # (b) native packed path, pipelined submits
    L = NativeClipLoader(os.path.join(d, "pk"), num_threads=args.threads)
    t0 = time.perf_counter()
    tickets = [
        L.submit_clip(keys, top, left, args.size, args.size)
        for keys, (top, left) in zip(keysets, crops)
    ]
    for t in tickets:
        L.fetch(t)
    t_nat = time.perf_counter() - t0

    # (c) native while the main thread is busy (device-feed simulation)
    t0 = time.perf_counter()
    tickets = [
        L.submit_clip(keys, top, left, args.size, args.size)
        for keys, (top, left) in zip(keysets, crops)
    ]
    busy = 0.0
    spin_until = time.perf_counter() + t_nat * 0.8
    x = np.ones((256, 256), np.float32)
    while time.perf_counter() < spin_until:
        busy += float(x.sum())  # GIL-holding main-thread work
    for t in tickets:
        L.fetch(t)
    t_overlap = time.perf_counter() - t0
    L.close()

    cps = args.iters
    print(f"python disk+cv2   : {cps / t_py:7.1f} clips/s  ({t_py:.3f}s)")
    print(f"native packed pool: {cps / t_nat:7.1f} clips/s  ({t_nat:.3f}s)"
          f"  speedup {t_py / t_nat:.2f}x")
    print(f"native w/ busy main thread: {cps / t_overlap:7.1f} clips/s "
          f"(decode hidden behind {t_nat * 0.8:.3f}s of main-thread work)")


if __name__ == "__main__":
    main()
