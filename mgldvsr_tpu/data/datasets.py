"""Datasets: REDS-style recurrent training clips with on-the-fly
degradations, stage-2 quadruple clips, and folder-based inference videos.

Capability parity (structure studied, re-built for a host→TPU feed path):
- RealVSRRecurrentDataset
  (/root/reference/basicsr/data/realbasicvsr_dataset.py:24-242): meta-info
  clip list with REDS4/official val partitions, random interval window
  sampling, paired random crop + flip/rotation, GT USM, two degradation
  stages + final resize + sinc, clip/rescale; returns float [0,1] arrays.
- REDSAutoencoderDataset (basicsr/data/single_video_dataset.py:153-316):
  per-frame quadruples {lq png, gt png, diffusion sample png, latent .npy},
  windows aligned to multiples of num_frame.
- VideoTestDataset-style folder dataset (basicsr/data/video_test_dataset.py)
  for VideoLQ-layout inference inputs.
"""
from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional, Sequence

import cv2
import numpy as np

from mgldvsr_tpu.data.degradations import Clip, DegradationStage, UnsharpMasking

REDS4_CLIPS = ("000", "011", "015", "020")


def _imread(path: str) -> np.ndarray:
    """cv2 load: float32 [0,1], cv2-native **BGR** order (the degradation
    chain runs in BGR exactly like the reference's pre-img2tensor stage;
    datasets flip to RGB at their return boundary — see _bgr2rgb)."""
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return img.astype(np.float32) / 255.0


def _bgr2rgb(clip: np.ndarray) -> np.ndarray:
    """BGR->RGB at the dataset return boundary — the counterpart of the
    reference's img2tensor(bgr2rgb=True) (realbasicvsr_dataset.py:236,
    single_video_dataset.py:302-304): degradations see BGR, the model
    sees RGB."""
    return np.ascontiguousarray(clip[..., ::-1])


def paired_random_crop(gts: List[np.ndarray], size: int,
                       rng: np.random.RandomState) -> List[np.ndarray]:
    h, w = gts[0].shape[:2]
    if h < size or w < size:
        raise ValueError(f"clip {h}x{w} smaller than crop {size}")
    top = rng.randint(0, h - size + 1)
    left = rng.randint(0, w - size + 1)
    return [g[top : top + size, left : left + size] for g in gts]


def augment(frames: List[np.ndarray], hflip: bool, rot: bool,
            rng: np.random.RandomState) -> List[np.ndarray]:
    do_h = hflip and rng.uniform() < 0.5
    do_v = rot and rng.uniform() < 0.5
    do_t = rot and rng.uniform() < 0.5
    out = []
    for f in frames:
        if do_h:
            f = f[:, ::-1]
        if do_v:
            f = f[::-1]
        if do_t:
            f = f.transpose(1, 0, 2)
        out.append(np.ascontiguousarray(f))
    return out


class RealVSRRecurrentDataset:
    """Stage-1 training clips: GT windows degraded on the fly."""

    def __init__(
        self,
        dataroot_gt: str,
        meta_info_file: Optional[str] = None,
        num_frame: int = 5,
        gt_size: int = 512,
        interval_list: Sequence[int] = (1,),
        use_hflip: bool = True,
        use_rot: bool = False,
        val_partition: str = "REDS4",
        test_mode: bool = False,
        degradation_1: Optional[Dict] = None,
        degradation_2: Optional[Dict] = None,
        usm_gt: bool = True,
        seed: int = 0,
        packed_root: Optional[str] = None,
        io_threads: int = 4,
    ):
        self.root = dataroot_gt
        # packed-record read path: record keys are f"{clip}/{frame:08d}.png"
        # (pack_image_dir layout); decode+crop+flip runs in the native C++
        # worker pool when available, else PackedBackend + cv2
        self.packed = None
        self.packed_py = None
        if packed_root is not None:
            from mgldvsr_tpu.native import native_available

            if native_available():
                from mgldvsr_tpu.native.loader import NativeClipLoader

                self.packed = NativeClipLoader(packed_root,
                                               num_threads=io_threads)
            else:  # pragma: no cover - exercised only without a toolchain
                from mgldvsr_tpu.data.file_client import PackedBackend

                self.packed_py = PackedBackend(packed_root)
        self.num_frame = num_frame
        self.gt_size = gt_size
        self.interval_list = list(interval_list)
        self.use_hflip = use_hflip
        self.use_rot = use_rot
        self.seed = seed

        if meta_info_file:
            with open(meta_info_file) as f:
                entries = [line.split(" ") for line in f.read().splitlines() if line]
            clips = [(e[0], int(e[1])) for e in entries]
        else:
            clips = []
            for d in sorted(os.listdir(dataroot_gt)):
                full = os.path.join(dataroot_gt, d)
                if os.path.isdir(full):
                    clips.append((d, len(glob.glob(os.path.join(full, "*.png")))))

        if val_partition == "REDS4":
            val = set(REDS4_CLIPS)
        elif val_partition == "official":
            val = {f"{i:03d}" for i in range(240, 270)}
        else:
            val = set()
        if test_mode:
            clips = [c for c in clips if c[0] in val]
        else:
            clips = [c for c in clips if c[0] not in val]
        self.clips = clips

        self.stage1 = DegradationStage(degradation_1) if degradation_1 else None
        self.stage2 = DegradationStage(degradation_2) if degradation_2 else None
        self.usm = UnsharpMasking(keys=("gts",)) if usm_gt else None
        self.clipper = Clip(keys=("lqs",))

    def __len__(self) -> int:
        return len(self.clips)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        rng = np.random.RandomState(
            (self.seed * 1_000_003 + index) % (2**31)
        )
        clip, n_frames = self.clips[index % len(self.clips)]
        interval = int(rng.choice(self.interval_list))
        span = (self.num_frame - 1) * interval
        start = rng.randint(0, max(n_frames - span, 1))
        idxs = [start + i * interval for i in range(self.num_frame)]
        if self.packed is not None:
            # same RNG draw order as the disk path (crop top/left inside
            # paired_random_crop, then the three augment coins) so a given
            # (seed, index) yields the same sample regardless of backend
            keys = [f"{clip}/{i:08d}.png" for i in idxs]
            h, w = self.packed.probe(keys[0])
            size = self.gt_size
            if h < size or w < size:
                raise ValueError(f"clip {h}x{w} smaller than crop {size}")
            top = rng.randint(0, h - size + 1)
            left = rng.randint(0, w - size + 1)
            do_h = self.use_hflip and rng.uniform() < 0.5
            do_v = self.use_rot and rng.uniform() < 0.5
            do_t = self.use_rot and rng.uniform() < 0.5
            gts = list(self.packed.load_clip(
                keys, top, left, size, size,
                hflip=do_h, vflip=do_v, transpose=do_t))
        elif self.packed_py is not None:
            # python fallback: same helpers as the disk path (identical
            # RNG consumption), bytes from the packed backend
            from mgldvsr_tpu.data.file_client import imfrombytes

            keys = [f"{clip}/{i:08d}.png" for i in idxs]
            gts = [imfrombytes(self.packed_py.get(k), float32=True)
                   for k in keys]
            gts = paired_random_crop(gts, self.gt_size, rng)
            gts = augment(gts, self.use_hflip, self.use_rot, rng)
        else:
            gts = [
                _imread(os.path.join(self.root, clip, f"{i:08d}.png"))
                for i in idxs
            ]
            gts = paired_random_crop(gts, self.gt_size, rng)
            gts = augment(gts, self.use_hflip, self.use_rot, rng)

        results = {"gts": gts, "lqs": [g.copy() for g in gts]}
        if self.usm is not None:
            results = self.usm(results)
        if self.stage1 is not None:
            results = self.stage1(results, rng)
        if self.stage2 is not None:
            results = self.stage2(results, rng)
        results = self.clipper(results)
        return {
            "lqs": _bgr2rgb(np.stack(results["lqs"]).astype(np.float32)),
            "gts": _bgr2rgb(np.stack(results["gts"]).astype(np.float32)),
            "clip": clip,
            "indices": np.asarray(idxs, np.int32),
        }


class REDSAutoencoderDataset:
    """Stage-2 quadruples: LQ / GT / diffusion-sample pngs + latent .npy,
    in windows aligned to multiples of num_frame."""

    def __init__(
        self,
        dataroot_gt: str,
        dataroot_lq: str,
        dataroot_latent: str,
        dataroot_sample: Optional[str] = None,
        num_frame: int = 5,
        load_fix_indices_only: bool = True,
    ):
        self.roots = dict(gt=dataroot_gt, lq=dataroot_lq,
                          latent=dataroot_latent, sample=dataroot_sample)
        self.num_frame = num_frame
        self.windows = []
        for clip in sorted(os.listdir(dataroot_gt)):
            frames = sorted(
                glob.glob(os.path.join(dataroot_gt, clip, "*.png"))
            )
            n = len(frames)
            step = num_frame if load_fix_indices_only else 1
            for s in range(0, n - num_frame + 1, step):
                self.windows.append(
                    (clip, [os.path.basename(f) for f in frames[s : s + num_frame]])
                )

    def __len__(self) -> int:
        return len(self.windows)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        clip, names = self.windows[index]
        gts = [_imread(os.path.join(self.roots["gt"], clip, n)) for n in names]
        lqs = [_imread(os.path.join(self.roots["lq"], clip, n)) for n in names]
        lts = [
            np.load(os.path.join(self.roots["latent"], clip,
                                 os.path.splitext(n)[0] + ".npy"))
            for n in names
        ]
        out = {
            "gts": _bgr2rgb(np.stack(gts).astype(np.float32)),
            "lqs": _bgr2rgb(np.stack(lqs).astype(np.float32)),
            "lts": np.stack(lts).astype(np.float32),
            "clip": clip,
        }
        if self.roots["sample"]:
            out["sps"] = _bgr2rgb(np.stack(
                [_imread(os.path.join(self.roots["sample"], clip, n)) for n in names]
            ).astype(np.float32))
        return out


class VideoFolderDataset:
    """VideoLQ-style folder of clips, each a folder of frames — the
    inference input layout (scripts iterate seq dirs)."""

    def __init__(self, root: str, num_frame: int = 5,
                 pad_last: bool = True):
        self.root = root
        self.num_frame = num_frame
        self.pad_last = pad_last
        self.clips = [
            d for d in sorted(os.listdir(root))
            if os.path.isdir(os.path.join(root, d))
        ]

    def __len__(self) -> int:
        return len(self.clips)

    def segments(self, index: int):
        """Yield (names, frames [t,h,w,3] float[0,1]) per num_frame window,
        final window padded by repeating the last frame (tile.py:345-346)."""
        clip = self.clips[index]
        paths = sorted(glob.glob(os.path.join(self.root, clip, "*")))
        paths = [p for p in paths if p.lower().endswith((".png", ".jpg", ".jpeg"))]
        for s in range(0, len(paths), self.num_frame):
            chunk = paths[s : s + self.num_frame]
            names = [os.path.basename(p) for p in chunk]
            while self.pad_last and len(chunk) < self.num_frame:
                chunk.append(chunk[-1])
            # RGB like the reference's inference loader (old.py:107-108
            # PIL .convert("RGB")); cli/infer.py writes out[..., ::-1]
            frames = _bgr2rgb(np.stack([_imread(p) for p in chunk]))
            yield clip, names, frames


# ---------------------------------------------------------------------------
# loader: shard-aware sampling + background prefetch
# ---------------------------------------------------------------------------


class ShardedSampler:
    """EnlargedSampler counterpart (basicsr/data/data_sampler.py:6-48):
    epoch-enlarged, per-host-shard index stream."""

    def __init__(self, num_samples: int, shard: int = 0, num_shards: int = 1,
                 ratio: int = 1, seed: int = 0):
        self.num_samples = num_samples
        self.shard = shard
        self.num_shards = num_shards
        self.total = num_samples * ratio
        self.seed = seed

    def epoch(self, epoch: int):
        rng = np.random.RandomState(self.seed + epoch)
        order = rng.permutation(self.total) % self.num_samples
        return order[self.shard :: self.num_shards]


def prefetch_iterator(dataset, indices, num_workers: int = 4, queue_size: int = 8):
    """Thread-pool prefetch: keeps the host degradation pipeline ahead of
    device compute (CPUPrefetcher counterpart)."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=num_workers) as ex:
        futures = []
        it = iter(indices)
        for _ in range(queue_size):
            try:
                futures.append(ex.submit(dataset.__getitem__, next(it)))
            except StopIteration:
                break
        while futures:
            f = futures.pop(0)
            try:
                futures.append(ex.submit(dataset.__getitem__, next(it)))
            except StopIteration:
                pass
            yield f.result()
