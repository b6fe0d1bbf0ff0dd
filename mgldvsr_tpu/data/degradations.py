"""RealBasicVSR-style on-the-fly degradation transforms (host data path).

Capability parity with the mmcv-style transforms driving stage-1 training
(/root/reference/basicsr/data/mmcv_transforms/random_degradations.py:18-606
and aug_pix.py / normalization.py): per-clip random degradation parameters
with *temporally correlated* random-walk stepping across frames
(``*_step``), two full stages of blur → resize → noise → jpeg → video
compression, final resize + sinc, USM sharpening of the GT, clip and
rescale.

These run in numpy/cv2 on the host feed path — exactly where the reference
runs them (DataLoader workers); the TPU never sees codec emulation.
Video compression is PyAV-first (exact reference codec/bitrate semantics
when the dependency exists) with a cv2.VideoWriter fallback, degrading to
identity when no codec is available.

Convention: clips are lists of float32 HWC arrays in [0, 1], in cv2's
**BGR** channel order (matching the reference pipeline layout before
img2tensor(bgr2rgb=True)/RescaleToZeroOne; datasets flip to RGB at their
return boundary, exactly where the reference does).
"""
from __future__ import annotations

import io
import logging
import os
import tempfile
from typing import Dict, List, Optional, Sequence

import cv2
import numpy as np

from mgldvsr_tpu.data.blur_kernels import circular_lowpass_kernel, make_kernel

logger = logging.getLogger(__name__)


def _walk(rng: np.random.RandomState, value: float, step: float, lo: float,
          hi: float) -> float:
    """Random-walk a parameter within [lo, hi] (temporal correlation)."""
    if step == 0:
        return value
    return float(np.clip(value + rng.uniform(-step, step), lo, hi))


class RandomBlur:
    """Per-frame blur with a randomly chosen kernel family whose parameters
    random-walk across frames."""

    def __init__(self, params: Dict, keys: Sequence[str] = ("lqs",)):
        self.params = params
        self.keys = keys

    def get_kernels(self, rng: np.random.RandomState, num_frames: int
                    ) -> List[np.ndarray]:
        p = self.params
        kernel_type = rng.choice(p["kernel_list"], p=p.get("kernel_prob"))
        kernel_size = int(rng.choice(p["kernel_size"]))
        sx_lo, sx_hi = p.get("sigma_x", [0.2, 3])
        sy_lo, sy_hi = p.get("sigma_y", [0.2, 3])
        ra_lo, ra_hi = p.get("rotate_angle", [-np.pi, np.pi])
        bg_lo, bg_hi = p.get("beta_gaussian", [0.5, 4])
        bp_lo, bp_hi = p.get("beta_plateau", [1, 2])
        om_lo, om_hi = p.get("omega", [np.pi / 3, np.pi])
        if kernel_size < 13:
            om_lo = max(om_lo, np.pi / 3)

        sigma_x = rng.uniform(sx_lo, sx_hi)
        sigma_y = rng.uniform(sy_lo, sy_hi)
        rotate = rng.uniform(ra_lo, ra_hi)
        beta_g = rng.uniform(bg_lo, bg_hi)
        beta_p = rng.uniform(bp_lo, bp_hi)
        omega = rng.uniform(om_lo, om_hi)

        kernels = []
        for i in range(num_frames):
            if i > 0:
                sigma_x = _walk(rng, sigma_x, p.get("sigma_x_step", 0), sx_lo, sx_hi)
                sigma_y = _walk(rng, sigma_y, p.get("sigma_y_step", 0), sy_lo, sy_hi)
                rotate = _walk(rng, rotate, p.get("rotate_angle_step", 0), ra_lo, ra_hi)
                beta_g = _walk(rng, beta_g, p.get("beta_gaussian_step", 0), bg_lo, bg_hi)
                beta_p = _walk(rng, beta_p, p.get("beta_plateau_step", 0), bp_lo, bp_hi)
                omega = _walk(rng, omega, p.get("omega_step", 0), om_lo, om_hi)
            kernels.append(
                make_kernel(kernel_type, kernel_size, sigma_x, sigma_y,
                            rotate, beta_g, beta_p, omega)
            )
        return kernels

    def __call__(self, results: Dict, rng: np.random.RandomState) -> Dict:
        if np.random.RandomState(rng.randint(2**31)).uniform() > self.params.get("prob", 1.0):
            return results
        for key in self.keys:
            frames = results[key]
            kernels = self.get_kernels(rng, len(frames))
            results[key] = [
                cv2.filter2D(f, -1, k) for f, k in zip(frames, kernels)
            ]
        return results


class RandomResize:
    """Random up/down/keep rescale with per-frame scale stepping."""

    _INTERP = {
        "bilinear": cv2.INTER_LINEAR,
        "bicubic": cv2.INTER_CUBIC,
        "area": cv2.INTER_AREA,
        "nearest": cv2.INTER_NEAREST,
        "lanczos": cv2.INTER_LANCZOS4,
    }

    def __init__(self, params: Dict, keys: Sequence[str] = ("lqs",)):
        self.params = params
        self.keys = keys

    def __call__(self, results: Dict, rng: np.random.RandomState) -> Dict:
        p = self.params
        interp = self._INTERP[rng.choice(p["resize_opt"], p=p.get("resize_prob"))]
        if "target_size" in p:
            target = tuple(p["target_size"])
            for key in self.keys:
                results[key] = [
                    cv2.resize(f, (target[1], target[0]), interpolation=interp)
                    for f in results[key]
                ]
            return results

        mode = rng.choice(["up", "down", "keep"], p=p["resize_mode_prob"])
        lo, hi = p["resize_scale"]
        if mode == "up":
            scale = rng.uniform(1, hi)
        elif mode == "down":
            scale = rng.uniform(lo, 1)
        else:
            scale = 1.0
        step = p.get("resize_step", 0)
        for key in self.keys:
            frames = results[key]
            h, w = frames[0].shape[:2]
            out = []
            s = scale
            for i, f in enumerate(frames):
                if i > 0:
                    s = _walk(rng, s, step, lo, hi)
                th, tw = int(h * s), int(w * s)
                if p.get("is_size_even"):
                    th, tw = th - th % 2, tw - tw % 2
                th, tw = max(th, 1), max(tw, 1)
                out.append(cv2.resize(f, (tw, th), interpolation=interp))
            results[key] = out
        return results


class RandomNoise:
    """Gaussian or Poisson noise, optionally gray (channel-shared), with
    per-frame sigma/scale stepping."""

    def __init__(self, params: Dict, keys: Sequence[str] = ("lqs",)):
        self.params = params
        self.keys = keys

    def _gaussian(self, frames, rng):
        p = self.params
        lo, hi = p["gaussian_sigma"]
        sigma = rng.uniform(lo / 255.0, hi / 255.0)
        gray = rng.uniform() < p.get("gaussian_gray_noise_prob", 0)
        step = p.get("gaussian_sigma_step", 0) / 255.0
        out = []
        for i, f in enumerate(frames):
            if i > 0:
                sigma = _walk(rng, sigma, step, lo / 255.0, hi / 255.0)
            if gray:
                n = rng.randn(*f.shape[:2], 1).astype(np.float32) * sigma
            else:
                n = rng.randn(*f.shape).astype(np.float32) * sigma
            out.append(f + n)
        return out

    def _poisson(self, frames, rng):
        p = self.params
        lo, hi = p["poisson_scale"]
        scale = rng.uniform(lo, hi)
        gray = rng.uniform() < p.get("poisson_gray_noise_prob", 0)
        step = p.get("poisson_scale_step", 0)
        out = []
        for i, f in enumerate(frames):
            if i > 0:
                scale = _walk(rng, scale, step, lo, hi)
            img = np.clip(f, 0, 1)
            if gray:
                g = cv2.cvtColor(img.astype(np.float32), cv2.COLOR_BGR2GRAY)[..., None]
                vals = len(np.unique(g))
                vals = 2 ** np.ceil(np.log2(vals))
                noise = rng.poisson(g * vals) / float(vals) - g
            else:
                vals = len(np.unique(img))
                vals = 2 ** np.ceil(np.log2(max(vals, 2)))
                noise = rng.poisson(img * vals) / float(vals) - img
            out.append(f + noise.astype(np.float32) * scale)
        return out

    def __call__(self, results: Dict, rng: np.random.RandomState) -> Dict:
        noise_type = rng.choice(
            self.params["noise_type"], p=self.params.get("noise_prob")
        )
        for key in self.keys:
            if noise_type == "gaussian":
                results[key] = self._gaussian(results[key], rng)
            else:
                results[key] = self._poisson(results[key], rng)
        return results


class RandomJPEGCompression:
    """cv2 JPEG round trip with quality random walk across frames."""

    def __init__(self, params: Dict, keys: Sequence[str] = ("lqs",)):
        self.params = params
        self.keys = keys

    def __call__(self, results: Dict, rng: np.random.RandomState) -> Dict:
        lo, hi = self.params["quality"]
        q = rng.uniform(lo, hi)
        step = self.params.get("quality_step", 0)
        for key in self.keys:
            out = []
            for i, f in enumerate(results[key]):
                if i > 0:
                    q = _walk(rng, q, step, lo, hi)
                encode_params = [int(cv2.IMWRITE_JPEG_QUALITY), int(q)]
                img = np.clip(f * 255.0, 0, 255).astype(np.uint8)
                _, buf = cv2.imencode(".jpg", img, encode_params)
                out.append(
                    cv2.imdecode(buf, cv2.IMREAD_UNCHANGED).astype(np.float32)
                    / 255.0
                )
            results[key] = out
        return results


try:  # PyAV gives the reference's exact codec path when installed
    import av as _av

    logging.getLogger("libav").setLevel(50)
except Exception:  # pragma: no cover - this image ships no PyAV
    _av = None


# fourcc candidates per reference codec name for the cv2 fallback
_CV2_FOURCC = {
    "libx264": ("avc1", "h264", "X264", "mp4v"),
    "h264": ("avc1", "h264", "X264", "mp4v"),
    "mpeg4": ("mp4v",),
    "mp4v": ("mp4v",),
}
_FOURCC_CACHE: Dict[str, Optional[str]] = {}


def _probe_fourcc(codec: str) -> Optional[str]:
    """First cv2.VideoWriter fourcc that actually opens for ``codec``."""
    if codec in _FOURCC_CACHE:
        return _FOURCC_CACHE[codec]
    found = None
    for fourcc in _CV2_FOURCC.get(codec, ("mp4v",)):
        try:
            path = tempfile.mktemp(suffix=".mp4")
            w = cv2.VideoWriter(
                path, cv2.VideoWriter_fourcc(*fourcc), 25, (32, 32)
            )
            ok = w.isOpened()
            w.release()
            if os.path.exists(path):
                os.remove(path)
            if ok:
                found = fourcc
                break
        except Exception:
            continue
    _FOURCC_CACHE[codec] = found
    return found


class RandomVideoCompression:
    """Lossy video-codec round trip on the clip.

    Reference: random_degradations.py:455-525 — PyAV in-memory mp4 with
    ``codec`` sampled from ``params['codec']``/``params['codec_prob']`` and
    ``bit_rate ~ U{bitrate[0]..bitrate[1]}``, frames handed to the encoder
    labeled ``rgb24``. Note the reference's frames are cv2-loaded **BGR**
    at that point (realbasicvsr_dataset.py:198 ``imfrombytes`` +
    img2tensor's bgr2rgb only at the very end), so its effective transform
    runs the YUV matrix with R/B swapped relative to the true colors; our
    clips are BGR here too, so passing them through identically labeled
    reproduces the reference's exact degradation distribution.

    - PyAV present: exact reference semantics (codec, bitrate, yuv420p,
      rate=1, flush), in-memory.
    - PyAV absent (this image): cv2.VideoWriter fallback with the nearest
      available fourcc. cv2 expects BGR input and our data is BGR, so the
      frames are channel-reversed before write/after read to reproduce the
      reference's R/B-swapped YUV mapping. cv2 exposes no bitrate control —
      the sampled bitrate is drawn (same RNG stream) but unused; quantizer
      defaults apply (distribution approximation, documented).
    - no codec at all: identity with a one-time warning (capability gated).
    """

    def __init__(self, params: Dict, keys: Sequence[str] = ("lqs",)):
        self.params = params
        self.keys = keys
        self._warned = False

    def _pyav_roundtrip(self, u8_frames: List[np.ndarray], codec: str,
                        bitrate: int) -> Optional[List[np.ndarray]]:
        buf = io.BytesIO()
        with _av.open(buf, "w", "mp4") as container:
            stream = container.add_stream(codec, rate=1)
            stream.height = u8_frames[0].shape[0]
            stream.width = u8_frames[0].shape[1]
            stream.pix_fmt = "yuv420p"
            stream.bit_rate = bitrate
            for img in u8_frames:
                frame = _av.VideoFrame.from_ndarray(img, format="rgb24")
                frame.pict_type = "NONE"
                for packet in stream.encode(frame):
                    container.mux(packet)
            for packet in stream.encode():
                container.mux(packet)
        out = []
        with _av.open(buf, "r", "mp4") as container:
            if container.streams.video:
                for frame in container.decode(**{"video": 0}):
                    out.append(frame.to_rgb().to_ndarray())
        return out or None

    def _cv2_roundtrip(self, u8_frames: List[np.ndarray],
                       codec: str) -> Optional[List[np.ndarray]]:
        fourcc = _probe_fourcc(codec)
        if fourcc is None:
            return None
        h, w = u8_frames[0].shape[:2]
        path = tempfile.mktemp(suffix=".mp4")
        try:
            writer = cv2.VideoWriter(
                path, cv2.VideoWriter_fourcc(*fourcc), 25, (w, h)
            )
            for img in u8_frames:
                # reverse channels: cv2 maps input ch0->B_enc; the
                # reference's rgb24 mislabel maps data ch0->R_enc
                writer.write(np.ascontiguousarray(img[:, :, ::-1]))
            writer.release()
            cap = cv2.VideoCapture(path)
            out = []
            for _ in u8_frames:
                ok, img = cap.read()
                if not ok:
                    break
                out.append(np.ascontiguousarray(img[:, :, ::-1]))
            cap.release()
            return out if len(out) == len(u8_frames) else None
        finally:
            if os.path.exists(path):
                os.remove(path)

    def __call__(self, results: Dict, rng: np.random.RandomState) -> Dict:
        if rng.uniform() > self.params.get("prob", 1):
            return results
        for key in self.keys:
            frames = results[key]
            codec = str(rng.choice(
                self.params["codec"], p=self.params.get("codec_prob")))
            lo, hi = self.params["bitrate"]
            bitrate = int(rng.randint(int(lo), int(hi) + 1))
            u8 = [np.clip(np.asarray(f, np.float32) * 255.0, 0, 255)
                  .astype(np.uint8) for f in frames]
            if _av is not None:
                out = self._pyav_roundtrip(u8, codec, bitrate)
            else:
                out = self._cv2_roundtrip(u8, codec)
            if out is None:
                if not self._warned:
                    self._warned = True
                    logger.warning(
                        "no usable video codec (no PyAV, cv2 fourcc probe "
                        "failed); RandomVideoCompression is a no-op")
                continue
            results[key] = [o.astype(np.float32) / 255.0 for o in out]
        return results


class UnsharpMasking:
    """USM sharpening with thresholded mask (aug_pix.py:536; reference
    applies it to the GT clip)."""

    def __init__(self, kernel_size: int = 51, sigma: float = 0,
                 weight: float = 0.5, threshold: float = 10,
                 keys: Sequence[str] = ("gts",)):
        self.kernel_size = kernel_size
        self.sigma = sigma
        self.weight = weight
        self.threshold = threshold
        self.keys = keys

    def _sharpen(self, img: np.ndarray) -> np.ndarray:
        blur = cv2.GaussianBlur(img, (self.kernel_size, self.kernel_size),
                                self.sigma)
        residual = img - blur
        mask = (np.abs(residual) * 255.0 > self.threshold).astype(np.float32)
        soft_mask = cv2.GaussianBlur(mask, (self.kernel_size, self.kernel_size),
                                     self.sigma)
        sharp = np.clip(img + self.weight * residual, 0, 1)
        return soft_mask * sharp + (1 - soft_mask) * img

    def __call__(self, results: Dict, rng=None) -> Dict:
        for key in self.keys:
            results[key] = [self._sharpen(f) for f in results[key]]
        return results


class Clip:
    def __init__(self, keys: Sequence[str] = ("lqs",), lo=0.0, hi=1.0):
        self.keys = keys
        self.lo, self.hi = lo, hi

    def __call__(self, results: Dict, rng=None) -> Dict:
        for key in self.keys:
            results[key] = [np.clip(f, self.lo, self.hi) for f in results[key]]
        return results


class DegradationStage:
    """One blur→resize→noise→jpeg→video-compression stage, with optional
    final resize + sinc blur (stage 2)."""

    def __init__(self, cfg: Dict):
        self.transforms = []
        order = (
            ("random_blur", RandomBlur),
            ("random_resize", RandomResize),
            ("random_noise", RandomNoise),
            ("random_jpeg", RandomJPEGCompression),
            ("random_mpeg", RandomVideoCompression),
            ("resize_final", RandomResize),
            ("blur_final", RandomBlur),
        )
        for name, cls in order:
            if name in cfg:
                entry = cfg[name]
                self.transforms.append(
                    cls(entry["params"], entry.get("keys", ("lqs",)))
                )

    def __call__(self, results: Dict, rng: np.random.RandomState) -> Dict:
        for t in self.transforms:
            results = t(results, rng)
        return results


_DEGRADATION_TYPES = {
    "RandomBlur": RandomBlur,
    "RandomResize": RandomResize,
    "RandomNoise": RandomNoise,
    "RandomJPEGCompression": RandomJPEGCompression,
    "RandomVideoCompression": RandomVideoCompression,
}


class DegradationsWithShuffle:
    """Apply a list of degradations in a (partially) shuffled order.

    Capability parity with DegradationsWithShuffle
    (/root/reference/basicsr/data/mmcv_transforms/random_degradations.py:539
    -606): nested groups keep their internal order; only the positions listed
    in ``shuffle_idx`` (default: all) are permuted per call.

    Args:
      degradations: list of {'type': name, 'params': {...}} dicts, possibly
        nested one level (groups).
      keys: result-dict keys to transform.
      shuffle_idx: indices eligible for shuffling (None = all).
    """

    def __init__(self, degradations, keys=("lqs",), shuffle_idx=None):
        self.keys = tuple(keys)
        self.degradations = self._build(list(degradations))
        if shuffle_idx is None:
            self.shuffle_idx = list(range(len(self.degradations)))
        else:
            self.shuffle_idx = list(shuffle_idx)

    def _build(self, degradations):
        built = []
        for d in degradations:
            if isinstance(d, (list, tuple)):
                built.append(self._build(list(d)))
            else:
                built.append(_DEGRADATION_TYPES[d["type"]](d["params"],
                                                           self.keys))
        return built

    def __call__(self, results, rng: np.random.RandomState):
        order = list(self.degradations)
        if self.shuffle_idx:
            picked = [order[i] for i in self.shuffle_idx]
            rng.shuffle(picked)
            for i, idx in enumerate(self.shuffle_idx):
                order[idx] = picked[i]
        for d in order:
            for sub in (d if isinstance(d, list) else [d]):
                results = sub(results, rng)
        return results
