"""Data pipeline tests: blur kernels vs analytic properties, degradation
stages on synthetic clips, dataset loading from generated folders."""
import os

import numpy as np
import pytest
import cv2

from mgldvsr_tpu.data.blur_kernels import (
    bivariate_gaussian,
    bivariate_generalized_gaussian,
    bivariate_plateau,
    circular_lowpass_kernel,
    make_kernel,
)
from mgldvsr_tpu.data.datasets import (
    REDSAutoencoderDataset,
    RealVSRRecurrentDataset,
    ShardedSampler,
    VideoFolderDataset,
    prefetch_iterator,
)
from mgldvsr_tpu.data.degradations import (
    DegradationStage,
    RandomBlur,
    RandomJPEGCompression,
    RandomNoise,
    RandomResize,
    UnsharpMasking,
)


def test_blur_kernels_normalized_and_shaped():
    for k in [
        bivariate_gaussian(13, 1.5),
        bivariate_gaussian(13, 1.0, 2.5, 0.7, isotropic=False),
        bivariate_generalized_gaussian(11, 1.2, beta=2.0),
        bivariate_plateau(11, 1.2, beta=1.5),
        circular_lowpass_kernel(np.pi / 2, 13),
    ]:
        assert abs(k.sum() - 1.0) < 1e-5
        assert k.shape[0] == k.shape[1]
    # isotropic gaussian symmetric
    k = bivariate_gaussian(13, 1.5)
    assert np.allclose(k, k.T, atol=1e-8)
    # sinc kernel matches scipy gaussian lowpass character: center dominant
    s = circular_lowpass_kernel(np.pi, 13)
    assert s[6, 6] == s.max()


def test_gaussian_matches_cv2():
    """iso gaussian kernel should match cv2.getGaussianKernel outer product."""
    sigma = 1.3
    k = bivariate_gaussian(13, sigma)
    g1 = cv2.getGaussianKernel(13, sigma)
    ref = (g1 @ g1.T).astype(np.float32)
    assert np.allclose(k, ref, atol=1e-6), np.abs(k - ref).max()


def _clip(t=3, h=64, w=64, seed=0):
    rs = np.random.RandomState(seed)
    return [rs.rand(h, w, 3).astype(np.float32) for _ in range(t)]


def test_random_blur_and_stepping():
    rng = np.random.RandomState(0)
    tr = RandomBlur(
        dict(
            kernel_size=[7, 9],
            kernel_list=["iso", "aniso", "sinc"],
            kernel_prob=[0.5, 0.3, 0.2],
            sigma_x=[0.2, 3],
            sigma_y=[0.2, 3],
            rotate_angle=[-3.14, 3.14],
            beta_gaussian=[0.5, 4],
            beta_plateau=[1, 2],
            sigma_x_step=0.02,
            omega_step=0.06,
        )
    )
    res = tr({"lqs": _clip()}, rng)
    assert len(res["lqs"]) == 3
    assert res["lqs"][0].shape == (64, 64, 3)
    # blur reduces variance
    assert res["lqs"][0].var() < _clip()[0].var()


def test_random_resize_and_final_size():
    rng = np.random.RandomState(1)
    tr = RandomResize(
        dict(resize_mode_prob=[0.4, 0.4, 0.2], resize_scale=[0.5, 1.5],
             resize_opt=["bilinear", "area", "bicubic"],
             resize_prob=[0.34, 0.33, 0.33], resize_step=0.02,
             is_size_even=True)
    )
    res = tr({"lqs": _clip()}, rng)
    h, w = res["lqs"][0].shape[:2]
    assert h % 2 == 0 and w % 2 == 0

    fin = RandomResize(dict(target_size=[32, 32],
                            resize_opt=["bilinear"], resize_prob=[1.0]))
    res = fin(res, rng)
    assert all(f.shape[:2] == (32, 32) for f in res["lqs"])


def test_random_noise_gaussian_poisson():
    rng = np.random.RandomState(2)
    base = _clip()
    tr = RandomNoise(
        dict(noise_type=["gaussian", "poisson"], noise_prob=[1.0, 0.0],
             gaussian_sigma=[5, 10], gaussian_gray_noise_prob=0.0,
             poisson_scale=[0.5, 1], gaussian_sigma_step=0.1)
    )
    res = tr({"lqs": [f.copy() for f in base]}, rng)
    assert not np.allclose(res["lqs"][0], base[0])

    tr2 = RandomNoise(
        dict(noise_type=["poisson"], noise_prob=[1.0],
             poisson_scale=[0.5, 1], poisson_gray_noise_prob=0.0)
    )
    res2 = tr2({"lqs": [f.copy() for f in base]}, rng)
    assert not np.allclose(res2["lqs"][0], base[0])


def test_jpeg_roundtrip_quality():
    rng = np.random.RandomState(3)
    base = _clip(seed=3)
    tr = RandomJPEGCompression(dict(quality=[30, 40], quality_step=3))
    res = tr({"lqs": [f.copy() for f in base]}, rng)
    # lossy but similar
    err = np.abs(res["lqs"][0] - base[0]).mean()
    assert 0.001 < err < 0.3


def test_usm_sharpens_edges():
    img = np.zeros((64, 64, 3), np.float32)
    img[:, 32:] = 0.8
    usm = UnsharpMasking(kernel_size=11, weight=0.5, threshold=5, keys=("gts",))
    out = usm({"gts": [img]})["gts"][0]
    assert out.shape == img.shape
    # edge contrast should not decrease
    assert (out[:, 36] - out[:, 28]).mean() >= (img[:, 36] - img[:, 28]).mean() - 1e-6


def test_full_degradation_stage():
    cfg = dict(
        random_blur=dict(params=dict(
            kernel_size=[7], kernel_list=["iso"], kernel_prob=[1.0],
            sigma_x=[0.5, 2], sigma_y=[0.5, 2], rotate_angle=[-3, 3],
            beta_gaussian=[0.5, 4], beta_plateau=[1, 2])),
        random_resize=dict(params=dict(
            resize_mode_prob=[0.3, 0.4, 0.3], resize_scale=[0.5, 1.2],
            resize_opt=["bilinear"], resize_prob=[1.0], is_size_even=True)),
        random_noise=dict(params=dict(
            noise_type=["gaussian"], noise_prob=[1.0],
            gaussian_sigma=[1, 10], gaussian_gray_noise_prob=0.4)),
        random_jpeg=dict(params=dict(quality=[40, 90])),
        resize_final=dict(params=dict(target_size=[16, 16],
                                      resize_opt=["bicubic"],
                                      resize_prob=[1.0])),
        blur_final=dict(params=dict(
            prob=0.8, kernel_size=[7], kernel_list=["sinc"], kernel_prob=[1.0],
            omega=[1.05, 3.14])),
    )
    stage = DegradationStage(cfg)
    res = stage({"lqs": _clip(h=64, w=64)}, np.random.RandomState(4))
    assert all(f.shape[:2] == (16, 16) for f in res["lqs"])


@pytest.fixture()
def reds_tree(tmp_path):
    root = tmp_path / "gt"
    for clip in ("000", "001", "002"):
        d = root / clip
        d.mkdir(parents=True)
        for i in range(8):
            img = (np.random.RandomState(i).rand(80, 96, 3) * 255).astype(np.uint8)
            cv2.imwrite(str(d / f"{i:08d}.png"), img)
    return str(root)


def test_realvsr_dataset(reds_tree):
    deg = dict(
        random_blur=dict(params=dict(
            kernel_size=[7], kernel_list=["iso"], kernel_prob=[1.0],
            sigma_x=[0.5, 2], sigma_y=[0.5, 2], rotate_angle=[-3, 3],
            beta_gaussian=[0.5, 4], beta_plateau=[1, 2])),
        resize_final=dict(params=dict(target_size=[16, 16],
                                      resize_opt=["bicubic"], resize_prob=[1.0])),
    )
    ds = RealVSRRecurrentDataset(
        reds_tree, num_frame=3, gt_size=64, degradation_1=deg,
        val_partition="REDS4",
    )
    # clip '000' excluded by REDS4 partition
    assert len(ds) == 2
    item = ds[0]
    assert item["gts"].shape == (3, 64, 64, 3)
    assert item["lqs"].shape == (3, 16, 16, 3)
    assert item["lqs"].min() >= 0 and item["lqs"].max() <= 1

    # sharded sampler covers all indices across shards
    s0 = ShardedSampler(10, 0, 2, ratio=1).epoch(0)
    s1 = ShardedSampler(10, 1, 2, ratio=1).epoch(0)
    assert len(set(list(s0) + list(s1))) <= 10
    assert len(s0) + len(s1) == 10

    # prefetch works
    items = list(prefetch_iterator(ds, [0, 1], num_workers=2))
    assert len(items) == 2


def test_video_folder_dataset(reds_tree):
    ds = VideoFolderDataset(reds_tree, num_frame=5)
    assert len(ds) == 3
    segs = list(ds.segments(0))
    # 8 frames -> 2 windows, last padded to 5
    assert len(segs) == 2
    clip, names, frames = segs[1]
    assert frames.shape == (5, 80, 96, 3)
    assert len(names) == 3  # real (unpadded) names preserved


def test_reds_autoencoder_dataset(tmp_path):
    n = 6
    for kind in ("gt", "lq", "lat"):
        d = tmp_path / kind / "clipA"
        d.mkdir(parents=True)
        for i in range(n):
            name = f"{i:08d}"
            if kind == "lat":
                np.save(str(d / f"{name}.npy"),
                        np.zeros((8, 8, 4), np.float32))
            else:
                cv2.imwrite(str(d / f"{name}.png"),
                            np.zeros((32, 32, 3), np.uint8))
    ds = REDSAutoencoderDataset(
        str(tmp_path / "gt"), str(tmp_path / "lq"), str(tmp_path / "lat"),
        num_frame=3,
    )
    assert len(ds) == 2  # aligned windows: [0..2], [3..5]
    item = ds[0]
    assert item["gts"].shape == (3, 32, 32, 3)
    assert item["lts"].shape == (3, 8, 8, 4)


def test_file_client_disk_and_packed(tmp_path):
    from mgldvsr_tpu.data.file_client import (
        FileClient, PackedMaker, imfrombytes,
    )

    img = (np.random.RandomState(0).rand(16, 16, 3) * 255).astype(np.uint8)
    p = tmp_path / "img.png"
    cv2.imwrite(str(p), img)

    fc = FileClient("disk")
    decoded = imfrombytes(fc.get(str(p)))
    assert decoded.shape == (16, 16, 3)
    assert np.array_equal(decoded, img)

    # packed backend round trip
    root = str(tmp_path / "pack")
    mk = PackedMaker(root)
    mk.put("a", b"hello")
    mk.put("b", open(str(p), "rb").read())
    mk.close()
    pc = FileClient("packed", root=root)
    assert pc.get("a") == b"hello"
    assert np.array_equal(imfrombytes(pc.get("b")), img)


def test_file_client_memcached_injected():
    """Memcached backend dispatch (reference file_client.py:22-55); the
    client is injected since no memcached package/daemon is in the image."""
    from mgldvsr_tpu.data.file_client import FileClient

    class FakeClient:
        def __init__(self):
            self.store = {"k": b"payload"}

        def get(self, key):
            return self.store[key]

    fc = FileClient("memcached", client=FakeClient())
    assert fc.get("k") == b"payload"
    # without an injected client and without the packages, a clear error
    import pytest

    with pytest.raises(ImportError, match="memcached backend"):
        FileClient("memcached", server_list_cfg="localhost:11211")


def test_training_pair_queue():
    from mgldvsr_tpu.data.pair_queue import TrainingPairQueue

    q = TrainingPairQueue(queue_size=8, seed=0)
    pushed = []
    # warmup: returns inputs unchanged
    for i in range(4):
        lq = np.full((2, 4, 4, 3), i, np.float32)
        gt = np.full((2, 8, 8, 3), i, np.float32)
        out_lq, out_gt = q(lq, gt)
        pushed.append(i)
        assert np.array_equal(out_lq, lq)
    # queue now full: returns shuffled old entries, keeps pairing intact
    lq = np.full((2, 4, 4, 3), 99, np.float32)
    gt = np.full((2, 8, 8, 3), 99, np.float32)
    out_lq, out_gt = q(lq, gt)
    assert out_lq.max() <= 3  # from the warmup pool
    assert np.array_equal(out_lq[..., 0], out_lq[..., 1])
    # lq/gt stay paired
    assert np.array_equal(out_lq[:, 0, 0, 0], out_gt[:, 0, 0, 0])


def test_degradations_with_shuffle_groups_and_partial_idx():
    from mgldvsr_tpu.data.degradations import DegradationsWithShuffle

    degs = [
        {"type": "RandomBlur",
         "params": {"kernel_size": [3], "kernel_list": ["iso"],
                    "kernel_prob": [1.0], "sigma_x": [0.4, 0.4],
                    "sigma_y": [0.4, 0.4], "rotate_angle": [-3.14, 3.14],
                    "prob": 1.0}},
        [{"type": "RandomResize",
          "params": {"resize_mode_prob": [1, 0, 0], "resize_scale": [0.5, 0.5],
                     "resize_opt": ["bilinear"], "resize_prob": [1.0],
                     "prob": 1.0, "target_size": (8, 8)}},
         {"type": "RandomJPEGCompression",
          "params": {"quality": [80, 80], "prob": 1.0}}],
    ]
    pipe = DegradationsWithShuffle(degs, keys=("lqs",), shuffle_idx=[0, 1])
    rs = np.random.RandomState(0)
    frames = [np.random.RandomState(i).rand(16, 16, 3).astype(np.float32)
              for i in range(3)]
    out = pipe({"lqs": [f.copy() for f in frames]}, rs)
    assert len(out["lqs"]) == 3
    # the group's resize-to-8 must have run regardless of shuffle order
    assert out["lqs"][0].shape == (8, 8, 3)
    assert all(np.isfinite(f).all() for f in out["lqs"])


# --- RandomVideoCompression (PyAV-first, cv2 fallback) ---------------------


def test_video_compression_roundtrip_preserves_colors():
    """The codec roundtrip must return frames in the ORIGINAL channel
    order (the reference's rgb24 mislabel swaps channels into and back out
    of the encoder — net identity on assignment, lossy on values). A red
    BGR frame must come back red, not blue."""
    from mgldvsr_tpu.data.degradations import RandomVideoCompression

    h, w = 64, 64
    red_bgr = np.zeros((h, w, 3), np.float32)
    red_bgr[..., 2] = 0.9  # BGR: channel 2 = R
    frames = [red_bgr.copy() for _ in range(4)]
    tr = RandomVideoCompression(
        {"codec": ["mpeg4"], "codec_prob": [1.0],
         "bitrate": [1e4, 1e5]}, keys=("lqs",))
    out = tr({"lqs": frames}, np.random.RandomState(0))["lqs"]
    assert len(out) == 4
    if np.allclose(out[0], red_bgr):  # no codec available -> identity path
        return
    for f in out:
        assert f.shape == (h, w, 3) and f.dtype == np.float32
        # red channel dominant, blue near zero (swap bug would invert this)
        assert f[..., 2].mean() > 0.5, f.mean(axis=(0, 1))
        assert f[..., 0].mean() < 0.3, f.mean(axis=(0, 1))


def test_video_compression_prob_gate_and_sampling():
    """prob gate skips the transform (reference random_degradations.py:515);
    codec/bitrate are sampled from the configured distribution."""
    from mgldvsr_tpu.data.degradations import RandomVideoCompression

    frames = [np.random.RandomState(i).rand(32, 32, 3).astype(np.float32)
              for i in range(3)]
    tr = RandomVideoCompression(
        {"codec": ["libx264", "h264", "mpeg4"],
         "codec_prob": [0.3333, 0.3333, 0.3334],
         "bitrate": [1e4, 1e5], "prob": 0.0}, keys=("lqs",))
    out = tr({"lqs": [f.copy() for f in frames]}, np.random.RandomState(1))
    for a, b in zip(out["lqs"], frames):
        np.testing.assert_array_equal(a, b)  # gated off -> untouched

    # applied: mpeg4 through whatever backend exists
    tr2 = RandomVideoCompression(
        {"codec": ["mpeg4"], "codec_prob": [1.0], "bitrate": [1e4, 1e5]},
        keys=("lqs",))
    out2 = tr2({"lqs": [f.copy() for f in frames]},
               np.random.RandomState(2))["lqs"]
    assert len(out2) == 3
    assert all(f.shape == (32, 32, 3) for f in out2)


@pytest.mark.skipif(
    not pytest.importorskip("importlib").util.find_spec("av"),
    reason="PyAV not installed (cv2 fallback covered above)")
def test_video_compression_pyav_matches_reference():
    """With PyAV present, our transform must match the reference's
    _apply_random_compression byte-for-byte given the same codec/bitrate
    draw (random_degradations.py:473-513)."""
    import sys
    sys.path.insert(0, "/root/reference")
    from basicsr.data.mmcv_transforms.random_degradations import (
        RandomVideoCompression as RefRVC,
    )

    from mgldvsr_tpu.data.degradations import RandomVideoCompression

    rs = np.random.RandomState(7)
    frames01 = [rs.rand(64, 64, 3).astype(np.float32) for _ in range(5)]
    frames255 = [f * 255.0 for f in frames01]

    import random as pyrandom

    import numpy as _np
    ref = RefRVC({"codec": ["mpeg4"], "codec_prob": [1.0],
                  "bitrate": [50000, 50000]}, keys=["lqs"])
    pyrandom.seed(0)
    _np.random.seed(0)
    ref_out = ref({"lqs": [f.copy() for f in frames255]})["lqs"]

    ours = RandomVideoCompression(
        {"codec": ["mpeg4"], "codec_prob": [1.0],
         "bitrate": [50000, 50000]}, keys=("lqs",))
    our_out = ours({"lqs": [f.copy() for f in frames01]},
                   np.random.RandomState(0))["lqs"]
    for a, b in zip(our_out, ref_out):
        np.testing.assert_allclose(a * 255.0, b, atol=1e-3)
