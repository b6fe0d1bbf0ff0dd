"""Heritage dataset protocols (REDS / Vimeo-90K / video test)."""
import os
import sys

import cv2
import numpy as np
import pytest

from mgldvsr_tpu.data.heritage_datasets import (
    REDSDataset,
    REDSRecurrentDataset,
    VideoRecurrentTestDataset,
    VideoTestDataset,
    VideoTestDUFDataset,
    VideoTestVimeo90KDataset,
    Vimeo90KDataset,
    Vimeo90KRecurrentDataset,
    duf_downsample,
    generate_frame_indices,
    paired_crop,
)

_HERE = os.path.dirname(os.path.abspath(__file__))
_REF = "/root/reference"


def _write_clip(root, clip, n, size, seed, names=None):
    d = os.path.join(root, clip)
    os.makedirs(d, exist_ok=True)
    rs = np.random.RandomState(seed)
    names = names or [f"{i:08d}.png" for i in range(n)]
    for name in names:
        cv2.imwrite(os.path.join(d, name),
                    rs.randint(0, 255, (size, size, 3), np.uint8))


@pytest.fixture()
def reds_tree(tmp_path):
    gt = str(tmp_path / "gt")
    lq = str(tmp_path / "lq")
    meta = str(tmp_path / "meta.txt")
    clips = ["000", "001", "025"]
    for i, c in enumerate(clips):
        _write_clip(gt, c, 10, 64, i)
        _write_clip(lq, c, 10, 16, 100 + i)
    with open(meta, "w") as f:
        for c in clips:
            f.write(f"{c} 10 (64,64,3)\n")
    return gt, lq, meta


def test_reds_dataset_window(reds_tree):
    gt, lq, meta = reds_tree
    ds = REDSDataset(gt, lq, meta, num_frame=5, gt_size=32, scale=4,
                     interval_list=[1], frames_per_clip=10, seed=3)
    # REDS4 partition removes clip '000'
    assert all(not k.startswith("000/") for k in ds.keys)
    assert len(ds) == 20
    item = ds[4]
    assert item["lqs"].shape == (5, 8, 8, 3)
    assert item["gt"].shape == (32, 32, 3)


def test_reds_recurrent_dataset(reds_tree):
    gt, lq, meta = reds_tree
    ds = REDSRecurrentDataset(gt, lq, meta, num_frame=4, gt_size=32, scale=4,
                              frames_per_clip=10, seed=3)
    item = ds[0]
    assert item["lqs"].shape == (4, 8, 8, 3)
    assert item["gts"].shape == (4, 32, 32, 3)
    # test_mode keeps ONLY the validation partition
    ds_val = REDSRecurrentDataset(gt, lq, meta, num_frame=4, gt_size=32,
                                  scale=4, test_mode=True,
                                  frames_per_clip=10)
    assert all(k.startswith("000/") for k in ds_val.keys)


@pytest.fixture()
def vimeo_tree(tmp_path):
    gt = str(tmp_path / "gt")
    lq = str(tmp_path / "lq")
    meta = str(tmp_path / "meta.txt")
    names = [f"im{i}.png" for i in range(1, 8)]
    for key in ("00001/0001", "00001/0002"):
        _write_clip(gt, key, 7, 64, 1, names)
        _write_clip(lq, key, 7, 16, 2, names)
    with open(meta, "w") as f:
        f.write("00001/0001 7 (64,64,3)\n00001/0002 7 (64,64,3)\n")
    return gt, lq, meta


def test_vimeo90k_datasets(vimeo_tree):
    gt, lq, meta = vimeo_tree
    ds = Vimeo90KDataset(gt, lq, meta, num_frame=5, gt_size=32, scale=4)
    assert ds.neighbor_list == [2, 3, 4, 5, 6]
    item = ds[0]
    assert item["lqs"].shape == (5, 8, 8, 3)
    assert item["gt"].shape == (32, 32, 3)

    rec = Vimeo90KRecurrentDataset(gt, lq, meta, gt_size=32, scale=4,
                                   flip_sequence=True)
    item = rec[1]
    assert item["lqs"].shape == (14, 8, 8, 3)  # 7 -> 14 with flip
    assert item["gts"].shape == (14, 32, 32, 3)
    np.testing.assert_array_equal(item["lqs"][7], item["lqs"][6])


def test_video_test_datasets(tmp_path):
    gt = str(tmp_path / "gt")
    lq = str(tmp_path / "lq")
    for c in ("calendar", "city"):
        _write_clip(gt, c, 6, 32, 5)
        _write_clip(lq, c, 6, 8, 6)
    ds = VideoTestDataset(gt, lq, num_frame=5, padding="reflection")
    assert len(ds) == 12
    first = ds[0]
    assert first["lqs"].shape == (5, 8, 8, 3)
    assert first["border"] == 1 and ds[2]["border"] == 0
    # reflection padding at the clip start: window [2,1,0,1,2]
    np.testing.assert_array_equal(first["lqs"][0], first["lqs"][4])

    rec = VideoRecurrentTestDataset(gt, lq, num_frame=5)
    assert len(rec) == 2
    clip = rec[0]
    assert clip["lqs"].shape == (6, 8, 8, 3)
    assert clip["gts"].shape == (6, 32, 32, 3)

    duf = VideoTestDUFDataset(gt, lq, num_frame=5, padding="reflection",
                              use_duf_downsampling=True, scale=4)
    item = duf[1]
    assert item["lqs"].shape == (5, 8, 8, 3)  # GT 32 -> /4
    assert np.isfinite(item["lqs"]).all()


def test_video_test_vimeo(tmp_path):
    gt = str(tmp_path / "gt")
    lq = str(tmp_path / "lq")
    meta = str(tmp_path / "meta.txt")
    names = [f"im{i}.png" for i in range(1, 8)]
    _write_clip(gt, "00001/0266", 7, 32, 0, names)
    _write_clip(lq, "00001/0266", 7, 8, 1, names)
    with open(meta, "w") as f:
        f.write("00001/0266 7 (32,32,3)\n")
    ds = VideoTestVimeo90KDataset(gt, lq, meta, num_frame=7)
    item = ds[0]
    assert item["lqs"].shape == (7, 8, 8, 3)
    assert item["gt"].shape == (32, 32, 3)


def test_paired_crop_alignment():
    rs = np.random.RandomState(0)
    gt = [np.arange(64 * 64 * 3, dtype=np.float32).reshape(64, 64, 3)]
    lq = [gt[0][::4, ::4]]
    gts, lqs = paired_crop(gt, lq, 32, 4, rs)
    np.testing.assert_array_equal(gts[0][::4, ::4], lqs[0])


@pytest.mark.skipif(not os.path.isdir(_REF), reason="reference not present")
def test_frame_indices_and_duf_match_reference():
    """generate_frame_indices and duf_downsample vs the actual reference
    functions (basicsr/data/data_util.py:43-95, 332-362)."""
    for p in (os.path.join(_HERE, "ref_shims"), _REF):
        if p not in sys.path:
            sys.path.insert(0, p)
    import torch
    from basicsr.data.data_util import (
        duf_downsample as ref_duf,
        generate_frame_indices as ref_gfi,
    )

    for pad in ("replicate", "reflection", "reflection_circle", "circle"):
        for crt in (0, 1, 5, 98, 99):
            assert (generate_frame_indices(crt, 100, 5, pad)
                    == ref_gfi(crt, 100, 5, pad)), (pad, crt)

    rs = np.random.RandomState(7)
    x = rs.rand(2, 32, 32, 3).astype(np.float32)
    for scale in (2, 3, 4):
        ours = duf_downsample(x, 13, scale)
        with torch.no_grad():
            ref = ref_duf(
                torch.from_numpy(x.transpose(0, 3, 1, 2).copy()), 13, scale)
        np.testing.assert_allclose(
            ours, ref.numpy().transpose(0, 2, 3, 1), atol=1e-5,
            err_msg=f"scale {scale}")


def test_paired_and_single_image_datasets(tmp_path):
    from mgldvsr_tpu.data.heritage_datasets import (
        PairedImageDataset,
        SingleImageDataset,
    )

    gt, lq = str(tmp_path / "gt"), str(tmp_path / "lq")
    os.makedirs(gt)
    os.makedirs(lq)
    rs = np.random.RandomState(0)
    for i in range(3):
        cv2.imwrite(os.path.join(gt, f"{i}.png"),
                    rs.randint(0, 255, (32, 32, 3), np.uint8))
        cv2.imwrite(os.path.join(lq, f"{i}.png"),
                    rs.randint(0, 255, (8, 8, 3), np.uint8))
    ds = PairedImageDataset(gt, lq, gt_size=16, scale=4, phase="train")
    item = ds[0]
    assert item["lq"].shape == (4, 4, 3) and item["gt"].shape == (16, 16, 3)
    ds_t = PairedImageDataset(gt, lq)
    assert ds_t[1]["gt"].shape == (32, 32, 3)
    si = SingleImageDataset(lq)
    assert len(si) == 3 and si[2]["lq"].shape == (8, 8, 3)
