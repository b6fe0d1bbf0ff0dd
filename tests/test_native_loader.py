"""Native C++ clip loader: decode parity vs cv2, crop/flip semantics vs
the numpy path, async ordering, and end-to-end dataset equivalence
(packed-native backend == disk backend at the same seed)."""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from mgldvsr_tpu.native import native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain/codecs unavailable")


@pytest.fixture(scope="module")
def packed(tmp_path_factory):
    d = tmp_path_factory.mktemp("pack")
    rng = np.random.RandomState(7)
    imgs = {}
    from mgldvsr_tpu.data.file_client import PackedMaker

    mk = PackedMaker(str(d / "pack"))
    for i in range(5):
        img = rng.randint(0, 256, (41 + i, 57, 3), np.uint8)
        ok, buf = cv2.imencode(".png", img)
        assert ok
        mk.put(f"clip/{i:08d}.png", buf.tobytes())
        imgs[f"clip/{i:08d}.png"] = img
    jimg = rng.randint(0, 256, (44, 62, 3), np.uint8)
    ok, jbuf = cv2.imencode(".jpg", jimg, [cv2.IMWRITE_JPEG_QUALITY, 85])
    assert ok
    mk.put("j.jpg", jbuf.tobytes())
    mk.close()
    return str(d / "pack"), imgs, jbuf.tobytes()


def _loader(packed, threads=3):
    from mgldvsr_tpu.native.loader import NativeClipLoader

    return NativeClipLoader(packed[0], num_threads=threads)


def test_probe_dims(packed):
    L = _loader(packed)
    assert L.probe("clip/00000000.png") == (41, 57)
    assert L.probe("j.jpg") == (44, 62)
    L.close()


def test_png_decode_bitexact_vs_cv2(packed):
    root, imgs, _ = packed
    L = _loader(packed)
    for k, img in imgs.items():
        dec = L.decode(k)
        ref = img.astype(np.float32) / 255.0  # BGR order both sides
        np.testing.assert_allclose(dec, ref, atol=1e-7)
    L.close()


def test_jpeg_decode_matches_cv2(packed):
    root, _, jbuf = packed
    L = _loader(packed)
    dec = L.decode("j.jpg")
    ref = cv2.imdecode(np.frombuffer(jbuf, np.uint8),
                       cv2.IMREAD_COLOR).astype(np.float32) / 255.0
    # both decoders are libjpeg-family; allow one quantum of IDCT rounding
    assert np.abs(dec - ref).max() <= 1.5 / 255.0


def test_clip_crop_flip_transpose(packed):
    root, imgs, _ = packed
    L = _loader(packed)
    keys = sorted(imgs.keys())
    for hf, vf, tr in [(0, 0, 0), (1, 0, 0), (0, 1, 0), (1, 1, 1)]:
        clip = L.load_clip(keys, top=3, left=9, crop_h=16, crop_w=24,
                           hflip=hf, vflip=vf, transpose=tr)
        ref = np.stack([imgs[k][3:19, 9:33].astype(np.float32) / 255.0
                        for k in keys])
        if hf:
            ref = ref[:, :, ::-1]
        if vf:
            ref = ref[:, ::-1]
        if tr:
            ref = ref.transpose(0, 2, 1, 3)
        np.testing.assert_allclose(clip, ref, atol=1e-7)
    L.close()


def test_async_submission_order(packed):
    root, imgs, _ = packed
    L = _loader(packed, threads=4)
    keys = sorted(imgs.keys())
    crops = [(t % 4, t % 3, 8 + t % 5, 8) for t in range(24)]
    tickets = [L.submit_clip(keys, top, left, ch, cw)
               for top, left, ch, cw in crops]
    for (top, left, ch, cw), t in zip(crops, tickets):
        out = L.fetch(t)
        ref = np.stack([
            imgs[k][top : top + ch, left : left + cw].astype(np.float32)
            / 255.0 for k in keys])
        np.testing.assert_allclose(out, ref, atol=1e-7)
    L.close()


def test_error_paths(packed):
    L = _loader(packed)
    with pytest.raises(KeyError):
        L.probe("nope.png")
    with pytest.raises(IOError):
        L.load_clip(["clip/00000000.png"], top=0, left=0,
                    crop_h=999, crop_w=8)
    L.close()


def test_pack_image_dir_roundtrip(tmp_path):
    from mgldvsr_tpu.native.loader import NativeClipLoader, pack_image_dir

    rng = np.random.RandomState(3)
    src = tmp_path / "frames"
    for clip in ("000", "001"):
        (src / clip).mkdir(parents=True)
        for i in range(3):
            img = rng.randint(0, 256, (20, 30, 3), np.uint8)
            cv2.imwrite(str(src / clip / f"{i:08d}.png"), img)
    n = pack_image_dir(str(src), str(tmp_path / "pk"))
    assert n == 6
    L = NativeClipLoader(str(tmp_path / "pk"))
    assert sorted(L.keys()) == sorted(
        f"{c}/{i:08d}.png" for c in ("000", "001") for i in range(3))
    ref = cv2.imread(str(src / "001" / "00000002.png")).astype(np.float32) / 255
    np.testing.assert_allclose(L.decode("001/00000002.png"), ref, atol=1e-7)
    L.close()


def test_dataset_packed_equals_disk(tmp_path):
    """RealVSRRecurrentDataset through the packed-native backend yields
    byte-identical samples to the disk backend at the same seed (the RNG
    draw order is replicated across backends)."""
    from mgldvsr_tpu.data.datasets import RealVSRRecurrentDataset
    from mgldvsr_tpu.native.loader import pack_image_dir

    rng = np.random.RandomState(11)
    root = tmp_path / "gt"
    for clip in ("005", "006"):
        (root / clip).mkdir(parents=True)
        for i in range(7):
            img = rng.randint(0, 256, (64, 80, 3), np.uint8)
            cv2.imwrite(str(root / clip / f"{i:08d}.png"), img)
    pack_image_dir(str(root), str(tmp_path / "pk"))

    deg = {"blur": {"prob": 1.0, "kernel_size": [3],
                    "kernel_list": ["iso"], "kernel_prob": [1.0],
                    "sigma_x": [0.4, 1.0], "sigma_y": [0.4, 1.0],
                    "rotate_angle": [-3.14, 3.14]}}
    kw = dict(num_frame=3, gt_size=32, use_hflip=True, use_rot=True,
              val_partition="none", degradation_1=deg, seed=5)
    ds_disk = RealVSRRecurrentDataset(str(root), **kw)
    ds_pack = RealVSRRecurrentDataset(str(root), packed_root=str(tmp_path / "pk"),
                                      **kw)
    for idx in range(2):
        a = ds_disk[idx]
        b = ds_pack[idx]
        np.testing.assert_allclose(b["gts"], a["gts"], atol=1e-6)
        np.testing.assert_allclose(b["lqs"], a["lqs"], atol=1e-6)
        assert a["clip"] == b["clip"]
