"""Runtime layer tests: config merge/overrides/registry, JSONL logging,
image grids, orbax checkpoint round trip, PCA feature dump."""
import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from mgldvsr_tpu.utils.config import (
    REGISTRY,
    apply_dotlist,
    instantiate,
    load_config,
    merge,
    register,
)
from mgldvsr_tpu.utils.logging import ImageLogger, MessageLogger, make_grid
from mgldvsr_tpu.utils.profiling import StepTimer, pca_components


def test_merge_and_dotlist():
    a = {"model": {"lr": 1e-4, "depth": 2}, "x": 1}
    b = {"model": {"lr": 5e-5}, "y": 2}
    m = merge(a, b)
    assert m["model"] == {"lr": 5e-5, "depth": 2}
    assert m["x"] == 1 and m["y"] == 2

    apply_dotlist(m, ["model.depth=4", "z.name=hello", "model.flag=True"])
    assert m["model"]["depth"] == 4
    assert m["z"]["name"] == "hello"
    assert m["model"]["flag"] is True


def test_yaml_config_and_registry(tmp_path):
    p1 = tmp_path / "base.yaml"
    p1.write_text("model:\n  lr: 0.001\ndata:\n  batch: 4\n")
    p2 = tmp_path / "override.yaml"
    p2.write_text("model:\n  lr: 0.0005\n")
    cfg = load_config([str(p1), str(p2)], ["data.batch=8"])
    assert cfg["model"]["lr"] == 0.0005
    assert cfg["data"]["batch"] == 8

    @register("test.adder")
    def adder(a, b=1):
        return a + b

    assert instantiate({"target": "test.adder", "params": {"a": 2}}) == 3
    with pytest.raises(KeyError):
        instantiate({"target": "nope.nothing"})
    # standard registrations exist
    assert "data.realvsr_recurrent" in REGISTRY
    assert "flow.raft" in REGISTRY


def test_message_logger_jsonl(tmp_path, capsys):
    path = str(tmp_path / "m.jsonl")
    log = MessageLogger(100, path, print_freq=2)
    log(1, {"loss": 0.5}, lr=1e-4)
    log(2, {"loss": 0.4}, lr=1e-4)
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["step"] == 1 and abs(lines[0]["loss"] - 0.5) < 1e-9
    out = capsys.readouterr().out
    assert "[2/100]" in out and "loss:0.4" in out


def test_image_logger_and_grid(tmp_path):
    imgs = np.random.RandomState(0).rand(3, 8, 8, 3).astype(np.float32)
    grid = make_grid(imgs, nrow=2)
    assert grid.ndim == 3 and grid.shape[-1] == 3

    lg = ImageLogger(str(tmp_path), every_n_steps=5)
    assert lg.should_log(10) and not lg.should_log(7)
    lg.log_images(10, {"inputs": imgs})
    assert os.path.exists(
        os.path.join(str(tmp_path), "images", "train",
                     "inputs_step00000010.png")
    )


def test_checkpoint_roundtrip(tmp_path):
    from mgldvsr_tpu.io.checkpoint import CheckpointManager

    state = {"w": jnp.arange(6.0).reshape(2, 3), "step": jnp.asarray(3)}
    mgr = CheckpointManager(str(tmp_path / "ck"), save_interval_steps=1)
    assert mgr.save(3, state)
    mgr.wait()
    assert mgr.latest_step() == 3
    restored = mgr.restore(template=state)
    assert np.allclose(np.asarray(restored["w"]), np.arange(6).reshape(2, 3))
    mgr.close()


def test_save_load_params(tmp_path):
    from mgldvsr_tpu.io.checkpoint import load_params, save_params

    params = {"a": jnp.ones((4,)), "nested": {"b": jnp.zeros((2, 2))}}
    path = str(tmp_path / "params")
    save_params(path, params)
    out = load_params(path, params)
    assert np.allclose(np.asarray(out["a"]), 1.0)


def test_pca_components_and_timer():
    f = np.random.RandomState(0).rand(8, 8, 16).astype(np.float32)
    p = pca_components(f, 3)
    assert p.shape == (8, 8, 3)

    t = StepTimer()
    t.start()
    t.stop(jnp.ones(()))
    assert t.best > 0


# --- tensorboard event writer ------------------------------------------------


def read_tfevents(path):
    """Independent tfevents reader: validates TFRecord masked-crc framing and
    decodes Event protos (scalars + image tags) with a minimal parser."""
    import struct

    from mgldvsr_tpu.utils import tb as tbmod

    scalars, images, version = [], [], None
    with open(path, "rb") as f:
        data = f.read()
    off = 0
    while off < len(data):
        (length,) = struct.unpack_from("<Q", data, off)
        (len_crc,) = struct.unpack_from("<I", data, off + 8)
        assert len_crc == tbmod._masked_crc(data[off:off + 8])
        payload = data[off + 12:off + 12 + length]
        (crc,) = struct.unpack_from("<I", data, off + 12 + length)
        assert crc == tbmod._masked_crc(payload)
        off += 12 + length + 4

        # parse Event fields
        p, step, summary = 0, None, None
        while p < len(payload):
            key = payload[p]
            field, wire = key >> 3, key & 7
            p += 1
            if wire == 0:
                v = 0
                shift = 0
                while True:
                    b = payload[p]
                    p += 1
                    v |= (b & 0x7F) << shift
                    shift += 7
                    if not b & 0x80:
                        break
                if field == 2:
                    step = v
            elif wire == 1:
                p += 8
            elif wire == 5:
                p += 4
            elif wire == 2:
                ln = 0
                shift = 0
                while True:
                    b = payload[p]
                    p += 1
                    ln |= (b & 0x7F) << shift
                    shift += 7
                    if not b & 0x80:
                        break
                chunk = payload[p:p + ln]
                p += ln
                if field == 3:
                    version = chunk.decode()
                elif field == 5:
                    summary = chunk
        if summary:
            # Summary: repeated Value field 1
            q = 0
            while q < len(summary):
                assert summary[q] == 0x0A  # field 1, wire 2
                q += 1
                ln = 0
                shift = 0
                while True:
                    b = summary[q]
                    q += 1
                    ln |= (b & 0x7F) << shift
                    shift += 7
                    if not b & 0x80:
                        break
                val = summary[q:q + ln]
                q += ln
                r, tag, simple, has_img = 0, None, None, False
                while r < len(val):
                    key = val[r]
                    field, wire = key >> 3, key & 7
                    r += 1
                    if wire == 2:
                        ln2 = 0
                        shift = 0
                        while True:
                            b = val[r]
                            r += 1
                            ln2 |= (b & 0x7F) << shift
                            shift += 7
                            if not b & 0x80:
                                break
                        if field == 1:
                            tag = val[r:r + ln2].decode()
                        elif field == 4:
                            has_img = True
                        r += ln2
                    elif wire == 5:
                        if field == 2:
                            (simple,) = struct.unpack_from("<f", val, r)
                        r += 4
                    elif wire == 0:
                        while val[r] & 0x80:
                            r += 1
                        r += 1
                    elif wire == 1:
                        r += 8
                if simple is not None:
                    scalars.append((tag, simple, step))
                if has_img:
                    images.append((tag, step))
    assert version == "brain.Event:2"
    return {"scalars": scalars, "images": images}


def test_tb_event_writer_roundtrip(tmp_path):
    from mgldvsr_tpu.utils.tb import TBEventWriter

    w = TBEventWriter(str(tmp_path))
    w.scalar("loss", 0.125, step=1)
    w.scalars({"a": 2.0, "vec": np.ones(3)}, step=2)  # non-scalars skipped
    w.image("grid", np.random.RandomState(0).rand(8, 10, 3), step=3)
    w.close()

    files = [f for f in os.listdir(tmp_path) if f.startswith("events.out")]
    assert len(files) == 1
    recs = read_tfevents(os.path.join(tmp_path, files[0]))
    assert ("loss", 0.125, 1) in recs["scalars"]
    assert ("a", 2.0, 2) in recs["scalars"]
    assert all(t != "vec" for t, _, _ in recs["scalars"])
    assert recs["images"] == [("grid", 3)]


def test_tb_png_fallback_decodes():
    """The pure-zlib PNG fallback must produce a decodable, pixel-exact
    image (checked with cv2 as the independent decoder)."""
    import cv2

    from mgldvsr_tpu.utils import tb as tbmod

    img = np.random.RandomState(1).rand(6, 7, 3).astype(np.float32)
    # force the fallback branch by hiding cv2 from the encoder
    import unittest.mock as mock

    with mock.patch.dict("sys.modules", {"cv2": None}):
        png = tbmod._png_encode(img)
    arr = cv2.imdecode(np.frombuffer(png, np.uint8), cv2.IMREAD_UNCHANGED)
    expect = (np.clip(img, 0, 1) * 255 + 0.5).astype(np.uint8)
    np.testing.assert_array_equal(arr[..., ::-1], expect)
