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
