"""--mesh training path: the train CLI shards the step over the virtual
8-device ('data','tensor') mesh — one clip per data slot, tensor-split
weights — and produces finite metrics + a checkpoint."""
import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def _write_clips(root, clips=("004", "007"), n=8, size=(48, 64)):
    rng = np.random.RandomState(0)
    for clip in clips:
        d = os.path.join(root, clip)
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            cv2.imwrite(os.path.join(d, f"{i:08d}.png"),
                        rng.randint(0, 256, (*size, 3), np.uint8))


def test_train_cli_stage1_mesh_tiny(tmp_path):
    from mgldvsr_tpu.cli.train import main

    root = str(tmp_path / "gt")
    logdir = str(tmp_path / "run")
    _write_clips(root)
    main(["--stage", "1", "--data-root", root, "--logdir", logdir,
          "--tiny", "--mesh", "--tensor-parallel", "2", "--max-steps", "2",
          "--num-frames", "2", "--no-tb", "--log-every", "1"])
    lines = [json.loads(line) for line in
             open(os.path.join(logdir, "metrics.jsonl"))]
    assert lines and np.isfinite(lines[-1]["loss"])
    assert os.path.isdir(os.path.join(logdir, "ckpt"))


def test_batched_items_groups_clips():
    from mgldvsr_tpu.cli.train import batched_items

    items = [{"lqs": np.full((2, 4, 4, 3), i, np.float32), "clip": str(i)}
             for i in range(4)]
    out = list(batched_items(iter(items), 2))
    assert len(out) == 2
    assert out[0]["lqs"].shape == (4, 4, 4, 3)
    assert out[0]["lqs"][0, 0, 0, 0] == 0 and out[0]["lqs"][2, 0, 0, 0] == 1
    # passthrough when k=1
    out1 = list(batched_items(iter(items), 1))
    assert len(out1) == 4
