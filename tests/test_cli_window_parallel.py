"""infer CLI --window-parallel: grouped consecutive windows restore over
the virtual device mesh and write the same file set as sequential mode."""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def test_infer_cli_window_parallel_tiny(tmp_path):
    from mgldvsr_tpu.cli.infer import main

    seqs = str(tmp_path / "lq")
    out = str(tmp_path / "out")
    d = os.path.join(seqs, "seq0")
    os.makedirs(d)
    rs = np.random.RandomState(0)
    for i in range(10):  # 2 windows of num_frames=5
        cv2.imwrite(os.path.join(d, f"{i:08d}.png"),
                    rs.randint(0, 255, (16, 16, 3), np.uint8))
    main(["--seqs-path", seqs, "--out-path", out, "--preset", "tiny",
          "--ddpm-steps", "2", "--size", "64", "--no-bf16",
          "--window-parallel"])
    files = sorted(os.listdir(os.path.join(out, "seq0")))
    assert len(files) == 10
    img = cv2.imread(os.path.join(out, "seq0", files[0]))
    assert img.shape == (64, 64, 3)
    assert img.std() > 0  # not a constant frame


def test_infer_cli_window_batch_tiny(tmp_path):
    """--window-batch N: single-device batched windows write the same file
    set as sequential mode (12 frames -> one 2-window batch + remainder)."""
    from mgldvsr_tpu.cli.infer import main

    seqs = str(tmp_path / "lq")
    out = str(tmp_path / "out")
    d = os.path.join(seqs, "seq0")
    os.makedirs(d)
    rs = np.random.RandomState(1)
    for i in range(15):  # 3 windows of num_frames=5 -> batch of 2 + single
        cv2.imwrite(os.path.join(d, f"{i:08d}.png"),
                    rs.randint(0, 255, (16, 16, 3), np.uint8))
    main(["--seqs-path", seqs, "--out-path", out, "--preset", "tiny",
          "--ddpm-steps", "2", "--size", "64", "--no-bf16",
          "--window-batch", "2"])
    files = sorted(os.listdir(os.path.join(out, "seq0")))
    assert len(files) == 15
    img = cv2.imread(os.path.join(out, "seq0", files[0]))
    assert img.shape == (64, 64, 3)
    assert img.std() > 0
