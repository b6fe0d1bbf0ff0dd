"""End-to-end CLI smoke tests on tiny presets (random weights, CPU)."""
import os

import cv2
import numpy as np
import pytest


def _write_seq(root, clip="seq0", n=5, size=16):
    d = os.path.join(root, clip)
    os.makedirs(d, exist_ok=True)
    rs = np.random.RandomState(0)
    for i in range(n):
        cv2.imwrite(os.path.join(d, f"{i:08d}.png"),
                    rs.randint(0, 255, (size, size, 3), np.uint8))


def test_infer_cli_fixed_tiny(tmp_path):
    from mgldvsr_tpu.cli.infer import main

    seqs = str(tmp_path / "lq")
    out = str(tmp_path / "out")
    _write_seq(seqs)
    main(["--seqs-path", seqs, "--out-path", out, "--preset", "tiny",
          "--ddpm-steps", "2", "--size", "64", "--no-bf16"])
    files = sorted(os.listdir(os.path.join(out, "seq0")))
    assert len(files) == 5
    img = cv2.imread(os.path.join(out, "seq0", files[0]))
    assert img.shape == (64, 64, 3)  # x4 of 16px input


def test_infer_cli_latent_dump_tiny(tmp_path):
    from mgldvsr_tpu.cli.infer import main

    seqs = str(tmp_path / "lq")
    out = str(tmp_path / "out")
    _write_seq(seqs)
    main(["--seqs-path", seqs, "--out-path", out, "--preset", "tiny",
          "--mode", "latent", "--ddpm-steps", "2", "--size", "64",
          "--no-bf16"])
    files = os.listdir(os.path.join(out, "seq0"))
    pngs = [f for f in files if f.endswith(".png")]
    npys = [f for f in files if f.endswith(".npy")]
    assert len(pngs) == 5 and len(npys) == 5
    lat = np.load(os.path.join(out, "seq0", npys[0]))
    assert lat.shape[-1] == 4 and np.isfinite(lat).all()
