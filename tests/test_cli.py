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


def test_prepare_data_sub_images(tmp_path):
    from mgldvsr_tpu.cli.prepare_data import main

    src = tmp_path / "gt" / "clip0"
    os.makedirs(src)
    rs = np.random.RandomState(0)
    cv2.imwrite(str(src / "frame0.png"),
                rs.randint(0, 255, (100, 130, 3), np.uint8))
    out = str(tmp_path / "sub")
    meta = str(tmp_path / "meta.txt")
    main(["--input", str(tmp_path / "gt"), "--output", out,
          "--crop-size", "64", "--step", "32", "--thresh-size", "8",
          "--workers", "1", "--meta-info", meta])
    names = sorted(os.listdir(os.path.join(out, "clip0")))
    # rows: starts 0, 32 (remainder 4 <= 8); cols: 0, 32, 64 (remainder 2)
    assert len(names) == 2 * 3
    img = cv2.imread(os.path.join(out, "clip0", names[0]))
    assert img.shape == (64, 64, 3)
    lines = open(meta).read().strip().splitlines()
    assert len(lines) == 6 and lines[0].startswith("clip0/")

    # flush-right window appears when the remainder exceeds the threshold
    from mgldvsr_tpu.cli.prepare_data import _crop_positions

    assert _crop_positions(100, 64, 32, 3) == [0, 32, 36]
    assert _crop_positions(100, 64, 32, 8) == [0, 32]
    assert _crop_positions(50, 64, 32, 8) == [0]


def test_latent_dump_feeds_stage2_pipeline(tmp_path):
    """Integration of the two-stage data contract: the CLI latent-dump run
    (w_latent protocol) produces outputs + .npy latents that
    REDSAutoencoderDataset can window and the stage-2 VAE trainer can
    consume for a real train step."""
    import jax
    import jax.numpy as jnp

    from mgldvsr_tpu.cli.infer import main
    from mgldvsr_tpu.data.datasets import REDSAutoencoderDataset
    from mgldvsr_tpu.models.vae import VAEConfig
    from mgldvsr_tpu.train.stage2 import Stage2Config, Stage2Trainer

    lq_root = str(tmp_path / "lq")
    out = str(tmp_path / "out")
    _write_seq(lq_root, n=5, size=16)
    main(["--seqs-path", lq_root, "--out-path", out, "--preset", "tiny",
          "--mode", "latent", "--ddpm-steps", "2", "--size", "64",
          "--no-bf16"])

    ds = REDSAutoencoderDataset(
        dataroot_gt=out, dataroot_lq=lq_root, dataroot_latent=out,
        dataroot_sample=out, num_frame=5)
    assert len(ds) == 1
    item = ds[0]
    assert item["gts"].shape == (5, 64, 64, 3)
    assert item["lqs"].shape == (5, 16, 16, 3)
    assert item["lts"].shape[0] == 5 and item["lts"].shape[-1] == 4
    assert item["sps"].shape == (5, 64, 64, 3)

    vae_cfg = VAEConfig(ch=32, ch_mult=(1, 1, 2, 2), num_res_blocks=1,
                        num_frames=5, enable_fusion=True, num_fuse_block=1)
    trainer = Stage2Trainer(vae_cfg, Stage2Config(disc_start=0))
    state = trainer.init_state(jax.random.PRNGKey(0), 64, 64)
    from mgldvsr_tpu.infer.pipeline import upscale_frames

    lq_up = upscale_frames(jnp.asarray(item["lqs"]), 4)
    new_state, metrics = jax.jit(trainer.train_step)(
        state, lq_up, jnp.asarray(item["gts"]),
        jnp.asarray(item["lts"]), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["rec_loss"]))


def test_train_cli_stage1_tiny_two_steps(tmp_path):
    """Stage-1 training CLI end-to-end: on-the-fly degradations, jitted
    train step, JSONL metrics, and an orbax checkpoint on disk."""
    import json

    from mgldvsr_tpu.cli.train import main

    gt_root = tmp_path / "gt"
    for clip in ("c0",):
        d = gt_root / clip
        os.makedirs(d)
        rs = np.random.RandomState(0)
        for i in range(6):
            cv2.imwrite(str(d / f"{i:08d}.png"),
                        rs.randint(0, 255, (48, 48, 3), np.uint8))
    logdir = str(tmp_path / "run")
    main(["--stage", "1", "--data-root", str(gt_root), "--logdir", logdir,
          "--max-steps", "2", "--tiny", "--grad-accum", "1",
          "--ckpt-every", "1", "--log-every", "1", "--image-every", "1",
          "--sample-rows"])
    lines = [json.loads(l) for l in
             open(os.path.join(logdir, "metrics.jsonl"))]
    assert lines and np.isfinite(lines[-1]["loss"])
    assert os.path.isdir(os.path.join(logdir, "ckpt"))
    ckpts = os.listdir(os.path.join(logdir, "ckpt"))
    assert any(c.isdigit() or c.startswith(("1", "2")) for c in ckpts)
    # tensorboard event file with scalar records
    tbdir = os.path.join(logdir, "tb")
    events = [f for f in os.listdir(tbdir) if f.startswith("events.out")]
    assert events, "no tfevents file written"
    from tests.test_runtime_utils import read_tfevents

    recs = read_tfevents(os.path.join(tbdir, events[0]))
    assert any(t == "loss" for t, _, _ in recs["scalars"]), recs["scalars"][:3]
    assert recs["images"], "no image summaries logged"
    # reference-style sampler rows rendered as PNG grids
    imgdir = os.path.join(logdir, "images", "train")
    names = os.listdir(imgdir)
    for row in ("samples", "reconstruction", "denoise_row", "inputs"):
        assert any(n.startswith(row) for n in names), (row, names)


def test_train_cli_stage2_tiny_one_step(tmp_path):
    """Stage-2 training CLI end-to-end on latent-dump-produced data:
    quadruple dataset -> jitted two-optimizer GAN step -> checkpoint."""
    import json

    from mgldvsr_tpu.cli.infer import main as infer_main
    from mgldvsr_tpu.cli.train import main as train_main

    lq_root = str(tmp_path / "lq")
    out = str(tmp_path / "out")
    _write_seq(lq_root, n=5, size=8)
    infer_main(["--seqs-path", lq_root, "--out-path", out, "--preset",
                "tiny", "--mode", "latent", "--ddpm-steps", "1",
                "--size", "32", "--no-bf16"])
    logdir = str(tmp_path / "run2")
    train_main(["--stage", "2", "--data-root", out, "--lq-root", lq_root,
                "--latent-root", out, "--logdir", logdir,
                "--max-steps", "1", "--tiny", "--grad-accum", "1",
                "--ckpt-every", "1", "--log-every", "1"])
    lines = [json.loads(l) for l in
             open(os.path.join(logdir, "metrics.jsonl"))]
    assert lines
    assert os.path.isdir(os.path.join(logdir, "ckpt"))
    # --split-step (the 512px single-chip fit lever: three jitted
    # programs, identical math) must produce the same metric keys and a
    # matching loss on the identical data/seed/state
    logdir_s = str(tmp_path / "run2s")
    train_main(["--stage", "2", "--data-root", out, "--lq-root", lq_root,
                "--latent-root", out, "--logdir", logdir_s,
                "--max-steps", "1", "--tiny", "--grad-accum", "1",
                "--ckpt-every", "1", "--log-every", "1", "--split-step"])
    lines_s = [json.loads(l) for l in
               open(os.path.join(logdir_s, "metrics.jsonl"))]
    assert set(lines_s[0]) == set(lines[0])
    import numpy as np

    np.testing.assert_allclose(lines_s[0]["loss_g"], lines[0]["loss_g"],
                               rtol=2e-4)


def test_infer_cli_tile_tiny(tmp_path):
    """oldcanvas_tile protocol through the CLI: 16px input, min-side 64
    -> 64px working frame, one 64px patch, canvas tile 8 (latent) — output
    is x4 of the input (no pad, upsample == sf so no downscale quirk)."""
    from mgldvsr_tpu.cli.infer import main

    seqs = str(tmp_path / "lq")
    out = str(tmp_path / "out")
    _write_seq(seqs)
    main(["--seqs-path", seqs, "--out-path", out, "--preset", "tiny",
          "--mode", "tile", "--ddpm-steps", "2", "--size", "64",
          "--min-side", "64", "--vqgantile-size", "64",
          "--vqgantile-stride", "48", "--no-bf16"])
    files = sorted(os.listdir(os.path.join(out, "seq0")))
    assert len(files) == 5
    img = cv2.imread(os.path.join(out, "seq0", files[0]))
    assert img.shape == (64, 64, 3)
