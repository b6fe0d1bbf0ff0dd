"""Shipped YAML configs: they load, build real PipelineConfigs, and the
CLIs' --config/--set wiring resolves precedence (flag > config > default)."""
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = os.path.join(REPO, "configs")


def test_config_files_exist():
    names = os.listdir(CFG)
    assert "mgldvsr_512_realbasicvsr_deg.yaml" in names
    assert "video_autoencoder_kl_64x64x4_resi.yaml" in names
    assert "infer_mgldvsr.yaml" in names


def test_stage1_config_builds_pipeline_config():
    import jax.numpy as jnp

    from mgldvsr_tpu.utils.config import load_config, pipeline_config_from_dict

    cfg = load_config([os.path.join(CFG, "mgldvsr_512_realbasicvsr_deg.yaml")])
    pc = pipeline_config_from_dict(cfg["model"])
    assert pc.num_frames == 5 and pc.ddpm_steps == 50
    assert pc.guidance_scale == -10.0
    assert pc.unet.dtype == jnp.bfloat16
    # degradation blocks carry the full recipe (spot-check a few constants)
    d1 = cfg["data"]["degradation_1"]
    assert d1["random_blur"]["params"]["kernel_size"][0] == 7
    assert d1["random_mpeg"]["params"]["codec"] == ["libx264", "h264",
                                                    "mpeg4"]
    assert d1["random_mpeg"]["params"]["bitrate"] == [1e4, 1e5]
    assert cfg["train"]["grad_accum"] == 4 and cfg["train"]["ckpt_every"] == 3000


def test_stage2_config():
    from mgldvsr_tpu.utils.config import load_config

    cfg = load_config(
        [os.path.join(CFG, "video_autoencoder_kl_64x64x4_resi.yaml")])
    assert cfg["train"]["stage"] == 2
    assert cfg["train"]["grad_accum"] == 8 and cfg["train"]["ckpt_every"] == 1500


def test_dotlist_override_and_build():
    from mgldvsr_tpu.utils.config import load_config, pipeline_config_from_dict

    cfg = load_config([os.path.join(CFG, "infer_mgldvsr.yaml")],
                      ["model.ddpm_steps=25", "model.unet.dtype=float32",
                       "infer.size=768"])
    pc = pipeline_config_from_dict(cfg["model"])
    import jax.numpy as jnp

    assert pc.ddpm_steps == 25
    assert pc.unet.dtype == jnp.float32
    assert cfg["infer"]["size"] == 768


def test_factory_defaults_survive_partial_subtrees():
    """A config that mentions a nested module must not reset the
    non-default values baked into PipelineConfig's factory defaults
    (VAEConfig(num_frames=5, enable_fusion=True))."""
    from mgldvsr_tpu.utils.config import load_config, pipeline_config_from_dict

    cfg = load_config(
        [os.path.join(CFG, "video_autoencoder_kl_64x64x4_resi.yaml")])
    pc = pipeline_config_from_dict(cfg["model"])
    assert pc.vae.num_frames == 5       # factory default survives
    assert pc.vae.enable_fusion is True
    # and the fully-implicit case
    pc2 = pipeline_config_from_dict({"ddpm_steps": 10})
    assert pc2.vae.num_frames == 5 and pc2.vae.enable_fusion is True


def test_num_frames_propagates_to_submodules():
    from mgldvsr_tpu.utils.config import pipeline_config_from_dict

    pc = pipeline_config_from_dict({"num_frames": 3})
    assert pc.num_frames == 3
    assert pc.unet.num_frames == 3
    assert pc.structcond.num_frames == 3
    assert pc.vae.num_frames == 3
    # explicit subtree value pins
    pc = pipeline_config_from_dict(
        {"num_frames": 3, "vae": {"num_frames": 1}})
    assert pc.vae.num_frames == 1 and pc.unet.num_frames == 3


def test_unknown_key_fails_loudly():
    from mgldvsr_tpu.utils.config import pipeline_config_from_dict

    with pytest.raises(KeyError, match="unknown config key"):
        pipeline_config_from_dict({"ddpm_stepz": 10})


def test_build_dataclass_tuple_coercion():
    from mgldvsr_tpu.models.unet import UNetConfig
    from mgldvsr_tpu.utils.config import build_dataclass

    c = build_dataclass(UNetConfig, {"channel_mult": [1, 2, 4]})
    assert c.channel_mult == (1, 2, 4)


def test_train_cli_config_precedence(tmp_path):
    """train config values become argparse defaults; explicit flags win."""
    import yaml

    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump(
        {"train": {"lr": 1e-3, "grad_accum": 7, "gt_size": 64}}))

    import argparse

    from mgldvsr_tpu.cli import train as train_cli

    # replicate the two-pass parse without running training
    captured = {}
    orig = argparse.ArgumentParser.parse_args

    def fake_parse(self, argv=None):
        ns = orig(self, argv)
        captured.update(vars(ns))
        raise SystemExit(0)  # stop before any jax import / training

    argparse.ArgumentParser.parse_args = fake_parse
    try:
        with pytest.raises(SystemExit):
            train_cli.main(["--config", str(p), "--data-root", "/none",
                            "--grad-accum", "2"])
    finally:
        argparse.ArgumentParser.parse_args = orig
    assert captured["lr"] == 1e-3          # from config
    assert captured["grad_accum"] == 2     # explicit flag wins
    assert captured["gt_size"] == 64       # from config


def test_infer_build_pipeline_from_model_cfg():
    """cli.infer.build_pipeline honors a config model subtree (tiny widths
    through the full-preset path) with CLI knobs taking precedence."""
    import argparse

    import jax.numpy as jnp

    from mgldvsr_tpu.cli.infer import build_pipeline

    model_cfg = {
        "ddpm_steps": 50,
        "unet": {"model_channels": 32, "num_head_channels": 16,
                 "context_dim": 32, "semb_channels": 32,
                 "channel_mult": [1, 2], "attention_resolutions": [1, 2]},
        "structcond": {"model_channels": 32, "out_channels": 32,
                       "channel_mult": [1, 1],
                       "attention_resolutions": [1, 2]},
        "vae": {"ch": 32, "ch_mult": [1, 1, 2, 2], "num_res_blocks": 1,
                "enable_fusion": True, "num_fuse_block": 1},
        "clip": {"width": 32, "heads": 2, "layers": 2},
        "raft": {"iters": 2},
    }
    args = argparse.Namespace(
        preset="full", bf16=False, ddpm_steps=4, guidance=-5.0, dec_w=0.5,
        colorfix="wavelet", model_cfg=model_cfg)
    pipe = build_pipeline(args)
    assert pipe.cfg.unet.model_channels == 32
    assert pipe.cfg.unet.channel_mult == (1, 2)
    assert pipe.cfg.ddpm_steps == 4          # CLI-resolved knob wins
    assert pipe.cfg.guidance_scale == -5.0
    assert pipe.cfg.unet.dtype == jnp.float32  # --no-bf16 forces fp32


def test_train_cli_unknown_train_key(tmp_path):
    import yaml

    from mgldvsr_tpu.cli import train as train_cli

    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump({"train": {"learning_rate_typo": 1e-3}}))
    with pytest.raises(KeyError, match="unknown keys"):
        train_cli.main(["--config", str(p), "--data-root", "/none"])
