"""Stock text2img surface: plain UNetModel oracle, HF CLIP text oracle,
DDIM inversion, and the Text2ImgPipeline end-to-end on tiny shapes.

Covers the reference components kept for its image-LDM surface:
LatentDiffusion (ddpm.py:558-1550), ddpm_inv.py (inversion capability),
FrozenCLIPEmbedder (encoders/modules.py:202-230).
"""
import os
import sys

import numpy as np
import pytest

_HERE = os.path.dirname(os.path.abspath(__file__))
_REF = "/root/reference"
for _p in (os.path.join(_HERE, "ref_shims"), _REF):
    if _p not in sys.path:
        sys.path.insert(0, _p)

import jax
import jax.numpy as jnp

from mgldvsr_tpu.core.samplers import ddim_invert, ddim_sample
from mgldvsr_tpu.core.schedules import DiffusionSchedule
from mgldvsr_tpu.io import ckpt_convert as cc


def _tiny_cfg():
    from mgldvsr_tpu.infer.txt2img import Text2ImgConfig
    from mgldvsr_tpu.models.cliptext import CLIPTextConfig
    from mgldvsr_tpu.models.unet import UNetConfig
    from mgldvsr_tpu.models.vae import VAEConfig

    return Text2ImgConfig(
        timesteps=100,
        unet=UNetConfig(
            model_channels=32, num_head_channels=16, context_dim=32,
            semb_channels=32, channel_mult=(1, 2),
            attention_resolutions=(1, 2), num_frames=1,
            use_temporal=False, use_spade=False,
        ),
        vae=VAEConfig(ch=32, ch_mult=(1, 1, 2, 2), num_res_blocks=1,
                      num_frames=1, enable_fusion=False),
        clip=CLIPTextConfig(width=32, heads=2, layers=2, context_length=8,
                            vocab_size=64),
    )


def test_txt2img_pipeline_end_to_end():
    from mgldvsr_tpu.infer.txt2img import Text2ImgPipeline

    cfg = _tiny_cfg()
    pipe = Text2ImgPipeline(cfg)
    params = pipe.init_params(jax.random.PRNGKey(0), 64, 64)
    # At init the transformer blocks' proj_out is zero (SD zero_module
    # semantics) so cross-attention is identity and context has no effect;
    # perturb all params so the CFG branch is actually exercised.
    leaves, treedef = jax.tree.flatten(params["unet"])
    keys = jax.random.split(jax.random.PRNGKey(9), len(leaves))
    params["unet"] = jax.tree.unflatten(treedef, [
        p + 0.05 * jax.random.normal(k, p.shape, p.dtype)
        for p, k in zip(leaves, keys)])
    tokens = jnp.zeros((2, 8), jnp.int32).at[:, 0].set(5).at[:, 1].set(7)
    un_tokens = jnp.zeros((2, 8), jnp.int32)

    img = pipe.generate(params, tokens, jax.random.PRNGKey(1),
                        height=64, width=64, num_steps=4)
    assert img.shape == (2, 64, 64, 3)
    assert np.isfinite(np.asarray(img)).all()

    # classifier-free guidance changes the trajectory
    img_cfg = pipe.generate(params, tokens, jax.random.PRNGKey(1),
                            uncond_tokens=un_tokens, cfg_scale=3.0,
                            height=64, width=64, num_steps=4)
    assert not np.allclose(np.asarray(img), np.asarray(img_cfg))

    # PLMS path runs
    img_plms = pipe.generate(params, tokens, jax.random.PRNGKey(1),
                             height=64, width=64, num_steps=4,
                             sampler="plms")
    assert np.isfinite(np.asarray(img_plms)).all()


def test_ddim_invert_roundtrip():
    """With a fixed denoiser, ddim_sample(ddim_invert(x0)) ~= x0: inversion
    reverses the deterministic DDIM ODE up to discretization error."""
    sched = DiffusionSchedule.create(timesteps=100, linear_start=0.00085,
                                     linear_end=0.012)
    rs = np.random.RandomState(0)
    w = jnp.asarray(rs.standard_normal((4, 4)) * 0.05, jnp.float32)

    def denoise_fn(x, tb):
        # mildly x- and t-dependent linear eps model
        tt = (tb.astype(jnp.float32) / 100.0)[:, None, None, None]
        return x @ w + 0.1 * tt

    x0 = jnp.asarray(rs.standard_normal((2, 8, 8, 4)), jnp.float32)
    x_T = ddim_invert(sched, denoise_fn, x0, num_steps=50)
    # inversion should actually add noise-scale structure
    assert float(jnp.abs(x_T).mean()) > 0.1
    x0_rec = ddim_sample(sched, denoise_fn, x_T, jax.random.PRNGKey(0),
                         num_steps=50, eta=0.0)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=0.05)


def test_noisy_latent_classifier():
    from mgldvsr_tpu.models.classifier import (
        ClassifierConfig,
        NoisyLatentClassifier,
    )

    x = jnp.asarray(np.random.RandomState(0).standard_normal((2, 16, 16, 4)),
                    jnp.float32)
    ts = jnp.asarray([3, 77], jnp.int32)
    for pool in ("attention", "adaptive", "spatial"):
        cfg = ClassifierConfig(model_channels=32, num_classes=10,
                               channel_mult=(1, 2), num_res_blocks=1,
                               attention_resolutions=(2,), pool=pool)
        model = NoisyLatentClassifier(cfg)
        params = model.init(jax.random.PRNGKey(0), x, ts)
        logits = model.apply(params, x, ts)
        assert logits.shape == (2, 10)
        assert np.isfinite(np.asarray(logits)).all()
        # gradient flows to the input (usable for classifier guidance)
        g = jax.grad(
            lambda z: model.apply(params, z, ts)[:, 0].sum())(x)
        assert float(jnp.abs(g).max()) > 0


@pytest.mark.skipif(not os.path.isdir(_REF), reason="reference not present")
def test_stock_unet_model_oracle():
    """Our use_spade=False/use_temporal=False UNet matches the reference's
    stock UNetModel (openaimodel.py:650-980) through convert_unet."""
    import torch

    from tests.test_ref_oracle import nchw, nhwc, randomize

    from ldm.modules.diffusionmodules.openaimodel import UNetModel

    from mgldvsr_tpu.models.unet import InflatedUNetDualCond, UNetConfig

    hw, ctx_dim = 16, 32
    ref = UNetModel(
        image_size=hw, in_channels=4, model_channels=32, out_channels=4,
        num_res_blocks=2, attention_resolutions=[1, 2], channel_mult=[1, 2],
        num_head_channels=16, use_spatial_transformer=True,
        transformer_depth=1, context_dim=ctx_dim, legacy=False,
    )  # old-lineage UNetModel: conv-projection SpatialTransformer
    sd = randomize(ref, 7)

    rs = np.random.RandomState(3)
    x = rs.standard_normal((2, hw, hw, 4)).astype(np.float32)
    ts = np.array([311, 47], dtype=np.int64)
    ctx = rs.standard_normal((2, 7, ctx_dim)).astype(np.float32)

    with torch.no_grad():
        out_ref = ref(nchw(x), torch.from_numpy(ts), torch.from_numpy(ctx))

    used = set()
    params = cc.convert_unet(
        sd, prefix="", channel_mult=(1, 2), num_res_blocks=2,
        attention_resolutions=(1, 2), used=used, dual=False, temporal=False,
    )
    assert used == set(sd), sorted(set(sd) - used)[:5]
    cfg = UNetConfig(
        model_channels=32, num_head_channels=16, context_dim=ctx_dim,
        semb_channels=32, channel_mult=(1, 2), attention_resolutions=(1, 2),
        num_frames=1, use_temporal=False, use_spade=False,
        use_linear_in_transformer=False,
    )
    ours = InflatedUNetDualCond(cfg).apply(
        cc.to_jax(params), jnp.asarray(x), jnp.asarray(ts),
        jnp.asarray(ctx), None,
    )
    np.testing.assert_allclose(np.asarray(ours), nhwc(out_ref), atol=3e-4)


def test_hf_clip_text_oracle():
    """FrozenCLIPEmbedder tower: transformers CLIPTextModel (tiny config,
    random weights) matches our encoder through convert_hf_clip_text."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    from mgldvsr_tpu.models.cliptext import CLIPTextConfig, OpenCLIPTextEncoder

    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=64, hidden_size=32, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=8, hidden_act="quick_gelu",
    )
    ref = transformers.CLIPTextModel(hf_cfg).eval()
    sd = ref.state_dict()  # keys already carry the text_model prefix

    tokens = np.array([[5, 9, 3, 0, 0, 0, 0, 2],
                       [1, 2, 3, 4, 5, 6, 7, 8]], dtype=np.int64)
    with torch.no_grad():
        out_ref = ref(input_ids=torch.from_numpy(tokens)).last_hidden_state

    used = set()
    params = cc.convert_hf_clip_text(sd, prefix="", layers=2,
                                     penultimate=False, used=used)
    unused = {k for k in set(sd) - used
              if "position_ids" not in k and "embeddings.position_ids" not in k}
    assert not unused, sorted(unused)[:5]

    cfg = CLIPTextConfig(vocab_size=64, width=32, heads=2, layers=2,
                         context_length=8, layer="last", act="quick_gelu")
    ours = OpenCLIPTextEncoder(cfg).apply(cc.to_jax(params),
                                          jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), out_ref.numpy(), atol=2e-5)
