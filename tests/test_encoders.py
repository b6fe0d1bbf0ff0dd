"""Tests for the alternate-encoder zoo, textual inversion, DEResNet, and
the BSRGAN degradation chain (SURVEY §2.5 alternates, §2.12 degradat_arch /
embedding_manager / image_degradation rows).

Oracles import the ACTUAL reference code where it is importable in this
environment (bsrgan atoms via the albumentations shim, DEResNet via
basicsr, HF CLIPVisionModel for the ViT image tower); pure-shape tests
otherwise.
"""
import os
import sys

import numpy as np
import pytest

_HERE = os.path.dirname(os.path.abspath(__file__))
for _p in (os.path.join(_HERE, "ref_shims"), "/root/reference"):
    if _p not in sys.path:
        sys.path.insert(0, _p)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mgldvsr_tpu.io import ckpt_convert as cc  # noqa: E402
from mgldvsr_tpu.models.encoders import (  # noqa: E402
    CLIPImageConfig,
    CLIPImageEncoder,
    ClassEmbedder,
    FrozenClipImageEmbedder,
    SpatialRescaler,
    TransformerTextConfig,
    TransformerTextEmbedder,
    clip_preprocess,
)
from mgldvsr_tpu.models import textual_inversion as ti  # noqa: E402


def test_class_embedder():
    m = ClassEmbedder(embed_dim=64, n_classes=10)
    ids = jnp.array([1, 7, 3])
    p = m.init(jax.random.PRNGKey(0), ids)
    out = m.apply(p, ids)
    assert out.shape == (3, 1, 64)
    # same id -> same token
    out2 = m.apply(p, jnp.array([7, 7, 7]))
    np.testing.assert_allclose(out2[0], out2[1])


def test_transformer_text_embedder():
    cfg = TransformerTextConfig(vocab_size=100, width=32, depth=2, heads=2,
                                max_seq_len=16)
    m = TransformerTextEmbedder(cfg)
    toks = jnp.arange(32, dtype=jnp.int32).reshape(2, 16) % 100
    p = m.init(jax.random.PRNGKey(0), toks)
    z = m.apply(p, toks)
    assert z.shape == (2, 16, 32)
    assert np.isfinite(np.asarray(z)).all()
    # bidirectional: flipping a late token changes early positions
    toks2 = toks.at[0, 15].set(99)
    z2 = m.apply(p, toks2)
    assert np.abs(np.asarray(z2[0, 0] - z[0, 0])).max() > 1e-6


def test_spatial_rescaler():
    x = jnp.ones((1, 16, 16, 3))
    m = SpatialRescaler(n_stages=2, multiplier=0.5, out_channels=8)
    p = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(p, x)
    assert y.shape == (1, 4, 4, 8)


def test_clip_image_encoder_hf_oracle():
    """ViT image tower vs the actual HuggingFace CLIPVisionModel at a tiny
    config, weights mapped through convert_hf_clip_vision."""
    torch = pytest.importorskip("torch")
    from transformers import CLIPVisionConfig, CLIPVisionModel

    hf_cfg = CLIPVisionConfig(
        hidden_size=32, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=2, image_size=28, patch_size=14,
        hidden_act="quick_gelu", attention_dropout=0.0)
    with torch.no_grad():
        ref = CLIPVisionModel(hf_cfg).eval()
        sd = ref.state_dict()
        used = set()
        params = cc.convert_hf_clip_vision(sd, layers=2, used=used)
        assert not (set(sd.keys()) - used -
                    {k for k in sd if "position_ids" in k})

        x = torch.randn(2, 3, 28, 28)
        pooled_ref = ref(pixel_values=x).pooler_output.numpy()

    ours = CLIPImageEncoder(CLIPImageConfig(
        image_size=28, patch_size=14, width=32, heads=2, layers=2,
        output_dim=None, act="quick_gelu"))
    x_nhwc = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    pooled = ours.apply(params, x_nhwc)
    np.testing.assert_allclose(np.asarray(pooled), pooled_ref,
                               atol=2e-4, rtol=2e-3)


def test_clip_image_openai_layout_roundtrip():
    """convert_clip_image consumes a synthetic OpenAI-`clip.visual` state
    dict and produces exactly our parameter tree."""
    cfg = CLIPImageConfig(image_size=28, patch_size=14, width=32, heads=2,
                          layers=2, output_dim=16)
    m = FrozenClipImageEmbedder(cfg)
    rng = np.random.default_rng(0)
    sd = {
        "visual.conv1.weight": rng.normal(size=(32, 3, 14, 14)),
        "visual.class_embedding": rng.normal(size=(32,)),
        "visual.positional_embedding": rng.normal(size=(5, 32)),
        "visual.ln_pre.weight": np.ones(32), "visual.ln_pre.bias": np.zeros(32),
        "visual.ln_post.weight": np.ones(32), "visual.ln_post.bias": np.zeros(32),
        "visual.proj": rng.normal(size=(32, 16)),
    }
    for i in range(2):
        p = f"visual.transformer.resblocks.{i}"
        sd.update({
            f"{p}.ln_1.weight": np.ones(32), f"{p}.ln_1.bias": np.zeros(32),
            f"{p}.ln_2.weight": np.ones(32), f"{p}.ln_2.bias": np.zeros(32),
            f"{p}.attn.in_proj_weight": rng.normal(size=(96, 32)),
            f"{p}.attn.in_proj_bias": rng.normal(size=(96,)),
            f"{p}.attn.out_proj.weight": rng.normal(size=(32, 32)),
            f"{p}.attn.out_proj.bias": rng.normal(size=(32,)),
            f"{p}.mlp.c_fc.weight": rng.normal(size=(128, 32)),
            f"{p}.mlp.c_fc.bias": rng.normal(size=(128,)),
            f"{p}.mlp.c_proj.weight": rng.normal(size=(32, 128)),
            f"{p}.mlp.c_proj.bias": rng.normal(size=(32,)),
        })
    used = set()
    vis_params = cc.convert_clip_image(sd, layers=2, used=used)
    assert used == set(sd.keys())
    # compose into the embedder's tree (visual submodule + projection Dense)
    imgs = jnp.asarray(rng.uniform(-1, 1, size=(1, 28, 28, 3)), jnp.float32)
    init = m.init(jax.random.PRNGKey(0), imgs)
    tree = {"params": {"visual": vis_params["params"]}}
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape,
                                        init["params"]["visual"])
    got_shapes = jax.tree_util.tree_map(lambda a: a.shape,
                                        tree["params"]["visual"])
    assert ref_shapes == got_shapes
    out = m.apply(init, imgs)
    assert out.shape == (1, 16)


def test_clip_preprocess_range():
    x = jnp.zeros((1, 8, 8, 3))  # mid-gray in [-1,1]
    y = clip_preprocess(x, size=8, resize=False)
    expect = (0.5 - np.array([0.48145466, 0.4578275, 0.40821073])) / np.array(
        [0.26862954, 0.26130258, 0.27577711])
    np.testing.assert_allclose(np.asarray(y[0, 0, 0]), expect, atol=1e-6)


# ---------------------------------------------------------------------------
# textual inversion (embedding_manager parity)
# ---------------------------------------------------------------------------


def test_textual_inversion_single_vector():
    tokens = jnp.array([[1, 5, 2, 0], [5, 5, 3, 0]])
    embedded = jnp.zeros((2, 4, 8))
    ph = {"*": 5}
    params = ti.init_placeholder_params(ph, token_dim=8, seed=1)
    out = ti.apply_single_vector(params, ph, tokens, embedded)
    row = np.asarray(params["*"][0])
    np.testing.assert_allclose(np.asarray(out[0, 1]), row)
    np.testing.assert_allclose(np.asarray(out[1, 0]), row)
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.zeros(8))
    # differentiable wrt the learned rows
    g = jax.grad(lambda p: ti.apply_single_vector(
        p, ph, tokens, embedded).sum())(params)
    assert np.abs(np.asarray(g["*"])).max() > 0


def test_textual_inversion_multi_vector():
    """Multi-vector semantics of embedding_manager.py:111-128: each
    occurrence expands to N consecutive rows, row truncated to length."""
    n_vec, dim = 2, 4
    params = {"*": jnp.arange(n_vec * dim, dtype=jnp.float32
                              ).reshape(n_vec, dim) + 100}
    ph = {"*": 9}
    tokens = np.array([[1, 9, 2, 3]])
    embedded = np.broadcast_to(
        np.arange(4, dtype=np.float32)[None, :, None], (1, 4, dim)).copy()
    new_tok, new_emb = ti.expand_multi_vector(params, ph, tokens, embedded)
    # [1, 9, 9, 2] after inserting 2 rows at col 1 and truncating
    np.testing.assert_array_equal(new_tok[0], [1, 9, 9, 2])
    block = np.asarray(params["*"])
    np.testing.assert_allclose(new_emb[0, 1], block[0])
    np.testing.assert_allclose(new_emb[0, 2], block[1])
    np.testing.assert_allclose(new_emb[0, 3], embedded[0, 2])

    # regularizers
    norms = ti.embedding_norms_squared(params)
    assert norms.shape == (n_vec,)
    loss = ti.coarse_init_loss(params, {"*": np.zeros((n_vec, dim))})
    assert float(loss) > 0


# ---------------------------------------------------------------------------
# DEResNet (degradat_arch)
# ---------------------------------------------------------------------------


def test_deresnet_oracle():
    torch = pytest.importorskip("torch")
    from basicsr.archs.degradat_arch import DEResNet as RefDE

    from mgldvsr_tpu.models.heritage.misc_archs import DEResNet

    feats, blocks, downs = [8, 16], [1, 1], [2, 1]
    with torch.no_grad():
        ref = RefDE(num_in_ch=3, num_degradation=2,
                    num_feats=feats, num_blocks=blocks,
                    downscales=downs).eval()
        sd = ref.state_dict()
        x = torch.randn(2, 3, 16, 16)
        ref_out = [o.numpy() for o in ref(x)]
    used = set()
    params = cc.convert_deresnet(sd, num_degradation=2, num_feats=feats,
                                 num_blocks=blocks, downscales=downs,
                                 used=used)
    assert used == set(sd.keys())
    ours = DEResNet(num_degradation=2, num_feats=tuple(feats),
                    num_blocks=tuple(blocks), downscales=tuple(downs))
    out = ours.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    for o_ref, o_ours in zip(ref_out, out):
        np.testing.assert_allclose(np.asarray(o_ours), o_ref,
                                   atol=1e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# BSRGAN degradation chain
# ---------------------------------------------------------------------------


def _ref_bsrgan():
    pytest.importorskip("torch")
    try:
        import ldm.modules.image_degradation.bsrgan as refbsr
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference bsrgan unimportable: {e}")
    # the reference predates scipy's removal of the numpy aliases
    # (scipy.finfo) — re-bind its module-level `scipy` name to numpy,
    # which provides the identical finfo API
    refbsr.scipy = np
    return refbsr


def test_bsrgan_kernel_atoms_oracle():
    refbsr = _ref_bsrgan()
    from mgldvsr_tpu.data import bsrgan as ours

    k1 = ours.anisotropic_gaussian_kernel(15, 0.7, 4.0, 1.5)
    k2 = refbsr.anisotropic_Gaussian(15, 0.7, 4.0, 1.5)
    np.testing.assert_allclose(k1, k2, atol=1e-10)

    f1 = ours.fspecial_gaussian(25, 1.3)
    f2 = refbsr.fspecial("gaussian", 25, 1.3)
    np.testing.assert_allclose(f1, f2, atol=1e-12)


def test_bsrgan_shift_pixel_oracle():
    refbsr = _ref_bsrgan()
    from mgldvsr_tpu.data import bsrgan as ours

    k = ours.fspecial_gaussian(25, 1.1)
    got = ours.shift_pixel(k.copy(), 4)
    # the reference calls the removed scipy interp2d; re-bind it to the
    # linear-spline replacement so its own code path runs
    from scipy.interpolate import RectBivariateSpline
    refbsr.interp2d = lambda xv, yv, z: (
        lambda x1, y1: RectBivariateSpline(yv, xv, z, kx=1, ky=1)(y1, x1))
    want = refbsr.shift_pixel(k.copy(), 4)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_bsrgan_pipelines_run():
    from mgldvsr_tpu.data.bsrgan import (
        degradation_bsrgan,
        degradation_bsrgan_light,
    )

    img = np.random.default_rng(0).random((320, 320, 3)).astype(np.float32)
    for seed in range(4):  # walk different shuffle orders/branches
        lq, hq = degradation_bsrgan(img, np.random.default_rng(seed),
                                    sf=4, lq_patchsize=72)
        assert lq.shape == (72, 72, 3) and hq.shape == (288, 288, 3)
        assert lq.min() >= 0 and lq.max() <= 1
    lq, hq = degradation_bsrgan_light(img, np.random.default_rng(9), sf=4)
    assert lq.shape == (80, 80, 3) and hq.shape == (320, 320, 3)
