"""Direct reference-module oracle tests.

These import the ACTUAL modules from /root/reference (via the minimal
dependency shims in tests/ref_shims: torchvision / mmcv / xformers), load
randomized weights into them, convert those weights through
``mgldvsr_tpu.io.ckpt_convert``, and assert forward-pass parity with this
framework's flax modules. Unlike the hand-written torch oracles in
test_ckpt_convert.py, a pass here means "matches the reference's own code",
not "matches my reconstruction of it".

Covered (VERDICT round-1 item 2):
- ResBlockDual + SPADE        openaimodel.py:362-482, spade.py:68-111
- InflatedUNetModelDualcondV2 openaimodel.py:1903-2313 (full tiny UNet)
- InflatedEncoderUNetModelWT  openaimodel.py:2316-2525
- SpatialTemporalConv / TemporalAttention  util.py:291, attention.py:124
- VideoDecoder_Mix + fusion   model.py:926-1056
- RAFT_SR ('normal')          raft_arch.py:668-807
- SpyNet                      spynet_arch.py:28-96
- modulated deform conv vs torchvision semantics; local correlation vs
  mmcv Correlation semantics
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

pytestmark = pytest.mark.skipif(
    not os.path.isdir(_REF), reason="reference tree not present"
)

import torch  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mgldvsr_tpu.io import ckpt_convert as cc  # noqa: E402


def _install_einops_none_compat():
    """The reference's environment pinned an einops version that accepted
    axis=None kwargs (meaning "infer this axis"); current einops raises on
    them. Re-bind the reference's rearrange helpers (util.py:271-288) with
    None kwargs dropped — identical semantics, no math change."""
    from einops import rearrange

    import ldm.modules.attention as rattn
    import ldm.modules.diffusionmodules.util as rutil

    def mk(pattern):
        def fn(inp, b, c, t, h, w):
            kw = {k: v for k, v in (("b", b), ("c", c), ("t", t), ("h", h),
                                    ("w", w)) if v is not None}
            return rearrange(inp, pattern, **kw)

        return fn

    rutil.from_4d_to_5d = mk("(b t) c h w -> b c t h w")
    rutil.from_5d_to_4d = mk("b c t h w -> (b t) c h w")
    rutil.from_4d_to_3d = mk("(b t) c h w -> (b h w) t c")
    rutil.from_3d_to_4d = mk("(b h w) t c -> (b t) c h w")
    rattn.from_4d_to_3d = rutil.from_4d_to_3d
    rattn.from_3d_to_4d = rutil.from_3d_to_4d


if os.path.isdir(_REF):
    _install_einops_none_compat()


def randomize(module: torch.nn.Module, seed: int):
    """Fill every parameter/buffer with reproducible random values (zero-init
    output convs included, so a forward match is non-trivial) and return the
    state dict."""
    rs = np.random.RandomState(seed)
    new = {}
    for k, v in module.state_dict().items():
        if "num_batches_tracked" in k:
            new[k] = v
            continue
        shape = tuple(v.shape)
        if "running_var" in k:
            arr = np.abs(rs.standard_normal(shape)) * 0.5 + 0.5
        elif v.ndim >= 2:
            arr = rs.standard_normal(shape) * 0.1
        else:
            arr = rs.standard_normal(shape) * 0.2
        new[k] = torch.from_numpy(arr.astype(np.float32)).reshape(v.shape)
    module.load_state_dict(new)
    module.eval()
    return new


def nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))


def nhwc(x_t: torch.Tensor) -> np.ndarray:
    return x_t.detach().numpy().transpose(0, 2, 3, 1)


# --------------------------------------------------------------------------
# ResBlockDual + SPADE
# --------------------------------------------------------------------------


def test_resblock_dual_spade_oracle():
    from ldm.modules.diffusionmodules.openaimodel import ResBlockDual

    from mgldvsr_tpu.models.unet import DualResBlock

    c_in, c_out, semb, emb_dim, hw = 32, 64, 32, 48, 8
    ref = ResBlockDual(c_in, emb_dim, 0.0, semb_channels=semb,
                       out_channels=c_out)
    sd = randomize(ref, 0)

    rs = np.random.RandomState(10)
    x = rs.standard_normal((2, hw, hw, c_in)).astype(np.float32)
    emb = rs.standard_normal((2, emb_dim)).astype(np.float32)
    s = rs.standard_normal((2, hw, hw, semb)).astype(np.float32)

    with torch.no_grad():
        out_ref = ref(nchw(x), torch.from_numpy(emb), {str(hw): nchw(s)})

    params = {"params": cc._resblock(cc.SDGet(sd), dual=True)}
    mod = DualResBlock(c_out, emb_dim, semb)
    ours = mod.apply(cc.to_jax(params), jnp.asarray(x), jnp.asarray(emb),
                     {str(hw): jnp.asarray(s)})
    np.testing.assert_allclose(np.asarray(ours), nhwc(out_ref), atol=2e-5)


# --------------------------------------------------------------------------
# Temporal modules (real classes)
# --------------------------------------------------------------------------


def test_temporal_modules_oracle():
    from ldm.modules.diffusionmodules.util import SpatialTemporalConv as RefSTC
    from ldm.modules.attention import TemporalAttention as RefTA

    from mgldvsr_tpu.models.temporal import (
        SpatialTemporalConv,
        TemporalAttention,
    )

    c, t, hw, heads, dim_head = 16, 4, 6, 2, 8
    rs = np.random.RandomState(3)
    x = rs.standard_normal((t, hw, hw, c)).astype(np.float32)

    stc = RefSTC(c, num_frames=t)
    sd = randomize(stc, 1)
    with torch.no_grad():
        out_ref = stc(nchw(x))
    ours = SpatialTemporalConv(num_frames=t).apply(
        cc.to_jax({"params": cc._stconv(cc.SDGet(sd))}), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), nhwc(out_ref), atol=1e-5)

    ta = RefTA(c, num_heads=heads, dim_head=dim_head, num_frames=t)
    sd = randomize(ta, 2)
    with torch.no_grad():
        out_ref = ta(nchw(x))
    ours = TemporalAttention(num_frames=t, num_heads=heads,
                             dim_head=dim_head).apply(
        cc.to_jax({"params": cc._tattn(cc.SDGet(sd))}), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), nhwc(out_ref), atol=1e-5)


# --------------------------------------------------------------------------
# Full inflated dual-cond UNet
# --------------------------------------------------------------------------


def test_inflated_unet_dualcond_v2_oracle():
    from ldm.modules.diffusionmodules.openaimodel import (
        InflatedUNetModelDualcondV2,
    )

    from mgldvsr_tpu.models.unet import InflatedUNetDualCond, UNetConfig

    t, hw, ctx_dim, semb = 2, 16, 32, 32
    ref = InflatedUNetModelDualcondV2(
        image_size=hw, in_channels=4, model_channels=32, out_channels=4,
        num_res_blocks=2, attention_resolutions=[1, 2], channel_mult=[1, 2],
        num_frames=t, num_head_channels=16, use_spatial_transformer=True,
        use_linear_in_transformer=True, transformer_depth=1,
        context_dim=ctx_dim, legacy=False, semb_channels=semb,
    )
    sd = randomize(ref, 4)

    rs = np.random.RandomState(11)
    x = rs.standard_normal((t, hw, hw, 4)).astype(np.float32)
    ts = np.array([311, 47], dtype=np.int64)
    ctx = rs.standard_normal((t, 7, ctx_dim)).astype(np.float32)
    s16 = rs.standard_normal((t, hw, hw, semb)).astype(np.float32)
    s8 = rs.standard_normal((t, hw // 2, hw // 2, semb)).astype(np.float32)

    with torch.no_grad():
        out_ref = ref(
            nchw(x), torch.from_numpy(ts), torch.from_numpy(ctx),
            {"16": nchw(s16), "8": nchw(s8)},
        )

    used = set()
    params = cc.convert_unet(
        sd, prefix="", channel_mult=(1, 2), num_res_blocks=2,
        attention_resolutions=(1, 2), used=used,
    )
    assert used == set(sd), sorted(set(sd) - used)[:5]
    cfg = UNetConfig(
        model_channels=32, num_head_channels=16, context_dim=ctx_dim,
        semb_channels=semb, channel_mult=(1, 2), attention_resolutions=(1, 2),
        num_frames=t,
    )
    ours = InflatedUNetDualCond(cfg).apply(
        cc.to_jax(params), jnp.asarray(x), jnp.asarray(ts),
        jnp.asarray(ctx), {"16": jnp.asarray(s16), "8": jnp.asarray(s8)},
    )
    np.testing.assert_allclose(np.asarray(ours), nhwc(out_ref), atol=3e-4)


# --------------------------------------------------------------------------
# Struct-cond encoder
# --------------------------------------------------------------------------


def test_struct_encoder_oracle():
    from ldm.modules.diffusionmodules.openaimodel import (
        InflatedEncoderUNetModelWT,
    )

    from mgldvsr_tpu.models.unet import StructCondConfig, StructCondEncoder

    t, hw = 2, 16
    ref = InflatedEncoderUNetModelWT(
        image_size=hw, in_channels=4, model_channels=32, out_channels=32,
        num_res_blocks=2, attention_resolutions=[1, 2], channel_mult=[1, 1],
        num_heads=4, num_frames=t,
    )
    sd = randomize(ref, 5)

    rs = np.random.RandomState(12)
    x = rs.standard_normal((t, hw, hw, 4)).astype(np.float32)
    ts = np.array([702, 9], dtype=np.int64)

    with torch.no_grad():
        out_ref = ref(nchw(x), torch.from_numpy(ts))

    used = set()
    params = cc.convert_structcond(
        sd, prefix="", channel_mult=(1, 1), model_channels=32,
        num_res_blocks=2, attention_resolutions=(1, 2), num_heads=4,
        used=used,
    )
    assert used == set(sd), sorted(set(sd) - used)[:5]
    cfg = StructCondConfig(
        model_channels=32, out_channels=32, channel_mult=(1, 1),
        attention_resolutions=(1, 2), num_heads=4, num_frames=t,
    )
    ours = StructCondEncoder(cfg).apply(
        cc.to_jax(params), jnp.asarray(x), jnp.asarray(ts))
    assert set(ours) == set(out_ref)
    for key in out_ref:
        np.testing.assert_allclose(
            np.asarray(ours[key]), nhwc(out_ref[key]), atol=2e-4,
            err_msg=f"struct_cond[{key}]")


# --------------------------------------------------------------------------
# VideoDecoder_Mix (+ fusion blocks)
# --------------------------------------------------------------------------


def test_video_decoder_mix_oracle():
    from ldm.modules.diffusionmodules.model import VideoDecoder_Mix

    from mgldvsr_tpu.models.vae import Decoder, VAEConfig

    t = 2
    ref = VideoDecoder_Mix(
        ch=32, out_ch=3, ch_mult=(1, 1, 2, 2), num_res_blocks=1,
        attn_resolutions=[], num_frames=t, in_channels=3, resolution=64,
        z_channels=4, num_fuse_block=1, fusion_w=0.7,
    )
    sd = randomize(ref, 6)

    rs = np.random.RandomState(13)
    z = rs.standard_normal((t, 8, 8, 4)).astype(np.float32)
    fea1 = rs.standard_normal((t, 32, 32, 32)).astype(np.float32)
    fea2 = rs.standard_normal((t, 16, 16, 64)).astype(np.float32)

    with torch.no_grad():
        out_ref = ref(nchw(z), [nchw(fea1), nchw(fea2)])

    used = set()
    params = {"params": cc.convert_vae_decoder(
        cc.SDGet(sd, "", used), ch_mult=(1, 1, 2, 2), num_res_blocks=1,
        attn_resolutions=(), resolution=64, video=True, fusion=True,
    )}
    assert used == set(sd), sorted(set(sd) - used)[:5]
    cfg = VAEConfig(
        ch=32, out_ch=3, ch_mult=(1, 1, 2, 2), num_res_blocks=1,
        attn_resolutions=(), resolution=64, z_channels=4, num_frames=t,
        enable_fusion=True, num_fuse_block=1,
    )
    ours = Decoder(cfg).apply(
        cc.to_jax(params), jnp.asarray(z),
        [jnp.asarray(fea1), jnp.asarray(fea2)], 0.7)
    np.testing.assert_allclose(np.asarray(ours), nhwc(out_ref), atol=2e-4)


# --------------------------------------------------------------------------
# RAFT_SR
# --------------------------------------------------------------------------


def test_raft_sr_oracle():
    from basicsr.archs.raft_arch import RAFT_SR

    from mgldvsr_tpu.flow.raft import RAFT, RAFTConfig

    ref = RAFT_SR(model="normal")
    sd = randomize(ref, 7)
    # Tame the per-iteration flow delta to ~sub-pixel scale: with fully
    # random weights the recurrence is chaotic (flows of ~70px whose window
    # lookups sit far out of range), which amplifies fp noise past any
    # useful tolerance without exercising any additional code path.
    for k in ("update_block.flow_head.conv2.weight",
              "update_block.flow_head.conv2.bias"):
        sd[k] = sd[k] * 0.02
    ref.load_state_dict(sd)
    ref.eval()

    # /8 feature grid must stay >=2px at the coarsest pyramid level: the
    # reference's bilinear_sampler normalizes by (W-1), which is 0 (-> NaN)
    # on a 1x1 level. 128px -> levels 16/8/4/2, all valid.
    rs = np.random.RandomState(14)
    im1 = rs.rand(1, 128, 128, 3).astype(np.float32)
    im2 = rs.rand(1, 128, 128, 3).astype(np.float32)

    with torch.no_grad():
        flow_ref = ref(nchw(im1), nchw(im2), iters=3)

    used = set()
    params = cc.convert_raft(sd, used=used)
    # ".norm3." keys alias "downsample.1." (raft_arch.py:127-128 registers the
    # same BN module twice); num_batches_tracked buffers carry no weights.
    ignorable = {k for k in sd
                 if "num_batches_tracked" in k or ".norm3." in k}
    assert used == set(sd) - ignorable, sorted(set(sd) - ignorable - used)[:5]
    ours = RAFT(RAFTConfig(iters=3, lookup_impl="xla")).apply(
        cc.to_jax(params), jnp.asarray(im1), jnp.asarray(im2))
    np.testing.assert_allclose(np.asarray(ours), nhwc(flow_ref), atol=2e-3)


# --------------------------------------------------------------------------
# SpyNet
# --------------------------------------------------------------------------


def test_spynet_oracle():
    from basicsr.archs.spynet_arch import SpyNet as RefSpyNet

    from mgldvsr_tpu.flow.spynet import SpyNet

    ref = RefSpyNet()
    sd = randomize(ref, 8)
    # keep per-level flow predictions ~sub-pixel: fully random 7x7 stacks
    # produce 1e8-magnitude flows whose border-mode warps are chaotic
    for i in range(6):
        for leaf in ("weight", "bias"):
            k = f"basic_module.{i}.basic_module.8.{leaf}"
            sd[k] = sd[k] * 1e-3
    # the ImageNet mean/std preprocess constants are registered buffers —
    # restore them (our implementation hard-codes them)
    sd["mean"] = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    sd["std"] = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    ref.load_state_dict(sd)
    ref.eval()

    rs = np.random.RandomState(15)
    im1 = rs.rand(1, 64, 64, 3).astype(np.float32)
    im2 = rs.rand(1, 64, 64, 3).astype(np.float32)

    with torch.no_grad():
        flow_ref = ref(nchw(im1), nchw(im2))

    used = set()
    params = cc.convert_spynet(
        {k: v for k, v in sd.items() if not k.startswith(("mean", "std"))},
        used=used,
    )
    ours = SpyNet().apply(cc.to_jax(params), jnp.asarray(im1),
                          jnp.asarray(im2))
    np.testing.assert_allclose(np.asarray(ours), nhwc(flow_ref), atol=1e-4)


# --------------------------------------------------------------------------
# Op-level semantics: deformable conv, local correlation
# --------------------------------------------------------------------------


def test_modulated_deform_conv_vs_torchvision_semantics():
    from torchvision.ops import deform_conv2d  # shim: naive, documented layout

    from mgldvsr_tpu.ops.dcn import modulated_deform_conv2d

    rs = np.random.RandomState(16)
    n, cin, cout, h, w, g = 1, 8, 12, 9, 9, 2
    k = 9  # 3x3
    x = rs.standard_normal((n, h, w, cin)).astype(np.float32)
    offset = (rs.standard_normal((n, h, w, 2 * g * k)) * 1.5).astype(np.float32)
    mask = rs.rand(n, h, w, g * k).astype(np.float32)
    weight = (rs.standard_normal((3, 3, cin, cout)) * 0.1).astype(np.float32)
    bias = (rs.standard_normal((cout,)) * 0.1).astype(np.float32)

    ours = modulated_deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight), jnp.asarray(bias), deform_groups=g, padding=1,
    )

    w_t = torch.from_numpy(weight.transpose(3, 2, 0, 1).copy())
    off_t = torch.from_numpy(offset.transpose(0, 3, 1, 2).copy())
    mask_t = torch.from_numpy(mask.transpose(0, 3, 1, 2).copy())
    ref = deform_conv2d(
        nchw(x), off_t, w_t, torch.from_numpy(bias), stride=1, padding=1,
        mask=mask_t,
    )
    np.testing.assert_allclose(np.asarray(ours), nhwc(ref), atol=1e-4)


def test_vae_encoder_oracle():
    """SD-VAE Encoder with return_fea taps (model.py:473-572)."""
    from ldm.modules.diffusionmodules.model import Encoder as RefEncoder

    from mgldvsr_tpu.models.vae import Encoder, VAEConfig

    ref = RefEncoder(
        ch=32, out_ch=3, ch_mult=(1, 1, 2, 2), num_res_blocks=2,
        attn_resolutions=[], in_channels=3, resolution=64, z_channels=4,
        double_z=True,
    )
    sd = randomize(ref, 10)

    rs = np.random.RandomState(19)
    x = rs.standard_normal((2, 64, 64, 3)).astype(np.float32)

    with torch.no_grad():
        out_ref, fea_ref = ref(nchw(x), return_fea=True)

    used = set()
    params = {"params": cc.convert_vae_encoder(
        cc.SDGet(sd, "", used), ch_mult=(1, 1, 2, 2), num_res_blocks=2,
        attn_resolutions=(), resolution=64,
    )}
    assert used == set(sd), sorted(set(sd) - used)[:5]
    cfg = VAEConfig(ch=32, ch_mult=(1, 1, 2, 2), num_res_blocks=2,
                    attn_resolutions=(), resolution=64, z_channels=4)
    ours, fea_ours = Encoder(cfg).apply(cc.to_jax(params), jnp.asarray(x),
                                        return_fea=True)
    np.testing.assert_allclose(np.asarray(ours), nhwc(out_ref), atol=2e-4)
    assert len(fea_ours) == len(fea_ref) == 2
    for fo, fr in zip(fea_ours, fea_ref):
        np.testing.assert_allclose(np.asarray(fo), nhwc(fr), atol=2e-4)


def test_fid_inception_oracle():
    """The FID-patched InceptionV3 pool3 tower vs the reference assembly
    (basicsr/archs/inception.py:17-154 block structure with FIDInceptionA/C/
    E_1/E_2 patches over the torchvision topology)."""
    import torch.nn as tnn
    from torchvision import models  # shim: public inception_v3 topology

    from basicsr.archs.inception import (
        FIDInceptionA,
        FIDInceptionC,
        FIDInceptionE_1,
        FIDInceptionE_2,
    )

    from mgldvsr_tpu.metrics.inception import InceptionV3FID

    # fid_inception_v3() minus the weight download (inception.py:156-188)
    net = models.inception_v3(num_classes=1008, aux_logits=False,
                              pretrained=False)
    net.Mixed_5b = FIDInceptionA(192, pool_features=32)
    net.Mixed_5c = FIDInceptionA(256, pool_features=64)
    net.Mixed_5d = FIDInceptionA(288, pool_features=64)
    net.Mixed_6b = FIDInceptionC(768, channels_7x7=128)
    net.Mixed_6c = FIDInceptionC(768, channels_7x7=160)
    net.Mixed_6d = FIDInceptionC(768, channels_7x7=160)
    net.Mixed_6e = FIDInceptionC(768, channels_7x7=192)
    net.Mixed_7b = FIDInceptionE_1(1280)
    net.Mixed_7c = FIDInceptionE_2(2048)
    sd = randomize(net, 9)

    # reference InceptionV3 wrapper forward, blocks 0-3 (inception.py:87-153)
    rs = np.random.RandomState(18)
    x = rs.rand(2, 96, 96, 3).astype(np.float32)
    with torch.no_grad():
        h = nchw(x)
        h = net.Conv2d_1a_3x3(h)
        h = net.Conv2d_2a_3x3(h)
        h = net.Conv2d_2b_3x3(h)
        h = tnn.functional.max_pool2d(h, 3, stride=2)
        h = net.Conv2d_3b_1x1(h)
        h = net.Conv2d_4a_3x3(h)
        h = tnn.functional.max_pool2d(h, 3, stride=2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                     "Mixed_7a", "Mixed_7b", "Mixed_7c"):
            h = getattr(net, name)(h)
        feats_ref = tnn.functional.adaptive_avg_pool2d(h, (1, 1))
        feats_ref = feats_ref.reshape(2, -1).numpy()

    used = set()
    params = cc.convert_inception(sd, used=used)
    assert used == set(sd), sorted(set(sd) - used)[:5]
    ours = InceptionV3FID(resize_input=False).apply(
        cc.to_jax(params), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), feats_ref, atol=3e-4)


def test_compute_temporal_condition_v4_oracle():
    """The motion-guidance warp loss (ddpm.py:3538-3574) — including its
    zero-placeholder first terms and one-step-stale warps — vs our batched
    ``temporal_warp_loss(mode='reference')``."""
    from types import SimpleNamespace

    from ldm.models.diffusion.ddpm import LatentDiffusionVSRTextWT

    from mgldvsr_tpu.core.diffusion import temporal_warp_loss

    b, t, c, h, w = 2, 5, 4, 8, 8
    rs = np.random.RandomState(20)
    latents = rs.standard_normal((b * t, h, w, c)).astype(np.float32)
    ff = (rs.standard_normal((b, t - 1, h, w, 2)) * 1.5).astype(np.float32)
    fb = (rs.standard_normal((b, t - 1, h, w, 2)) * 1.5).astype(np.float32)
    occ_f = (rs.rand(b, t - 1, h, w, 1) > 0.7).astype(np.float32)
    occ_b = (rs.rand(b, t - 1, h, w, 1) > 0.7).astype(np.float32)

    self_ns = SimpleNamespace(num_frames=t)
    lat_t = torch.from_numpy(
        latents.reshape(b * t, h, w, c).transpose(0, 3, 1, 2).copy())
    ff_t = torch.from_numpy(ff.transpose(0, 1, 4, 2, 3).copy())
    fb_t = torch.from_numpy(fb.transpose(0, 1, 4, 2, 3).copy())
    of_t = torch.from_numpy(occ_f.transpose(0, 1, 4, 2, 3).copy())
    ob_t = torch.from_numpy(occ_b.transpose(0, 1, 4, 2, 3).copy())
    with torch.no_grad():
        loss_ref = LatentDiffusionVSRTextWT.compute_temporal_condition_v4(
            self_ns, (ff_t, fb_t), lat_t, (of_t, ob_t))

    loss_ours = temporal_warp_loss(
        jnp.asarray(latents), (jnp.asarray(ff), jnp.asarray(fb)),
        (jnp.asarray(occ_f), jnp.asarray(occ_b)), t, mode="reference")
    np.testing.assert_allclose(float(loss_ours), float(loss_ref), atol=1e-5)


def test_maskflownet_oracle():
    """MaskFlownet_S (maskflownet_arch.py:91-440) vs our MaskFlownetS via
    convert_maskflownet: PWC pyramid, DCN warp with shared flow offsets,
    mask tradeoff, dense heads, dilated context net."""
    from basicsr.archs.maskflownet_arch import MaskFlownet_S

    from mgldvsr_tpu.flow.maskflownet import MaskFlownetConfig, MaskFlownetS
    from mgldvsr_tpu.io.ckpt_convert import convert_maskflownet

    ref = MaskFlownet_S()
    sd = randomize(ref, 21)
    # keep activations O(1): the dense concat heads (300-500 in-channels)
    # amplify std-0.1 random weights to ~1e13 by the finest level, where
    # fp32 noise swamps any tolerance; scale conv weights to ~std 0.02 and
    # flow/mask predictions to sub-pixel
    for k in list(sd):
        if sd[k].dim() >= 2:
            sd[k] = sd[k] * 0.2
        if k.startswith(("pred_flow", "pred_mask", "dc_conv7")):
            sd[k] = sd[k] * 0.05
    ref.load_state_dict(sd)
    ref.eval()

    rs = np.random.RandomState(22)
    im1 = rs.rand(1, 128, 128, 3).astype(np.float32)
    im2 = rs.rand(1, 128, 128, 3).astype(np.float32)
    with torch.no_grad():
        flow_ref = ref(nchw(im1), nchw(im2))

    used = set()
    params = convert_maskflownet(sd, used=used)
    assert used == set(sd), sorted(set(sd) - used)[:5]
    ours = MaskFlownetS(MaskFlownetConfig()).apply(
        cc.to_jax(params), jnp.asarray(im1), jnp.asarray(im2))
    np.testing.assert_allclose(np.asarray(ours), nhwc(flow_ref), atol=5e-4)


def test_beta_schedule_and_respacing_oracle():
    """make_beta_schedule (util.py:21-45) and space_timesteps (ddpm.py:101)
    vs our schedule construction, at the MGLD config values."""
    from ldm.models.diffusion.ddpm import space_timesteps as ref_space
    from ldm.modules.diffusionmodules.util import make_beta_schedule

    from mgldvsr_tpu.core import schedules as S

    for kind in ("linear", "cosine", "sqrt_linear", "sqrt"):
        ref_b = make_beta_schedule(kind, 1000, linear_start=0.00085,
                                   linear_end=0.0120)
        ref_b = ref_b.numpy() if hasattr(ref_b, "numpy") else np.asarray(ref_b)
        ours = S.make_beta_schedule(kind, 1000, 0.00085, 0.0120)
        np.testing.assert_allclose(ours, ref_b, atol=1e-12,
                                   err_msg=f"betas[{kind}]")

    for n, counts in ((1000, [50]), (1000, "ddim50"), (1000, [10, 20, 30]),
                      (100, [7])):
        assert S.space_timesteps(n, counts) == sorted(ref_space(n, counts)), (
            n, counts)

    sched = S.DiffusionSchedule.create(1000, "linear", 0.00085, 0.0120)
    sp = S.respace_schedule(sched, 50)
    assert int(sp.timestep_map[-1]) == 999
    # respaced betas must satisfy the IDDPM identity:
    # beta_i = 1 - acp[map[i]] / acp[map[i-1]]
    acp = np.asarray(sched.alphas_cumprod, dtype=np.float64)
    tmap = np.asarray(sp.timestep_map)
    last = 1.0
    expect = []
    for ti in tmap:
        expect.append(1.0 - acp[ti] / last)
        last = acp[ti]
    np.testing.assert_allclose(np.asarray(sp.betas), expect, rtol=2e-5)


def test_local_correlation_vs_mmcv_semantics():
    from mmcv.ops import Correlation  # shim: naive, documented layout

    from mgldvsr_tpu.flow.maskflownet import local_correlation

    rs = np.random.RandomState(17)
    b, c, h, w, md = 1, 6, 10, 12, 2
    f1 = rs.standard_normal((b, h, w, c)).astype(np.float32)
    f2 = rs.standard_normal((b, h, w, c)).astype(np.float32)

    ours = local_correlation(jnp.asarray(f1), jnp.asarray(f2), md=md)

    corr = Correlation(kernel_size=1, max_displacement=md)(nchw(f1), nchw(f2))
    corr = corr.view(b, -1, h, w) / c  # maskflownet_arch.py:230-234
    np.testing.assert_allclose(
        np.asarray(ours), corr.numpy().transpose(0, 2, 3, 1), atol=1e-5)


# --------------------------------------------------------------------------
# Stage-2 GAN loss stack (contperceptual.py) + discriminator + occlusion
# --------------------------------------------------------------------------


def test_nlayer_discriminator_oracle():
    """taming-style PatchGAN (contperceptual.py:132 via the shimmed public
    structure) vs models.discriminator.NLayerDiscriminator."""
    from taming.modules.discriminator.model import (
        NLayerDiscriminator as RefDisc,
    )

    from mgldvsr_tpu.models.discriminator import NLayerDiscriminator

    ref = RefDisc(input_nc=3, ndf=32, n_layers=3)
    sd = randomize(ref, 30)

    rs = np.random.RandomState(31)
    x = rs.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(nchw(x))

    used = set()
    variables = cc.convert_discriminator(sd, used=used)
    ignorable = {k for k in sd if "num_batches_tracked" in k}
    assert used == set(sd) - ignorable, sorted(set(sd) - ignorable - used)[:5]
    ours = NLayerDiscriminator(ndf=32).apply(
        cc.to_jax(variables), jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(ours), nhwc(out_ref), atol=2e-4)


def test_occlusion_check_oracle():
    """scripts/util_flow.py:114-136 vs ops/occlusion."""
    from scripts.util_flow import (
        forward_backward_consistency_check as ref_fbcc,
    )

    from mgldvsr_tpu.ops.occlusion import forward_backward_consistency_check

    rs = np.random.RandomState(32)
    ff = (rs.standard_normal((2, 10, 12, 2)) * 2).astype(np.float32)
    fb = (rs.standard_normal((2, 10, 12, 2)) * 2).astype(np.float32)
    fo, bo = forward_backward_consistency_check(jnp.asarray(ff),
                                                jnp.asarray(fb))
    with torch.no_grad():
        rfo, rbo = ref_fbcc(
            torch.from_numpy(ff.transpose(0, 3, 1, 2).copy()),
            torch.from_numpy(fb.transpose(0, 3, 1, 2).copy()))
    np.testing.assert_allclose(np.asarray(fo)[..., 0] if fo.ndim == 4
                               else np.asarray(fo), rfo.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(bo)[..., 0] if bo.ndim == 4
                               else np.asarray(bo), rbo.numpy(), atol=1e-5)


def test_stage2_loss_composition_oracle():
    """LPIPSWithDiscriminator.forward (contperceptual.py:163-283) at
    perceptual_weight=0, both optimizer passes, vs the composition of our
    train/losses primitives — including the odd mean/shape[0] normalization,
    sobel-weighted swc with a stub flownet, l1_diff, adaptive d_weight and
    warmup gating."""
    from ldm.modules.losses.contperceptual import LPIPSWithDiscriminator
    from ldm.modules.distributions.distributions import (
        DiagonalGaussianDistribution,
    )

    from mgldvsr_tpu.models.discriminator import NLayerDiscriminator
    from mgldvsr_tpu.models.vae import DiagonalGaussian
    from mgldvsr_tpu.ops.occlusion import (
        forward_backward_consistency_check as our_fbcc,
    )
    from mgldvsr_tpu.train import losses as L

    t, h, w = 3, 32, 32
    rs = np.random.RandomState(33)
    inputs = rs.standard_normal((t, h, w, 3)).astype(np.float32)
    recon = rs.standard_normal((t, h, w, 3)).astype(np.float32)
    moments = rs.standard_normal((t, 2, 2, 8)).astype(np.float32)
    flow_const = (rs.standard_normal((1, 1, h, w, 2)) * 1.5
                  ).astype(np.float32)

    class StubFlow(torch.nn.Module):
        def forward(self, a, b):
            n = a.shape[0]
            f = torch.from_numpy(flow_const[0].transpose(0, 3, 1, 2).copy())
            return f.repeat(n, 1, 1, 1)

    mod = LPIPSWithDiscriminator(
        disc_start=100, kl_weight=1e-6, perceptual_weight=0.0,
        disc_weight=0.5, num_frames=t, disc_in_channels=3)
    mod.flownet = StubFlow()
    sd = randomize(mod.discriminator, 34)
    mod.discriminator.load_state_dict(sd)
    mod.eval()

    # torch graph: recon depends on a last-layer weight so the adaptive
    # d_weight's autograd has a leaf to differentiate
    W = torch.zeros(3, 3, 1, 1)
    W[0, 0] = W[1, 1] = W[2, 2] = 1.0
    W.requires_grad_(True)
    rec_t = torch.nn.functional.conv2d(nchw(recon), W)
    post = DiagonalGaussianDistribution(
        torch.from_numpy(moments.transpose(0, 3, 1, 2).copy()))
    g_step = 1000  # past warmup
    loss_g, log_g = mod(nchw(inputs), rec_t, post, 0, g_step, last_layer=W)
    loss_d, log_d = mod(nchw(inputs), rec_t, post, 1, g_step, last_layer=W)
    # warmup gating: before disc_start both disc_factor terms vanish
    loss_g0, log_g0 = mod(nchw(inputs), rec_t, post, 0, 10, last_layer=W)

    # ---- ours: same composition from the jnp primitives
    disc_vars = cc.to_jax(cc.convert_discriminator(sd))
    disc = NLayerDiscriminator()
    ff = jnp.asarray(np.repeat(flow_const, t - 1, axis=1))  # [1, t-1, ...]
    fb = ff
    fo, bo = jax.vmap(lambda a, b: our_fbcc(a, b))(ff, fb)
    if fo.ndim == 4:
        fo, bo = fo[..., None], bo[..., None]

    def ours(rec_w, global_step):
        rec = jnp.einsum("thwc,oc->thwo", jnp.asarray(recon),
                         jnp.asarray(W.detach().numpy())[:, :, 0, 0])
        x_in = jnp.asarray(inputs)
        rec_loss = jnp.abs(x_in - rec)
        logvar = 0.0
        nll = rec_loss / jnp.exp(logvar) + logvar
        weighted_nll = jnp.mean(nll) / nll.shape[0]
        nll_scalar = jnp.mean(nll) / nll.shape[0]
        dl = L.l1_diff(x_in, rec, t)
        weighted_nll += 1.0 * jnp.mean(dl) / dl.shape[0]
        weighted_nll += 1.0 * L.swc_loss(x_in, rec, t, (ff, fb), (fo, bo))
        kl = DiagonalGaussian(jnp.asarray(moments)).kl()
        kl_scalar = jnp.mean(kl) / kl.shape[0]
        logits_fake = disc.apply(disc_vars, rec, train=False)
        g_loss = -jnp.mean(logits_fake)

        # adaptive d_weight via jax.grad wrt the last-layer kernel
        wj = jnp.asarray(W.detach().numpy())[:, :, 0, 0]  # [3(out), 3(in)]

        def nll_of(wk):
            r = jnp.einsum("thwc,oc->thwo", jnp.asarray(recon), wk)
            rl = jnp.abs(x_in - r)
            nl = rl / jnp.exp(logvar) + logvar
            return jnp.mean(nl) / nl.shape[0]

        def gl_of(wk):
            r = jnp.einsum("thwc,oc->thwo", jnp.asarray(recon), wk)
            return -jnp.mean(disc.apply(disc_vars, r, train=False))

        gn = jnp.linalg.norm(jax.grad(nll_of)(wj))
        gg = jnp.linalg.norm(jax.grad(gl_of)(wj))
        d_weight = L.adaptive_d_weight(gn, gg, 0.5)
        disc_factor = L.adopt_weight(1.0, global_step, threshold=100)
        total = (weighted_nll + 1e-6 * kl_scalar
                 + d_weight * disc_factor * g_loss)

        logits_real = disc.apply(disc_vars, x_in, train=False)
        logits_fake_d = disc.apply(disc_vars, rec, train=False)
        d_loss = disc_factor * L.hinge_d_loss(logits_real, logits_fake_d)
        return total, d_loss, nll_scalar

    total, d_loss, nll_scalar = ours(None, 1000)
    np.testing.assert_allclose(float(total), float(loss_g), rtol=2e-4)
    np.testing.assert_allclose(float(d_loss), float(loss_d), rtol=2e-4)
    np.testing.assert_allclose(float(nll_scalar),
                               float(log_g["train/nll_loss"]), rtol=1e-4)
    total0, _, _ = ours(None, 10)
    np.testing.assert_allclose(float(total0), float(loss_g0), rtol=2e-4)


# --------------------------------------------------------------------------
# Full-scale converter schema: real reference modules at the SHIPPED configs
# --------------------------------------------------------------------------


@pytest.mark.slow
def test_full_scale_checkpoint_schema_roundtrip():
    """Instantiate the reference UNet / struct-cond encoder / VAE at the
    exact mgldvsr_512 YAML configs, run their state dicts through the
    converter, and require exactly the parameter tree our full-scale models
    declare (keys AND shapes; spot-check exact value round-trip). This is
    the full-scale version of the tiny structural test — a real SD2.1-shaped
    Lightning checkpoint will convert iff this holds."""
    from flax import traverse_util

    from ldm.models.autoencoder import AutoencoderKL as RefAutoencoderKL
    from ldm.modules.diffusionmodules.openaimodel import (
        InflatedEncoderUNetModelWT,
        InflatedUNetModelDualcondV2,
    )

    from mgldvsr_tpu.models.unet import (
        InflatedUNetDualCond,
        StructCondConfig,
        StructCondEncoder,
        UNetConfig,
    )
    from mgldvsr_tpu.models.vae import VAEConfig, VideoAutoencoderKLResi

    t = 5

    def flax_shapes(mod, *args):
        tree = jax.eval_shape(lambda: mod.init(jax.random.PRNGKey(0), *args))
        return {k: v.shape for k, v in
                traverse_util.flatten_dict(tree, sep="/").items()}

    def check(converted, expect, sd, used, ignorable=()):
        got = {k: tuple(np.shape(v)) for k, v in
               traverse_util.flatten_dict(converted, sep="/").items()}
        assert set(got) == set(expect), (
            sorted(set(expect) - set(got))[:5],
            sorted(set(got) - set(expect))[:5])
        for k in expect:
            assert got[k] == tuple(expect[k]), (k, got[k], expect[k])
        leftover = set(sd) - used - set(ignorable)
        assert not leftover, sorted(leftover)[:5]

    # --- denoiser UNet at the mgldvsr_512 config (yaml:35-52)
    ref_unet = InflatedUNetModelDualcondV2(
        image_size=32, in_channels=4, out_channels=4, model_channels=320,
        attention_resolutions=[4, 2, 1], num_res_blocks=2,
        channel_mult=[1, 2, 4, 4], num_head_channels=64, num_frames=t,
        use_spatial_transformer=True, use_linear_in_transformer=True,
        transformer_depth=1, context_dim=1024, legacy=False,
        semb_channels=256)
    sd = {k: v.to(torch.float16) for k, v in ref_unet.state_dict().items()}
    del ref_unet
    used = set()
    converted = cc.convert_unet(sd, prefix="", used=used)
    expect = flax_shapes(
        InflatedUNetDualCond(UNetConfig(num_frames=t)),
        jnp.zeros((t, 64, 64, 4)), jnp.zeros((t,), jnp.int32),
        jnp.zeros((t, 77, 1024)),
        {"64": jnp.zeros((t, 64, 64, 256)),
         "32": jnp.zeros((t, 32, 32, 256)),
         "16": jnp.zeros((t, 16, 16, 256)),
         "8": jnp.zeros((t, 8, 8, 256))})
    check(converted, expect, sd, used)
    # value round-trip spot checks (transposes must invert exactly)
    flat = traverse_util.flatten_dict(converted, sep="/")
    np.testing.assert_array_equal(
        flat["params/conv_in/kernel"],
        sd["input_blocks.0.0.weight"].numpy().transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        flat["params/time_embed/fc1/kernel"],
        sd["time_embed.0.weight"].numpy().transpose(1, 0))
    del sd, converted, flat

    # --- struct-cond encoder at the yaml config (yaml:88-107)
    ref_sc = InflatedEncoderUNetModelWT(
        image_size=96, in_channels=4, model_channels=256, out_channels=256,
        num_res_blocks=2, attention_resolutions=[4, 2, 1],
        channel_mult=[1, 1, 2, 2], num_heads=4, num_frames=t)
    sd = {k: v.to(torch.float16) for k, v in ref_sc.state_dict().items()}
    del ref_sc
    used = set()
    converted = cc.convert_structcond(sd, prefix="", used=used)
    expect = flax_shapes(
        StructCondEncoder(StructCondConfig(num_frames=t)),
        jnp.zeros((t, 64, 64, 4)), jnp.zeros((t,), jnp.int32))
    check(converted, expect, sd, used)
    del sd, converted

    # --- first-stage VAE at the yaml ddconfig (yaml:55-77); the video
    # variant shares the encoder/decoder schema plus temporal+fusion
    ddconfig = dict(double_z=True, z_channels=4, resolution=512,
                    in_channels=3, out_ch=3, ch=128, ch_mult=[1, 2, 4, 4],
                    num_res_blocks=2, attn_resolutions=[], dropout=0.0)
    ref_vae = RefAutoencoderKL(ddconfig, lossconfig={"target": "torch.nn.Identity"},
                               embed_dim=4)
    sd = {k: v.to(torch.float16) for k, v in ref_vae.state_dict().items()}
    del ref_vae
    used = set()
    converted = cc.convert_autoencoder(sd, prefix="", used=used)
    from mgldvsr_tpu.models.vae import AutoencoderKL

    expect = flax_shapes(
        AutoencoderKL(VAEConfig()), jnp.zeros((1, 64, 64, 3)))
    check(converted, expect, sd, used)


def test_couple_prop_module_oracle():
    """CouplePropModule (tempo_model_arch.py:29-95) vs ours via
    convert_coupleprop — incl. its backward/forward trunks, residual
    conv_last output, and the dead-but-checkpointed fusion convs."""
    from basicsr.archs.tempo_model_arch import CouplePropModule as RefCPM

    from mgldvsr_tpu.models.heritage.video_archs import CouplePropModule

    b, t, h, w, c, nf, nb = 1, 4, 8, 8, 4, 8, 2
    ref = RefCPM(num_ch=c, num_feat=nf, num_block=nb)
    sd = randomize(ref, 40)

    rs = np.random.RandomState(41)
    lat = rs.standard_normal((b, t, h, w, c)).astype(np.float32)
    ff = (rs.standard_normal((b, t - 1, h, w, 2)) * 1.2).astype(np.float32)
    fb = (rs.standard_normal((b, t - 1, h, w, 2)) * 1.2).astype(np.float32)

    with torch.no_grad():
        out_ref = ref(
            torch.from_numpy(lat.transpose(0, 1, 4, 2, 3).copy()),
            (torch.from_numpy(ff.transpose(0, 1, 4, 2, 3).copy()),
             torch.from_numpy(fb.transpose(0, 1, 4, 2, 3).copy())))

    used = set()
    params = cc.convert_coupleprop(sd, num_block=nb, used=used)
    assert used == set(sd), sorted(set(sd) - used)[:5]
    ours = CouplePropModule(num_ch=c, num_feat=nf, num_block=nb).apply(
        cc.to_jax(params), jnp.asarray(lat), jnp.asarray(ff),
        jnp.asarray(fb))
    np.testing.assert_allclose(
        np.asarray(ours), out_ref.numpy().transpose(0, 1, 3, 4, 2),
        atol=2e-5)


def test_multidim_temporal_conv_oracle():
    """MultiDimTemporalConv (util.py:314-340) — dual dilated temporal convs
    with a sigmoid-gated blend."""
    from ldm.modules.diffusionmodules.util import (
        MultiDimTemporalConv as RefMDTC,
    )

    from mgldvsr_tpu.models.temporal import MultiDimTemporalConv

    c, t, hw = 8, 4, 6
    ref = RefMDTC(c, num_frames=t)
    sd = randomize(ref, 50)
    rs = np.random.RandomState(51)
    x = rs.standard_normal((t, hw, hw, c)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(nchw(x))

    params = {"params": {
        "temporal_conv1": {
            "kernel": cc.conv_kernel(sd["temporal_conv1.weight"]),
            "bias": sd["temporal_conv1.bias"].numpy(),
        },
        "temporal_conv2": {
            "kernel": cc.conv_kernel(sd["temporal_conv2.weight"]),
            "bias": sd["temporal_conv2.bias"].numpy(),
        },
        "alpha": sd["temporal_alpha"].numpy().reshape(1),
    }}
    ours = MultiDimTemporalConv(num_frames=t).apply(
        cc.to_jax(params), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), nhwc(out_ref), atol=1e-5)


# --------------------------------------------------------------------------
# Heritage SR backbones vs the real reference archs
# --------------------------------------------------------------------------


def test_rrdbnet_oracle():
    from basicsr.archs.rrdbnet_arch import RRDBNet as RefRRDB

    from mgldvsr_tpu.models.heritage.sr_archs import RRDBNet

    ref = RefRRDB(num_in_ch=3, num_out_ch=3, scale=4, num_feat=16,
                  num_block=2, num_grow_ch=8)
    sd = randomize(ref, 60)
    rs = np.random.RandomState(61)
    x = rs.rand(1, 16, 16, 3).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(nchw(x))
    used = set()
    params = cc.convert_rrdbnet(sd, num_block=2, used=used)
    assert used == set(sd), sorted(set(sd) - used)[:5]
    ours = RRDBNet(scale=4, num_feat=16, num_block=2, num_grow_ch=8).apply(
        cc.to_jax(params), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), nhwc(out_ref), atol=2e-5)


def test_msrresnet_oracle():
    from basicsr.archs.srresnet_arch import MSRResNet as RefMSR

    from mgldvsr_tpu.models.heritage.sr_archs import MSRResNet

    ref = RefMSR(num_in_ch=3, num_out_ch=3, num_feat=16, num_block=3,
                 upscale=4)
    sd = randomize(ref, 62)
    rs = np.random.RandomState(63)
    x = rs.rand(1, 12, 12, 3).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(nchw(x))
    used = set()
    params = cc.convert_msrresnet(sd, num_block=3, used=used)
    assert used == set(sd), sorted(set(sd) - used)[:5]
    ours = MSRResNet(num_feat=16, num_block=3, upscale=4).apply(
        cc.to_jax(params), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), nhwc(out_ref), atol=2e-5)


def test_srvgg_oracle():
    from basicsr.archs.srvgg_arch import SRVGGNetCompact as RefVGG

    from mgldvsr_tpu.models.heritage.sr_archs import SRVGGNetCompact

    ref = RefVGG(num_in_ch=3, num_out_ch=3, num_feat=16, num_conv=4,
                 upscale=4, act_type="prelu")
    sd = randomize(ref, 64)
    rs = np.random.RandomState(65)
    x = rs.rand(1, 12, 12, 3).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(nchw(x))
    used = set()
    params = cc.convert_srvgg(sd, num_conv=4, used=used)
    assert used == set(sd), sorted(set(sd) - used)[:5]
    ours = SRVGGNetCompact(num_feat=16, num_conv=4, upscale=4).apply(
        cc.to_jax(params), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), nhwc(out_ref), atol=2e-5)


# --------------------------------------------------------------------------
# FULL guided p_sample_loop: the reference's own sampling loop vs ours
# --------------------------------------------------------------------------


def test_guided_p_sample_loop_oracle():
    """Runs the REFERENCE'S `LatentDiffusionVSRTextWT.p_sample_loop`
    (ddpm.py:4501-4599) verbatim — per-step struct-cond encoder, full
    inflated UNet via the real DiffusionWrapper, posterior step, and the
    motion-guidance gradient correction — on a mock `self` carrying the
    reference's own `register_schedule` buffers, and asserts our
    `sample_video` scan produces the same trajectory on converted weights.

    Noise injection is zeroed on both sides (ref `noise_like` patched to
    zeros, ours `temperature=0`): torch and JAX RNGs cannot draw identical
    gaussians, and the stochastic term is covered by the golden sampler
    tests; everything else — 25 composed guided steps — is exact."""
    import ldm.models.diffusion.ddpm as rddpm
    from ldm.models.diffusion.ddpm import (
        DiffusionWrapper,
        LatentDiffusionVSRTextWT,
    )
    from ldm.modules.diffusionmodules.openaimodel import (
        InflatedEncoderUNetModelWT,
        InflatedUNetModelDualcondV2,
    )

    from mgldvsr_tpu.core.diffusion import SamplerConfig, sample_video
    from mgldvsr_tpu.core.schedules import DiffusionSchedule
    from mgldvsr_tpu.models.unet import (
        InflatedUNetDualCond,
        StructCondConfig,
        StructCondEncoder,
        UNetConfig,
    )

    t, hw, ctx_dim, semb, n_steps = 2, 16, 32, 32, 25
    ls, le = 0.00085, 0.0120

    # --- reference model assembled from its own pieces -------------------
    unet_params = dict(
        image_size=hw, in_channels=4, model_channels=32, out_channels=4,
        num_res_blocks=2, attention_resolutions=[1, 2], channel_mult=[1, 2],
        num_frames=t, num_head_channels=16, use_spatial_transformer=True,
        use_linear_in_transformer=True, transformer_depth=1,
        context_dim=ctx_dim, legacy=False, semb_channels=semb)
    wrapper = DiffusionWrapper(
        {"target":
         "ldm.modules.diffusionmodules.openaimodel.InflatedUNetModelDualcondV2",
         "params": unet_params}, conditioning_key="crossattn")
    sd_unet = randomize(wrapper.diffusion_model, 4)

    structcond = InflatedEncoderUNetModelWT(
        image_size=hw, in_channels=4, model_channels=32, out_channels=semb,
        num_res_blocks=2, attention_resolutions=[1, 2], channel_mult=[1, 1],
        num_heads=4, num_frames=t)
    sd_sc = randomize(structcond, 5)

    class FakeLD(torch.nn.Module):
        register_schedule = rddpm.DDPM.register_schedule
        predict_start_from_noise = rddpm.DDPM.predict_start_from_noise
        q_posterior = rddpm.DDPM.q_posterior
        q_sample = rddpm.DDPM.q_sample
        p_sample_loop = LatentDiffusionVSRTextWT.p_sample_loop
        p_sample = LatentDiffusionVSRTextWT.p_sample
        p_mean_variance = LatentDiffusionVSRTextWT.p_mean_variance
        apply_model = LatentDiffusionVSRTextWT.apply_model
        compute_temporal_condition_v4 = (
            LatentDiffusionVSRTextWT.compute_temporal_condition_v4)

    fake = FakeLD()
    fake.num_frames = t
    fake.parameterization = "eps"
    fake.v_posterior = 0.0
    fake.clip_denoised = False
    fake.log_every_t = 10_000
    fake.shorten_cond_schedule = False
    fake.model = wrapper
    fake.structcond_stage_model = structcond
    fake.register_schedule(beta_schedule="linear", timesteps=n_steps,
                           linear_start=ls, linear_end=le)

    rs = np.random.RandomState(33)
    b = 1
    x_T = rs.standard_normal((b * t, hw, hw, 4)).astype(np.float32)
    ctx = rs.standard_normal((b * t, 7, ctx_dim)).astype(np.float32)
    z_lq = rs.standard_normal((b * t, hw, hw, 4)).astype(np.float32)
    ff = (rs.standard_normal((b, t - 1, hw, hw, 2)) * 1.5).astype(np.float32)
    fb = (rs.standard_normal((b, t - 1, hw, hw, 2)) * 1.5).astype(np.float32)
    occ_f = (rs.rand(b, t - 1, hw, hw, 1) > 0.7).astype(np.float32)
    occ_b = (rs.rand(b, t - 1, hw, hw, 1) > 0.7).astype(np.float32)
    gscale = -8.0

    orig_noise_like = rddpm.noise_like
    rddpm.noise_like = lambda shape, device, repeat=False: torch.zeros(
        shape, device=device)
    try:
        flows_t = (torch.from_numpy(ff.transpose(0, 1, 4, 2, 3).copy()),
                   torch.from_numpy(fb.transpose(0, 1, 4, 2, 3).copy()))
        masks_t = (torch.from_numpy(occ_f.transpose(0, 1, 4, 2, 3).copy()),
                   torch.from_numpy(occ_b.transpose(0, 1, 4, 2, 3).copy()))
        out_ref = fake.p_sample_loop(
            torch.from_numpy(ctx), nchw(z_lq), (b * t, 4, hw, hw),
            guidance_scale=gscale, flows=flows_t, masks=masks_t,
            x_T=nchw(x_T), verbose=False, time_replace=None)
    finally:
        rddpm.noise_like = orig_noise_like

    # --- ours on converted weights ---------------------------------------
    used = set()
    unet_tree = cc.to_jax(cc.convert_unet(
        sd_unet, prefix="", channel_mult=(1, 2), num_res_blocks=2,
        attention_resolutions=(1, 2), used=used))
    sc_tree = cc.to_jax(cc.convert_structcond(
        sd_sc, prefix="", channel_mult=(1, 1), model_channels=32,
        num_res_blocks=2, attention_resolutions=(1, 2), num_heads=4))

    unet = InflatedUNetDualCond(UNetConfig(
        model_channels=32, num_head_channels=16, context_dim=ctx_dim,
        semb_channels=semb, channel_mult=(1, 2),
        attention_resolutions=(1, 2), num_frames=t))
    senc = StructCondEncoder(StructCondConfig(
        model_channels=32, out_channels=semb, channel_mult=(1, 1),
        attention_resolutions=(1, 2), num_heads=4, num_frames=t))

    sched = DiffusionSchedule.create(n_steps, "linear", ls, le)
    ctx_j = jnp.asarray(ctx)
    z_lq_j = jnp.asarray(z_lq)

    def denoise_fn(x, t_batch):
        sc = senc.apply(sc_tree, z_lq_j, t_batch)
        return unet.apply(unet_tree, x, t_batch, ctx_j, sc)

    cfg = SamplerConfig(num_frames=t, guidance_scale=gscale,
                        guidance_mode="reference", clip_denoised=False,
                        temperature=0.0)
    out = sample_video(
        sched, denoise_fn, jnp.asarray(x_T), jax.random.PRNGKey(0), cfg,
        flows=(jnp.asarray(ff), jnp.asarray(fb)),
        masks=(jnp.asarray(occ_f), jnp.asarray(occ_b)))
    np.testing.assert_allclose(
        np.asarray(out.latents), nhwc(out_ref), atol=2e-3)


# --------------------------------------------------------------------------
# LitEma shadow-weight conversion (ema_scope inference protocol)
# --------------------------------------------------------------------------


def test_litema_shadow_conversion_oracle():
    """Checkpoint EMA handling vs the reference's own LitEma.

    The reference samples inside ``model.ema_scope()`` (scripts
    vsr_val...old.py:321), which copies LitEma shadow buffers onto the
    live model (ldm/models/diffusion/ddpm.py:294-307; ema.py:47-55). A
    use_ema-trained Lightning checkpoint therefore stores the effective
    inference weights under ``model_ema.<dots-removed-name>``
    (ema.py:16-21). This test wraps a tiny reference UNet in the REAL
    LitEma, diverges the live weights, takes an EMA update, builds the
    Lightning-style state dict, and asserts that
    ``apply_litema_shadows`` + ``convert_unet`` produce EXACTLY the tree
    that converting the post-``copy_to`` (= ema_scope) weights would.
    """
    from ldm.modules.diffusionmodules.openaimodel import (
        InflatedUNetModelDualcondV2,
    )
    from ldm.modules.ema import LitEma

    t, hw, ctx_dim, semb = 2, 16, 32, 32
    ref = InflatedUNetModelDualcondV2(
        image_size=hw, in_channels=4, model_channels=32, out_channels=4,
        num_res_blocks=2, attention_resolutions=[1, 2], channel_mult=[1, 2],
        num_frames=t, num_head_channels=16, use_spatial_transformer=True,
        use_linear_in_transformer=True, transformer_depth=1,
        context_dim=ctx_dim, legacy=False, semb_channels=semb,
    )
    ref.load_state_dict(
        {k: torch.as_tensor(v) for k, v in randomize(ref, 21).items()})

    # DDPM wraps the UNet as self.model.diffusion_model (ddpm.py:4911-4940)
    # and builds LitEma over self.model — shadow names carry the
    # 'diffusion_model' prefix with all dots stripped
    wrapper = torch.nn.Module()
    wrapper.diffusion_model = ref
    ema = LitEma(wrapper, decay=0.5, use_num_upates=False)
    with torch.no_grad():
        for p in wrapper.parameters():
            p.add_(torch.randn_like(p))
    ema(wrapper)  # one EMA update: shadows = midpoint(raw init, live)

    sd = {f"model.diffusion_model.{k}": v.clone()
          for k, v in ref.state_dict().items()}
    sd.update({f"model_ema.{k}": v.clone()
               for k, v in ema.state_dict().items()})
    assert "model_ema.decay" in sd and "model_ema.num_updates" in sd

    used = set()
    new_sd, n = cc.apply_litema_shadows(sd, used=used)
    n_params = sum(1 for _ in wrapper.parameters())
    assert n == n_params and n > 0
    # every model_ema.* key (incl. decay/num_updates) is accounted for
    assert {k for k in sd if k.startswith("model_ema.")} <= used

    kw = dict(prefix="model.diffusion_model.", channel_mult=(1, 2),
              num_res_blocks=2, attention_resolutions=(1, 2))
    params_from_shadows = cc.convert_unet(new_sd, **kw)

    # oracle: what ema_scope() would actually sample with
    ema.copy_to(wrapper)
    sd_scope = {f"model.diffusion_model.{k}": v
                for k, v in ref.state_dict().items()}
    params_scope = cc.convert_unet(sd_scope, **kw)

    from flax import traverse_util
    a = traverse_util.flatten_dict(params_from_shadows, sep="/")
    b = traverse_util.flatten_dict(params_scope, sep="/")
    assert set(a) == set(b)
    n_diff_from_raw = 0
    raw = traverse_util.flatten_dict(cc.convert_unet(sd, **kw), sep="/")
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
        if not np.array_equal(a[k], raw[k]):
            n_diff_from_raw += 1
    # the check is non-trivial: EMA weights differ from the raw ones
    assert n_diff_from_raw > 0.9 * len(a)

    # use_ema=False must leave raw weights untouched
    same_sd, n0 = cc.apply_litema_shadows(
        {k: v for k, v in sd.items() if not k.startswith("model_ema.")})
    assert n0 == 0


# --------------------------------------------------------------------------
# Colorfix + ImageSpliterTh: the reference scripts' own post/stitch code
# --------------------------------------------------------------------------


def _load_ref_script(name):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        f"ref_{name}", os.path.join(_REF, "scripts", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_colorfix_oracle():
    """adain + wavelet colorfix vs the reference's own
    scripts/wavelet_color_fix.py (lines 59-119), replacing the round-1
    hand-derived torch re-implementation."""
    from mgldvsr_tpu.infer.colorfix import (
        adain_color_fix,
        wavelet_color_fix,
    )

    ref = _load_ref_script("wavelet_color_fix")

    rs = np.random.RandomState(33)
    tgt = rs.uniform(size=(2, 31, 29, 3)).astype(np.float32)
    src = rs.uniform(size=(2, 31, 29, 3)).astype(np.float32)
    t_tgt, t_src = nchw(tgt), nchw(src)

    out_wav = ref.wavelet_reconstruction(t_tgt, t_src)
    ours_wav = np.asarray(wavelet_color_fix(jnp.asarray(tgt), jnp.asarray(src)))
    np.testing.assert_allclose(ours_wav, nhwc(out_wav), atol=2e-5)

    out_adain = ref.adaptive_instance_normalization(t_tgt, t_src)
    ours_adain = np.asarray(adain_color_fix(jnp.asarray(tgt), jnp.asarray(src)))
    np.testing.assert_allclose(ours_adain, nhwc(out_adain), atol=2e-5)

    # PIL wrapper path (clamps + uint8 roundtrip, old.py:376-379)
    from PIL import Image
    pil_t = Image.fromarray((tgt[0] * 255).round().astype(np.uint8))
    pil_s = Image.fromarray((src[0] * 255).round().astype(np.uint8))
    ref_img = np.asarray(ref.wavelet_color_fix(pil_t, pil_s)).astype(np.float32)
    t8 = (tgt[0:1] * 255).round().astype(np.float32) / 255.0
    s8 = (src[0:1] * 255).round().astype(np.float32) / 255.0
    ours_img = np.asarray(
        jnp.clip(wavelet_color_fix(jnp.asarray(t8), jnp.asarray(s8)), 0, 1)
    )[0] * 255.0
    assert np.abs(ours_img.round() - ref_img).max() <= 1.0


def test_image_spliter_gather_oracle():
    """ImageSpliter split/gather vs the reference's ImageSpliterTh
    (scripts/util_image.py:686-769): identical patch grid and identical
    overlap-averaged gather through an arbitrary per-patch transform."""
    from mgldvsr_tpu.infer.canvas import ImageSpliter

    ui = _load_ref_script("util_image")

    rs = np.random.RandomState(44)
    for (h, w, pch, stride) in [(70, 90, 32, 24), (31, 33, 32, 24),
                                (64, 64, 64, 48), (100, 52, 48, 30)]:
        im = rs.uniform(size=(2, 3, h, w)).astype(np.float32)

        def transform(p):  # arbitrary, position-sensitive
            return p * 2.0 + p.mean()

        ref_sp = ui.ImageSpliterTh(torch.from_numpy(im), pch, stride, sf=1)
        for pch_t, idx in ref_sp:
            ref_sp.update(transform(pch_t), idx)
        ref_out = ref_sp.gather().numpy()

        frames = jnp.asarray(im.transpose(0, 2, 3, 1))
        ours_sp = ImageSpliter(frames.shape, pch_size=pch, stride=stride)
        patches = [np.asarray(transform(p)) for p, _ in ours_sp.split(frames)]
        ours = ours_sp.gather(patches).transpose(0, 3, 1, 2)

        np.testing.assert_allclose(ours, ref_out, atol=1e-6,
                                   err_msg=f"{h}x{w} pch={pch} stride={stride}")


# --------------------------------------------------------------------------
# FULL-PROTOCOL COMPOSITION: the reference old.py glue as ONE unit vs
# pipeline.restore_segment
# --------------------------------------------------------------------------


def test_full_protocol_composition_oracle():
    """Runs the reference inference script's COMPLETE per-segment protocol
    (scripts/vsr_val_ddpm_text_T_vqganfin_old.py:291-396) through the
    reference's own modules — VideoAutoencoderKLResi encode,
    get_first_stage_encoding x0.18215, q_sample_respace x_T at t=999 on the
    deep-copied FULL schedule, RAFT compute_flow + resize_flow x0.125 +
    occlusion masks, the script's space_timesteps respacing +
    re-register_schedule + ori_timesteps t_replace, the guided
    p_sample_loop, decode(samples/0.18215, enc_fea), AdaIN colorfix,
    clamp((x+1)/2) — and asserts `pipeline.restore_segment` reproduces the
    WHOLE composition on converted weights.

    Every noise draw is zeroed on both sides (posterior mode, x_T noise=0,
    sampler temperature=0 via restore_segment(deterministic=True); torch/
    JAX RNGs cannot draw identical gaussians — stochastic terms are covered
    by the golden sampler tests). The CLIP text context is computed once by
    our tower and fed to both sides (the tower itself has its own oracle in
    test_ckpt_convert.py)."""
    import copy as _copy

    import ldm.models.diffusion.ddpm as rddpm
    from basicsr.archs.arch_util import resize_flow as ref_resize_flow
    from basicsr.archs.raft_arch import RAFT_SR
    from einops import rearrange
    from ldm.models.autoencoder import VideoAutoencoderKLResi as RefVQ
    from ldm.models.diffusion.ddpm import (
        DiffusionWrapper,
        LatentDiffusionVSRTextWT,
    )
    from ldm.modules.diffusionmodules.openaimodel import (
        InflatedEncoderUNetModelWT,
    )
    from ldm.modules.distributions.distributions import (
        DiagonalGaussianDistribution,
    )

    from mgldvsr_tpu.flow.raft import RAFTConfig
    from mgldvsr_tpu.infer.pipeline import MGLDVSRPipeline, PipelineConfig
    from mgldvsr_tpu.models.cliptext import CLIPTextConfig
    from mgldvsr_tpu.models.unet import StructCondConfig, UNetConfig
    from mgldvsr_tpu.models.vae import VAEConfig

    ref_cf = _load_ref_script("wavelet_color_fix")
    ref_uf = _load_ref_script("util_flow")

    t, px, ctx_dim, semb, steps = 2, 128, 32, 32, 25
    hw = px // 8  # latent 16x16
    gscale, dec_w = -10.0, 0.7
    ls, le = 0.00085, 0.0120

    # ---- reference towers (tiny widths, full topology) -------------------
    unet_params = dict(
        image_size=hw, in_channels=4, model_channels=32, out_channels=4,
        num_res_blocks=2, attention_resolutions=[1, 2], channel_mult=[1, 2],
        num_frames=t, num_head_channels=16, use_spatial_transformer=True,
        use_linear_in_transformer=True, transformer_depth=1,
        context_dim=ctx_dim, legacy=False, semb_channels=semb)
    wrapper = DiffusionWrapper(
        {"target":
         "ldm.modules.diffusionmodules.openaimodel.InflatedUNetModelDualcondV2",
         "params": unet_params}, conditioning_key="crossattn")
    sd_unet = randomize(wrapper.diffusion_model, 51)

    structcond = InflatedEncoderUNetModelWT(
        image_size=hw, in_channels=4, model_channels=32, out_channels=semb,
        num_res_blocks=2, attention_resolutions=[1, 2], channel_mult=[1, 1],
        num_heads=4, num_frames=t)
    sd_sc = randomize(structcond, 52)

    ddconfig = dict(double_z=True, z_channels=4, resolution=px,
                    in_channels=3, out_ch=3, ch=32, ch_mult=(1, 1, 2, 2),
                    num_res_blocks=1, attn_resolutions=[], dropout=0.0,
                    num_frames=t, num_fuse_block=1)
    vq_model = RefVQ(ddconfig, lossconfig={"target": "torch.nn.Identity"},
                     embed_dim=4, fusion_w=dec_w, freeze_dec=False)
    sd_vq = randomize(vq_model, 53)
    vq_model.load_state_dict({k: torch.as_tensor(v) for k, v in sd_vq.items()})
    vq_model.decoder.fusion_w = dec_w  # old.py:250
    vq_model.eval()

    ref_raft = RAFT_SR(model="normal")
    sd_raft = randomize(ref_raft, 54)
    for k in ("update_block.flow_head.conv2.weight",
              "update_block.flow_head.conv2.bias"):
        sd_raft[k] = sd_raft[k] * 0.02  # sub-pixel deltas (see raft oracle)
    ref_raft.load_state_dict(sd_raft)
    ref_raft.eval()

    # ---- FakeLD: the reference's own methods over a mock self ------------
    class FakeLD(torch.nn.Module):
        register_schedule = rddpm.DDPM.register_schedule
        predict_start_from_noise = rddpm.DDPM.predict_start_from_noise
        q_posterior = rddpm.DDPM.q_posterior
        q_sample = rddpm.DDPM.q_sample
        q_sample_respace = rddpm.DDPM.q_sample_respace
        p_sample_loop = LatentDiffusionVSRTextWT.p_sample_loop
        p_sample = LatentDiffusionVSRTextWT.p_sample
        p_mean_variance = LatentDiffusionVSRTextWT.p_mean_variance
        apply_model = LatentDiffusionVSRTextWT.apply_model
        compute_flow = LatentDiffusionVSRTextWT.compute_flow
        compute_temporal_condition_v4 = (
            LatentDiffusionVSRTextWT.compute_temporal_condition_v4)

    fake = FakeLD()
    fake.num_frames = t
    fake.parameterization = "eps"
    fake.v_posterior = 0.0
    fake.clip_denoised = False
    fake.log_every_t = 10_000
    fake.shorten_cond_schedule = False
    fake.model = wrapper
    fake.structcond_stage_model = structcond
    fake.flownet_model = lambda a, b: ref_raft(a, b, iters=3)

    # the script's schedule dance (old.py:262-283): 1000-step linear, keep
    # the full sqrt-alphas, respace to `steps` betas, ori_timesteps
    fake.register_schedule(beta_schedule="linear", timesteps=1000,
                           linear_start=ls, linear_end=le)
    sac_full = _copy.deepcopy(fake.sqrt_alphas_cumprod)
    somac_full = _copy.deepcopy(fake.sqrt_one_minus_alphas_cumprod)
    spaced = rddpm.space_timesteps(1000, [steps])
    use_timesteps = set(spaced)
    last_ac, new_betas, tmap = 1.0, [], []
    for i, ac in enumerate(fake.alphas_cumprod):
        if i in use_timesteps:
            new_betas.append(1 - ac / last_ac)
            last_ac = ac
            tmap.append(i)
    new_betas = np.array([float(b) for b in new_betas])
    fake.register_schedule(given_betas=new_betas, timesteps=len(new_betas))
    fake.ori_timesteps = sorted(use_timesteps)

    # ---- our pipeline + converted weights --------------------------------
    cfg = PipelineConfig(
        num_frames=t, ddpm_steps=steps, guidance_scale=gscale, dec_w=dec_w,
        colorfix="adain", flow_scale=1.0,
        unet=UNetConfig(model_channels=32, num_head_channels=16,
                        context_dim=ctx_dim, semb_channels=semb,
                        channel_mult=(1, 2), attention_resolutions=(1, 2),
                        num_frames=t),
        structcond=StructCondConfig(model_channels=32, out_channels=semb,
                                    channel_mult=(1, 1),
                                    attention_resolutions=(1, 2),
                                    num_heads=4, num_frames=t),
        vae=VAEConfig(ch=32, ch_mult=(1, 1, 2, 2), num_res_blocks=1,
                      attn_resolutions=(), resolution=px, z_channels=4,
                      num_frames=t, enable_fusion=True, num_fuse_block=1),
        clip=CLIPTextConfig(width=ctx_dim, heads=2, layers=2),
        raft=RAFTConfig(iters=3),
    )
    pipe = MGLDVSRPipeline(cfg)
    np.testing.assert_array_equal(np.asarray(pipe.sched.timestep_map),
                                  np.asarray(fake.ori_timesteps))

    clip_params = pipe.clip.init(
        jax.random.PRNGKey(9),
        __import__("mgldvsr_tpu.models.cliptext", fromlist=["x"])
        .empty_prompt_tokens(t, cfg.clip.context_length))
    params = {
        "unet": cc.to_jax(cc.convert_unet(
            sd_unet, prefix="", channel_mult=(1, 2), num_res_blocks=2,
            attention_resolutions=(1, 2))),
        "structcond": cc.to_jax(cc.convert_structcond(
            sd_sc, prefix="", channel_mult=(1, 1), model_channels=32,
            num_res_blocks=2, attention_resolutions=(1, 2), num_heads=4)),
        "vae": cc.to_jax(cc.convert_autoencoder(
            sd_vq, prefix="", video=True, fusion=True, ch_mult=(1, 1, 2, 2),
            num_res_blocks=1, attn_resolutions=(), resolution=px)),
        "raft": cc.to_jax(cc.convert_raft(sd_raft)),
        "clip": clip_params,
    }

    rs = np.random.RandomState(55)
    frames01 = rs.rand(t, px, px, 3).astype(np.float32)
    ctx = np.asarray(pipe.embed_empty_prompt(params, t), np.float32)

    # ---- reference protocol, verbatim glue (old.py:328-379) --------------
    orig_noise_like = rddpm.noise_like
    orig_dg_sample = DiagonalGaussianDistribution.sample
    rddpm.noise_like = lambda shape, device, repeat=False: torch.zeros(
        shape, device=device)
    DiagonalGaussianDistribution.sample = lambda self: self.mean
    try:
        with torch.no_grad():
            init_image = (nchw(frames01) * 2.0 - 1.0).clamp(-1, 1)
            posterior, enc_fea_lq = vq_model.encode(init_image)
            init_latent = 0.18215 * posterior.sample()
            tt = torch.full((t,), 999, dtype=torch.long)
            x_T = fake.q_sample_respace(
                x_start=init_latent, t=tt, sqrt_alphas_cumprod=sac_full,
                sqrt_one_minus_alphas_cumprod=somac_full,
                noise=torch.zeros_like(init_latent))
            init_image_0_1 = torch.clamp(
                (init_image + 1.0) / 2.0, min=0.0, max=1.0).unsqueeze(0)
            flows = fake.compute_flow(init_image_0_1)
            flows = [rearrange(f, "b t c h w -> (b t) c h w") for f in flows]
            flows = [ref_resize_flow(f, size_type="ratio",
                                     sizes=(0.125, 0.125)) for f in flows]
            flows = [rearrange(f, "(b t) c h w -> b t c h w", t=t - 1)
                     for f in flows]
            fwd_occ_list, bwd_occ_list = [], []
            for i in range(t - 1):
                fo, bo = ref_uf.forward_backward_consistency_check(
                    flows[0][:, i], flows[1][:, i], alpha=0.01, beta=0.5)
                fwd_occ_list.append(fo.unsqueeze_(1))
                bwd_occ_list.append(bo.unsqueeze_(1))
            masks = (torch.stack(fwd_occ_list, dim=1),
                     torch.stack(bwd_occ_list, dim=1))
        # p_sample runs guidance autograd inside no_grad scopes itself
        samples = fake.p_sample_loop(
            torch.from_numpy(ctx), init_latent, (t, 4, hw, hw),
            guidance_scale=gscale, flows=flows, masks=masks, x_T=x_T,
            verbose=False, timesteps=steps, time_replace=steps)
        with torch.no_grad():
            x_samples = vq_model.decode(samples * (1.0 / 0.18215), enc_fea_lq)
            x_samples = ref_cf.adaptive_instance_normalization(
                x_samples, init_image)
            out_ref = torch.clamp((x_samples + 1.0) / 2.0, min=0.0, max=1.0)
    finally:
        rddpm.noise_like = orig_noise_like
        DiagonalGaussianDistribution.sample = orig_dg_sample

    # ---- ours: the composed unit -----------------------------------------
    ours = pipe.restore_segment(
        params, jnp.asarray(frames01), jax.random.PRNGKey(0),
        deterministic=True)
    np.testing.assert_allclose(np.asarray(ours), nhwc(out_ref), atol=5e-3)
    # non-degenerate: the restore actually moved the pixels
    assert float(np.abs(np.asarray(ours) - frames01).mean()) > 1e-3


def test_tile_protocol_composition_oracle():
    """Runs the reference tile script's COMPLETE arbitrary-resolution
    protocol (scripts/vsr_val_ddpm_text_T_vqganfin_oldcanvas_tile.py:
    340-535) through the reference's own modules and asserts
    ``pipeline.restore_video`` reproduces the WHOLE composition:

    - per-image bicubic pre-upscale by max(min_side/size_min, sf) with
      int-truncated dims (tile.py:350-357), clamp, reflect /32 pad
      (tile.py:384-388)
    - flows computed ONCE on the full padded working frame (tile.py:
      396-401; the script downsizes to //4 first — at this tiny geometry
      the torch RAFT's 4-level corr pyramid degenerates to 1x1 below a
      128px input and NaNs in bilinear_sampler's 2x/(W-1)-1, so the oracle
      runs RAFT at full working resolution on BOTH sides; the downsize is
      covered by the resize2d torch-parity oracle and the 0.125/fs flow
      rescale is shared arithmetic), resize_flow 'shape' to
      (im_h//8, im_w//8), occlusion masks (alpha=.01, beta=.5) with the
      tile script's SWAPPED check arguments (tile.py:406 vs old.py:354)
    - pixel ImageSpliterTh(pch,stride) zipped BY ORDER with four /8-scale
      spliters for flows/masks (tile.py:421-427)
    - per patch: posterior encode x0.18215, q_sample_respace x_T at t=999
      on the full schedule, the canvas-tiled guided p_sample_loop_canvas
      (gaussian tile weights, tile_size/tile_overlap, n_samples=1 ->
      per-tile flushes), decode(samples/0.18215, enc_fea), AdaIN colorfix
      vs the patch (tile.py:428-470)
    - spliter gather (overlap-average in [-1,1]!) -> clamp((x+1)/2)
      (tile.py:472-475)
    - the final-downscale quirk: the PADDED frame is downscaled by
      sf/upsample_scale and the flag_pad crop runs after, where it is a
      no-op (tile.py:523-535) — a scaled pad remnant stays in the output.

    The tile script encodes init_latent via model.encode_first_stage (the
    plain SD AutoencoderKL) but enc_fea via vq_model.encode; with the
    shipped ``freeze_dec: True`` the video VAE's encoder is frozen at the
    same SD init (autoencoder.py:1608-1621), so both encoders coincide on
    real checkpoints — the oracle uses vq_model for both, as old.py does.

    Noise is zeroed on both sides (see the fixed-mode oracle above)."""
    import copy as _copy

    import torch.nn.functional as F
    import ldm.models.diffusion.ddpm as rddpm
    from basicsr.archs.arch_util import resize_flow as ref_resize_flow
    from basicsr.archs.raft_arch import RAFT_SR
    from einops import rearrange, repeat
    from ldm.models.autoencoder import VideoAutoencoderKLResi as RefVQ
    from ldm.models.diffusion.ddpm import (
        DiffusionWrapper,
        LatentDiffusionVSRTextWT,
    )
    from ldm.modules.diffusionmodules.openaimodel import (
        InflatedEncoderUNetModelWT,
    )
    from ldm.modules.distributions.distributions import (
        DiagonalGaussianDistribution,
    )

    from mgldvsr_tpu.flow.raft import RAFTConfig
    from mgldvsr_tpu.infer.pipeline import MGLDVSRPipeline, PipelineConfig
    from mgldvsr_tpu.models.cliptext import CLIPTextConfig
    from mgldvsr_tpu.models.unet import StructCondConfig, UNetConfig
    from mgldvsr_tpu.models.vae import VAEConfig

    ref_cf = _load_ref_script("wavelet_color_fix")
    ref_uf = _load_ref_script("util_flow")
    ref_ui = _load_ref_script("util_image")

    t, ctx_dim, semb, steps = 2, 32, 32, 5
    gscale, dec_w, sf, min_side = -10.0, 0.7, 4, 128
    pch_size, pch_stride = 64, 48
    tile_size, tile_overlap = 4, 2
    ls, le = 0.00085, 0.0120
    h0, w0 = 17, 15  # -> upsample 128/15, work 145x128, padded 160x128

    # ---- reference towers (tiny widths, full topology) -------------------
    unet_params = dict(
        image_size=8, in_channels=4, model_channels=32, out_channels=4,
        num_res_blocks=2, attention_resolutions=[1, 2], channel_mult=[1, 2],
        num_frames=t, num_head_channels=16, use_spatial_transformer=True,
        use_linear_in_transformer=True, transformer_depth=1,
        context_dim=ctx_dim, legacy=False, semb_channels=semb)
    wrapper = DiffusionWrapper(
        {"target":
         "ldm.modules.diffusionmodules.openaimodel.InflatedUNetModelDualcondV2",
         "params": unet_params}, conditioning_key="crossattn")
    sd_unet = randomize(wrapper.diffusion_model, 61)

    structcond = InflatedEncoderUNetModelWT(
        image_size=8, in_channels=4, model_channels=32, out_channels=semb,
        num_res_blocks=2, attention_resolutions=[1, 2], channel_mult=[1, 1],
        num_heads=4, num_frames=t)
    sd_sc = randomize(structcond, 62)

    ddconfig = dict(double_z=True, z_channels=4, resolution=64,
                    in_channels=3, out_ch=3, ch=32, ch_mult=(1, 1, 2, 2),
                    num_res_blocks=1, attn_resolutions=[], dropout=0.0,
                    num_frames=t, num_fuse_block=1)
    vq_model = RefVQ(ddconfig, lossconfig={"target": "torch.nn.Identity"},
                     embed_dim=4, fusion_w=dec_w, freeze_dec=False)
    sd_vq = randomize(vq_model, 63)
    vq_model.load_state_dict({k: torch.as_tensor(v) for k, v in sd_vq.items()})
    vq_model.decoder.fusion_w = dec_w
    vq_model.eval()

    ref_raft = RAFT_SR(model="normal")
    sd_raft = randomize(ref_raft, 64)
    for k in ("update_block.flow_head.conv2.weight",
              "update_block.flow_head.conv2.bias"):
        sd_raft[k] = sd_raft[k] * 0.02
    ref_raft.load_state_dict(sd_raft)
    ref_raft.eval()

    class FakeLD(torch.nn.Module):
        register_schedule = rddpm.DDPM.register_schedule
        predict_start_from_noise = rddpm.DDPM.predict_start_from_noise
        q_posterior = rddpm.DDPM.q_posterior
        q_sample = rddpm.DDPM.q_sample
        q_sample_respace = rddpm.DDPM.q_sample_respace
        p_sample_loop_canvas = LatentDiffusionVSRTextWT.p_sample_loop_canvas
        p_sample_canvas = LatentDiffusionVSRTextWT.p_sample_canvas
        p_mean_variance_canvas = (
            LatentDiffusionVSRTextWT.p_mean_variance_canvas)
        _gaussian_weights = LatentDiffusionVSRTextWT._gaussian_weights
        apply_model = LatentDiffusionVSRTextWT.apply_model
        compute_flow = LatentDiffusionVSRTextWT.compute_flow
        compute_temporal_condition_v4 = (
            LatentDiffusionVSRTextWT.compute_temporal_condition_v4)

    fake = FakeLD()
    fake.num_frames = t
    fake.parameterization = "eps"
    fake.v_posterior = 0.0
    fake.clip_denoised = False
    fake.log_every_t = 10_000
    fake.shorten_cond_schedule = False
    fake.model = wrapper
    fake.structcond_stage_model = structcond
    fake.flownet_model = lambda a, b: ref_raft(a, b, iters=3)
    # _gaussian_weights reads self.configs.model.params.channels
    from types import SimpleNamespace as _NS
    fake.configs = _NS(model=_NS(params=_NS(channels=4)))

    fake.register_schedule(beta_schedule="linear", timesteps=1000,
                           linear_start=ls, linear_end=le)
    sac_full = _copy.deepcopy(fake.sqrt_alphas_cumprod)
    somac_full = _copy.deepcopy(fake.sqrt_one_minus_alphas_cumprod)
    spaced = rddpm.space_timesteps(1000, [steps])
    use_timesteps = set(spaced)
    last_ac, new_betas = 1.0, []
    for i, ac in enumerate(fake.alphas_cumprod):
        if i in use_timesteps:
            new_betas.append(1 - ac / last_ac)
            last_ac = ac
    new_betas = np.array([float(b) for b in new_betas])
    fake.register_schedule(given_betas=new_betas, timesteps=len(new_betas))
    fake.ori_timesteps = sorted(use_timesteps)

    # ---- our pipeline + converted weights --------------------------------
    cfg = PipelineConfig(
        num_frames=t, ddpm_steps=steps, guidance_scale=gscale, dec_w=dec_w,
        colorfix="adain", flow_scale=1.0, sf=sf,
        unet=UNetConfig(model_channels=32, num_head_channels=16,
                        context_dim=ctx_dim, semb_channels=semb,
                        channel_mult=(1, 2), attention_resolutions=(1, 2),
                        num_frames=t),
        structcond=StructCondConfig(model_channels=32, out_channels=semb,
                                    channel_mult=(1, 1),
                                    attention_resolutions=(1, 2),
                                    num_heads=4, num_frames=t),
        vae=VAEConfig(ch=32, ch_mult=(1, 1, 2, 2), num_res_blocks=1,
                      attn_resolutions=(), resolution=64, z_channels=4,
                      num_frames=t, enable_fusion=True, num_fuse_block=1),
        clip=CLIPTextConfig(width=ctx_dim, heads=2, layers=2),
        raft=RAFTConfig(iters=3),
    )
    pipe = MGLDVSRPipeline(cfg)

    clip_params = pipe.clip.init(
        jax.random.PRNGKey(9),
        __import__("mgldvsr_tpu.models.cliptext", fromlist=["x"])
        .empty_prompt_tokens(t, cfg.clip.context_length))
    params = {
        "unet": cc.to_jax(cc.convert_unet(
            sd_unet, prefix="", channel_mult=(1, 2), num_res_blocks=2,
            attention_resolutions=(1, 2))),
        "structcond": cc.to_jax(cc.convert_structcond(
            sd_sc, prefix="", channel_mult=(1, 1), model_channels=32,
            num_res_blocks=2, attention_resolutions=(1, 2), num_heads=4)),
        "vae": cc.to_jax(cc.convert_autoencoder(
            sd_vq, prefix="", video=True, fusion=True, ch_mult=(1, 1, 2, 2),
            num_res_blocks=1, attn_resolutions=(), resolution=64)),
        "raft": cc.to_jax(cc.convert_raft(sd_raft)),
        "clip": clip_params,
    }

    rs = np.random.RandomState(65)
    frames01 = rs.rand(t, h0, w0, 3).astype(np.float32)
    ctx = np.asarray(pipe.embed_empty_prompt(params, t), np.float32)

    # ---- reference protocol, verbatim tile glue ---------------------------
    orig_noise_like = rddpm.noise_like
    orig_dg_sample = DiagonalGaussianDistribution.sample
    rddpm.noise_like = lambda shape, device, repeat=False: torch.zeros(
        shape, device=device)
    DiagonalGaussianDistribution.sample = lambda self: self.mean
    try:
        with torch.no_grad():
            cur_image = nchw(frames01) * 2.0 - 1.0  # read_image [-1,1]
            size_min = min(h0, w0)
            upsample_scale = max(min_side / size_min, float(sf))
            cur_image = F.interpolate(
                cur_image,
                size=(int(h0 * upsample_scale), int(w0 * upsample_scale)),
                mode="bicubic")
            im_lq_bs = cur_image.clamp(-1.0, 1.0)
            ori_h, ori_w = im_lq_bs.shape[2:]
            flag_pad = not (ori_h % 32 == 0 and ori_w % 32 == 0)
            if flag_pad:
                pad_h = ((ori_h // 32) + 1) * 32 - ori_h if ori_h % 32 else 0
                pad_w = ((ori_w // 32) + 1) * 32 - ori_w if ori_w % 32 else 0
                im_lq_bs = F.pad(im_lq_bs, pad=(0, pad_w, 0, pad_h),
                                 mode="reflect")
            im_lq_bs_0_1 = torch.clamp((im_lq_bs + 1.0) / 2.0, 0.0, 1.0)
            _, _, im_h, im_w = im_lq_bs_0_1.shape
            # flow estimation at full working res (see docstring)
            im_sm = rearrange(im_lq_bs_0_1, "(b t) c h w -> b t c h w", t=t)
            flows = fake.compute_flow(im_sm)
            flows = [rearrange(f, "b t c h w -> (b t) c h w") for f in flows]
            flows = [ref_resize_flow(f, size_type="shape",
                                     sizes=(im_h // 8, im_w // 8))
                     for f in flows]
            flows = [rearrange(f, "(b t) c h w -> b t c h w", t=t - 1)
                     for f in flows]
            fwd_occ_list, bwd_occ_list = [], []
            for i in range(t - 1):
                fwd_flow = flows[1][:, i]
                bwd_flow = flows[0][:, i]
                fo, bo = ref_uf.forward_backward_consistency_check(
                    fwd_flow, bwd_flow, alpha=0.01, beta=0.5)
                fwd_occ_list.append(fo.unsqueeze_(1))
                bwd_occ_list.append(bo.unsqueeze_(1))
            fwd_occs = rearrange(torch.stack(fwd_occ_list, dim=1),
                                 "b t c h w -> (b t) c h w")
            bwd_occs = rearrange(torch.stack(bwd_occ_list, dim=1),
                                 "b t c h w -> (b t) c h w")
            flows = [rearrange(f, "b t c h w -> (b t) c h w") for f in flows]

            imlq_spliter = ref_ui.ImageSpliterTh(
                im_lq_bs, pch_size, pch_stride, sf=1)
            flow_spliter_f = ref_ui.ImageSpliterTh(
                flows[0], pch_size // 8, pch_stride // 8, sf=1)
            flow_spliter_b = ref_ui.ImageSpliterTh(
                flows[1], pch_size // 8, pch_stride // 8, sf=1)
            fwd_occ_spliter = ref_ui.ImageSpliterTh(
                fwd_occs, pch_size // 8, pch_stride // 8, sf=1)
            bwd_occ_spliter = ref_ui.ImageSpliterTh(
                bwd_occs, pch_size // 8, pch_stride // 8, sf=1)
        for (im_lq_pch, index_infos), (flow_f, _), (flow_b, _), \
                (fwd_occ, _), (bwd_occ, _) in zip(
                    imlq_spliter, flow_spliter_f, flow_spliter_b,
                    fwd_occ_spliter, bwd_occ_spliter):
            with torch.no_grad():
                posterior, enc_fea_lq = vq_model.encode(im_lq_pch)
                init_latent = 0.18215 * posterior.sample()
                tt = torch.full((im_lq_bs.size(0),), 999, dtype=torch.long)
                x_T = fake.q_sample_respace(
                    x_start=init_latent, t=tt, sqrt_alphas_cumprod=sac_full,
                    sqrt_one_minus_alphas_cumprod=somac_full,
                    noise=torch.zeros_like(init_latent))
                flow_f_p = rearrange(flow_f, "(b t) c h w -> b t c h w",
                                     t=t - 1)
                flow_b_p = rearrange(flow_b, "(b t) c h w -> b t c h w",
                                     t=t - 1)
                fwd_occ_p = rearrange(fwd_occ, "(b t) c h w -> b t c h w",
                                      t=t - 1)
                bwd_occ_p = rearrange(bwd_occ, "(b t) c h w -> b t c h w",
                                      t=t - 1)
            # p_sample_canvas runs guidance autograd inside itself
            samples = fake.p_sample_loop_canvas(
                torch.from_numpy(ctx), init_latent,
                (t, 4, pch_size // 8, pch_size // 8),
                guidance_scale=gscale,
                flows=(flow_f_p, flow_b_p), masks=(fwd_occ_p, bwd_occ_p),
                x_T=x_T, verbose=False, timesteps=steps, time_replace=steps,
                tile_size=tile_size, tile_overlap=tile_overlap,
                batch_size=1)
            with torch.no_grad():
                x_samples = vq_model.decode(samples * (1.0 / 0.18215),
                                            enc_fea_lq)
                x_samples = ref_cf.adaptive_instance_normalization(
                    x_samples, im_lq_pch)
                imlq_spliter.update(x_samples, index_infos)
        with torch.no_grad():
            im_sr = imlq_spliter.gather()
            im_sr = torch.clamp((im_sr + 1.0) / 2.0, 0.0, 1.0)
            if upsample_scale > sf:
                im_sr = F.interpolate(
                    im_sr,
                    size=(int(im_lq_bs.size(-2) * sf / upsample_scale),
                          int(im_lq_bs.size(-1) * sf / upsample_scale)),
                    mode="bicubic")
                im_sr = torch.clamp(im_sr, 0.0, 1.0)
            out_ref = im_sr.cpu().numpy().transpose(0, 2, 3, 1)
            if flag_pad:
                out_ref = out_ref[:, :ori_h, :ori_w, ]
    finally:
        rddpm.noise_like = orig_noise_like
        DiagonalGaussianDistribution.sample = orig_dg_sample

    # ---- ours: the composed unit -----------------------------------------
    ours = pipe.restore_video(
        params, jnp.asarray(frames01), jax.random.PRNGKey(0),
        pch_size=pch_size, pch_stride=pch_stride, min_side=min_side,
        flow_scale=1.0, deterministic=True,
        tile=tile_size, tile_overlap=tile_overlap, batch_tiles=4)
    assert ours.shape == out_ref.shape, (ours.shape, out_ref.shape)
    np.testing.assert_allclose(np.asarray(ours), out_ref, atol=5e-3)
    # non-degenerate: the restore moved the pixels away from a plain
    # bicubic upscale of the input
    from mgldvsr_tpu.ops.resize import resize2d as _rz
    plain = np.asarray(_rz(jnp.asarray(frames01), ours.shape[1:3],
                           method="bicubic"))
    assert float(np.abs(np.asarray(ours) - plain).mean()) > 1e-3
