"""Numeric oracles for heritage SR/VSR backbones against the ACTUAL
reference archs (round-2 continuation of test_ref_oracle.py): RCAN and
BasicVSR, through their converters."""
import os
import sys

import numpy as np
import pytest

_HERE = os.path.dirname(os.path.abspath(__file__))
for _p in (os.path.join(_HERE, "ref_shims"), "/root/reference"):
    if _p not in sys.path:
        sys.path.insert(0, _p)

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference tree absent")

import torch  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from mgldvsr_tpu.io import ckpt_convert as cc  # noqa: E402


def _nhwc(x):
    return jnp.asarray(x.detach().numpy().transpose(0, 2, 3, 1))


def test_rcan_oracle():
    from basicsr.archs.rcan_arch import RCAN as RefRCAN

    from mgldvsr_tpu.models.heritage.misc_archs import RCAN

    with torch.no_grad():
        ref = RefRCAN(num_in_ch=3, num_out_ch=3, num_feat=16, num_group=2,
                      num_block=2, squeeze_factor=4, upscale=4,
                      res_scale=1).eval()
        x = torch.rand(1, 3, 16, 16)
        want = ref(x).numpy()
        sd = ref.state_dict()
    used = set()
    params = cc.convert_rcan(sd, num_group=2, num_block=2, upscale=4,
                             used=used)
    assert used == set(sd.keys())
    ours = RCAN(num_feat=16, num_group=2, num_block=2, squeeze_factor=4,
                upscale=4)
    got = ours.apply(params, _nhwc(x))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=1e-4, rtol=1e-3)


def test_rcan_oracle_x3():
    from basicsr.archs.rcan_arch import RCAN as RefRCAN

    from mgldvsr_tpu.models.heritage.misc_archs import RCAN

    with torch.no_grad():
        ref = RefRCAN(num_in_ch=3, num_out_ch=3, num_feat=8, num_group=1,
                      num_block=1, squeeze_factor=4, upscale=3).eval()
        x = torch.rand(1, 3, 12, 12)
        want = ref(x).numpy()
        sd = ref.state_dict()
    used = set()
    params = cc.convert_rcan(sd, num_group=1, num_block=1, upscale=3,
                             used=used)
    assert used == set(sd.keys())
    got = RCAN(num_feat=8, num_group=1, num_block=1, squeeze_factor=4,
               upscale=3).apply(params, _nhwc(x))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=1e-4, rtol=1e-3)


def test_basicvsr_oracle():
    from basicsr.archs.basicvsr_arch import BasicVSR as RefBVSR

    from mgldvsr_tpu.models.heritage.video_archs import BasicVSR

    with torch.no_grad():
        ref = RefBVSR(num_feat=16, num_block=2).eval()
        x = torch.rand(1, 3, 3, 64, 64)
        flows_forward, flows_backward = ref.get_flow(x)
        want = ref(x).numpy()
        sd = ref.state_dict()

    used = set()
    params = cc.convert_basicvsr(sd, num_block=2, used=used)
    # the SpyNet tower lives in the same checkpoint; flows are inputs here
    spy_used = set()
    cc.convert_spynet(sd, prefix="spynet.", used=spy_used)
    leftovers = set(sd.keys()) - used - spy_used
    # normalization buffers are constants in our SpyNet module
    assert leftovers <= {"spynet.mean", "spynet.std"}, sorted(leftovers)[:8]

    ours = BasicVSR(num_feat=16, num_block=2)
    frames = jnp.asarray(x.numpy().transpose(0, 1, 3, 4, 2))
    ff = jnp.asarray(flows_forward.numpy().transpose(0, 1, 3, 4, 2))
    fb = jnp.asarray(flows_backward.numpy().transpose(0, 1, 3, 4, 2))
    got = ours.apply(params, frames, ff, fb)
    # recurrent bilinear warps compound fp noise across frames
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 1, 4, 2, 3), want, atol=2e-3)


def _patch_ref_dcn():
    """Replace the reference's CUDA-only modulated_deform_conv with the
    torchvision-shim's pure-torch deform_conv2d (same documented
    semantics) so EDVR runs on CPU."""
    import basicsr.archs.arch_util as au
    from torchvision.ops import deform_conv2d as tv_dcn

    def mdc(x, offset, mask, weight, bias, stride, padding, dilation,
            groups, deformable_groups):
        return tv_dcn(x, offset, weight, bias, stride=stride,
                      padding=padding, dilation=dilation, mask=mask)

    au.modulated_deform_conv = mdc


def test_edvr_oracle():
    _patch_ref_dcn()
    from basicsr.archs.edvr_arch import EDVR as RefEDVR

    from mgldvsr_tpu.models.heritage.video_archs import EDVR

    with torch.no_grad():
        ref = RefEDVR(num_feat=16, num_frame=5, deformable_groups=2,
                      num_extract_block=2, num_reconstruct_block=2).eval()
        x = torch.rand(1, 5, 3, 16, 16)
        want = ref(x).numpy()
        sd = ref.state_dict()
    used = set()
    params = cc.convert_edvr(sd, num_extract_block=2,
                             num_reconstruct_block=2, used=used)
    assert used == set(sd.keys()), sorted(set(sd.keys()) - used)[:8]
    ours = EDVR(num_feat=16, num_frame=5, num_extract_block=2,
                num_reconstruct_block=2, deform_groups=2)
    frames = jnp.asarray(x.numpy().transpose(0, 1, 3, 4, 2))
    got = ours.apply(params, frames)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=5e-4)


def test_basicvsrpp_oracle():
    _patch_ref_dcn()
    from basicsr.archs.basicvsrpp_arch import BasicVSRPlusPlus as RefBVPP

    from mgldvsr_tpu.models.heritage.video_archs import BasicVSRPlusPlus

    # the reference skips creating the alignment modules without CUDA
    # (basicvsrpp_arch.py:73); their construction and CPU forward work fine
    orig_cuda = torch.cuda.is_available
    torch.cuda.is_available = lambda: True
    try:
        ref = RefBVPP(mid_channels=16, num_blocks=2, max_residue_magnitude=10,
                      is_low_res_input=True, spynet_path=None).eval()
    finally:
        torch.cuda.is_available = orig_cuda
    with torch.no_grad():
        x = torch.rand(1, 4, 3, 64, 64)
        want = ref(x).numpy()  # also sets cpu_cache/is_mirror_extended
        # flows exactly as the reference computes them internally
        flows_forward, flows_backward = ref.compute_flow(x)
        sd = ref.state_dict()
    used = set()
    params = cc.convert_basicvsrpp(sd, num_block=2, used=used)
    spy_used = set()
    cc.convert_spynet(sd, prefix="spynet.", used=spy_used)
    leftovers = set(sd.keys()) - used - spy_used
    assert leftovers <= {"spynet.mean", "spynet.std"}, sorted(leftovers)[:8]

    ours = BasicVSRPlusPlus(num_feat=16, num_block=2, deform_groups=16)
    frames = jnp.asarray(x.numpy().transpose(0, 1, 3, 4, 2))
    ff = jnp.asarray(flows_forward.numpy().transpose(0, 1, 3, 4, 2))
    fb = jnp.asarray(flows_backward.numpy().transpose(0, 1, 3, 4, 2))
    got = ours.apply(params, frames, ff, fb)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 1, 4, 2, 3), want, atol=2e-3)


def test_swinir_oracle():
    from basicsr.archs.swinir_arch import SwinIR as RefSwin

    from mgldvsr_tpu.models.heritage.swinir import SwinIR

    with torch.no_grad():
        ref = RefSwin(upscale=4, img_size=16, window_size=8,
                      img_range=1.0, depths=[2, 2], embed_dim=24,
                      num_heads=[2, 2], mlp_ratio=2,
                      upsampler="pixelshuffle", resi_connection="1conv"
                      ).eval()
        x = torch.rand(1, 3, 16, 16)
        want = ref(x).numpy()
        sd = ref.state_dict()
    used = set()
    params = cc.convert_swinir(sd, depths=(2, 2), upscale=4, used=used)
    leftovers = set(sd.keys()) - used
    assert not leftovers, sorted(leftovers)[:8]
    ours = SwinIR(upscale=4, embed_dim=24, depths=(2, 2), num_heads=(2, 2),
                  window_size=8)
    got = ours.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=5e-4)


def _patch_ref_stylegan_ops():
    """Install pure-torch implementations of the reference's CUDA-only
    fused_bias_act / upfirdn2d extensions (the published native fallbacks)
    so StyleGAN2 runs on CPU."""
    import torch.nn.functional as tF

    import basicsr.ops.fused_act.fused_act as fa
    import basicsr.ops.upfirdn2d.upfirdn2d as uf

    class _FusedExt:
        @staticmethod
        def fused_bias_act(input, bias, refer, act, grad, alpha, scale):
            assert act == 3 and grad == 0
            x = input
            if bias.numel():
                shape = [1, -1] + [1] * (x.ndim - 2)
                x = x + bias.reshape(shape)
            return tF.leaky_relu(x, alpha) * scale

    class _UpFirDnExt:
        @staticmethod
        def upfirdn2d(input, kernel, up_x, up_y, down_x, down_y,
                      pad_x0, pad_x1, pad_y0, pad_y1):
            # input: [N*C, H, W, 1]; returns [N*C, out_h, out_w, 1]
            _, in_h, in_w, minor = input.shape
            kh, kw = kernel.shape
            out = input.view(-1, in_h, 1, in_w, 1, minor)
            out = tF.pad(out, [0, 0, 0, up_x - 1, 0, 0, 0, up_y - 1])
            out = out.view(-1, in_h * up_y, in_w * up_x, minor)
            out = tF.pad(out, [0, 0, max(pad_x0, 0), max(pad_x1, 0),
                               max(pad_y0, 0), max(pad_y1, 0)])
            out = out[:, max(-pad_y0, 0):out.shape[1] - max(-pad_y1, 0),
                      max(-pad_x0, 0):out.shape[2] - max(-pad_x1, 0), :]
            out = out.permute(0, 3, 1, 2).reshape(
                -1, 1, out.shape[1], out.shape[2])
            w = torch.flip(kernel, [0, 1]).view(1, 1, kh, kw)
            out = tF.conv2d(out, w)
            out = out.reshape(-1, minor, out.shape[2], out.shape[3])
            out = out.permute(0, 2, 3, 1)
            return out[:, ::down_y, ::down_x, :].contiguous()

    fa.fused_act_ext = _FusedExt()
    uf.upfirdn2d_ext = _UpFirDnExt()


def test_stylegan2_generator_oracle():
    _patch_ref_stylegan_ops()
    from basicsr.archs.stylegan2_arch import StyleGAN2Generator as RefG

    from mgldvsr_tpu.models.heritage.stylegan2 import StyleGAN2Generator

    with torch.no_grad():
        ref = RefG(out_size=32, num_style_feat=32, num_mlp=2,
                   channel_multiplier=1, narrow=0.25).eval()
        z = torch.randn(2, 32)
        img, _ = ref([z], randomize_noise=False)  # stored noise buffers
        want = img.numpy()
        sd = ref.state_dict()

    used = set()
    conv = cc.convert_stylegan2(sd, out_size=32, num_mlp=2, used=used)
    assert used == set(sd.keys()), sorted(set(sd.keys()) - used)[:8]
    noises = [jnp.asarray(nz) for nz in conv.pop("_noises")]
    ours = StyleGAN2Generator(out_size=32, num_style_feat=32, num_mlp=2,
                              channel_multiplier=1, narrow=0.25)
    got = ours.apply(conv, jnp.asarray(z.numpy()), noises=noises)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=5e-4)


def test_stylegan2_discriminator_oracle():
    _patch_ref_stylegan_ops()
    from basicsr.archs.stylegan2_arch import StyleGAN2Discriminator as RefD

    from mgldvsr_tpu.models.heritage.stylegan2 import StyleGAN2Discriminator

    with torch.no_grad():
        ref = RefD(out_size=32, channel_multiplier=1, narrow=0.25).eval()
        x = torch.randn(4, 3, 32, 32)
        want = ref(x).numpy()
        sd = ref.state_dict()
    used = set()
    params = cc.convert_stylegan2_discriminator(sd, in_size=32, used=used)
    assert used == set(sd.keys()), sorted(set(sd.keys()) - used)[:8]
    ours = StyleGAN2Discriminator(in_size=32, channel_multiplier=1,
                                  narrow=0.25)
    got = ours.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4)


def test_toflow_oracle():
    from basicsr.archs.tof_arch import TOFlow as RefTOF

    from mgldvsr_tpu.models.heritage.misc_archs import TOFlow

    with torch.no_grad():
        ref = RefTOF(adapt_official_weights=False).eval()
        # randomize BN stats too so the frozen-BN fold is non-trivial
        sd = ref.state_dict()
        rs = np.random.RandomState(7)
        for k, v in sd.items():
            if k.endswith("num_batches_tracked") or k in ("mean", "std"):
                continue
            arr = rs.standard_normal(tuple(v.shape)) * 0.1
            if "running_var" in k:
                arr = np.abs(arr) + 0.5
            sd[k] = torch.from_numpy(arr.astype(np.float32))
        ref.load_state_dict(sd)
        x = torch.rand(1, 7, 3, 32, 32)
        want = ref(x).numpy()
    used = set()
    params = cc.convert_toflow(sd, used=used)
    assert used == set(sd.keys()), sorted(set(sd.keys()) - used)[:8]
    ours = TOFlow(adapt_official_weights=False)
    got = ours.apply(params, jnp.asarray(x.numpy().transpose(0, 1, 3, 4, 2)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=5e-4)


def test_duf_oracle():
    from basicsr.archs.duf_arch import DUF as RefDUF

    from mgldvsr_tpu.models.heritage.misc_archs import DUF

    with torch.no_grad():
        ref = RefDUF(scale=4, num_layer=16).eval()
        sd = ref.state_dict()
        rs = np.random.RandomState(8)
        for k, v in sd.items():
            if k.endswith("num_batches_tracked"):
                continue
            arr = rs.standard_normal(tuple(v.shape)) * 0.1
            if "running_var" in k:
                arr = np.abs(arr) + 0.5
            sd[k] = torch.from_numpy(arr.astype(np.float32))
        ref.load_state_dict(sd)
        x = torch.rand(1, 7, 3, 16, 16)
        want = ref(x).numpy()
    used = set()
    params = cc.convert_duf(sd, num_layer=16, used=used)
    assert used == set(sd.keys()), sorted(set(sd.keys()) - used)[:8]
    ours = DUF(scale=4, num_layer=16)
    got = ours.apply(params, jnp.asarray(x.numpy().transpose(0, 1, 3, 4, 2)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=5e-4)


def test_ridnet_oracle():
    from basicsr.archs.ridnet_arch import RIDNet as RefRID

    from mgldvsr_tpu.models.heritage.misc_archs import RIDNet

    with torch.no_grad():
        ref = RefRID(in_channels=3, mid_channels=16, out_channels=3,
                     num_block=2).eval()
        x = torch.rand(1, 3, 16, 16)
        want = ref(x).numpy()
        sd = ref.state_dict()
    used = set()
    params = cc.convert_ridnet(sd, num_block=2, used=used)
    assert used == set(sd.keys()), sorted(set(sd.keys()) - used)[:8]
    ours = RIDNet(num_feat=16, num_block=2)
    got = ours.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=5e-4)


def test_ecbsr_oracle():
    """Training-form reference ECBSR in eval (which itself uses the folded
    rep_params) vs our deploy module through the rep-folding converter."""
    from basicsr.archs.ecbsr_arch import ECBSR as RefECB

    from mgldvsr_tpu.models.heritage.misc_archs import ECBSR

    for with_idt in (False, True):
        with torch.no_grad():
            ref = RefECB(num_in_ch=3, num_out_ch=3, num_block=2,
                         num_channel=8, with_idt=with_idt,
                         act_type="prelu", scale=4).eval()
            x = torch.rand(1, 3, 16, 16)
            want = ref(x).numpy()
            sd = ref.state_dict()
        used = set()
        params = cc.convert_ecbsr(sd, num_block=2, with_idt=with_idt,
                                  used=used)
        leftovers = {k for k in (set(sd.keys()) - used) if "mask" not in k}
        assert not leftovers, sorted(leftovers)[:8]
        ours = ECBSR(num_feat=8, num_block=2, upscale=4)
        got = ours.apply(params,
                         jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want, atol=5e-4,
            err_msg=f"with_idt={with_idt}")
