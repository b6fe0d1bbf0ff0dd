"""Video SR backbones: BasicVSR, IconVSR-style EDVR pieces, BasicVSR++,
and the flow-propagation CouplePropModule.

Capability parity (structure studied, rebuilt TPU-first):
- BasicVSR (/root/reference/basicsr/archs/basicvsr_arch.py): SpyNet flows +
  bidirectional recurrent propagation (30 residual blocks each way) +
  pixel-shuffle reconstruction. The frame recurrence runs under
  ``jax.lax.scan`` — one compiled step reused across time.
- EDVR (basicsr/archs/edvr_arch.py): PCD alignment (3-level pyramid of
  DCNv2 with cascading offsets) + TSA fusion (temporal attention +
  pyramid spatial attention) + reconstruction.
- BasicVSR++ (basicsr/archs/basicvsrpp_arch.py): second-order grid
  propagation with flow-guided deformable alignment.
- CouplePropModule (basicsr/archs/tempo_model_arch.py:29-199): the latent
  flow-propagation module used by VideoEncoderUNetModelWT.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mgldvsr_tpu.models.heritage.sr_archs import ResidualBlockNoBN, pixel_shuffle
from mgldvsr_tpu.ops.dcn import modulated_deform_conv2d
from mgldvsr_tpu.ops.resize import resize2d
from mgldvsr_tpu.ops.warp import flow_warp


def _conv(f, k=3, name=None, s=1):
    return nn.Conv(f, (k, k), strides=(s, s), padding=k // 2, name=name,
                   param_dtype=jnp.float32)


class ConvResidualBlocks(nn.Module):
    num_feat: int = 64
    num_block: int = 30

    @nn.compact
    def __call__(self, x):
        h = nn.leaky_relu(_conv(self.num_feat, name="conv_in")(x), 0.1)
        for i in range(self.num_block):
            h = ResidualBlockNoBN(self.num_feat, name=f"block_{i}")(h)
        return h


class BasicVSR(nn.Module):
    """frames [B,T,H,W,3] in [0,1] + precomputed flows -> [B,T,4H,4W,3].

    Flows are passed in (from the shared SpyNet/RAFT towers) to keep the
    module pure; ``compute_clip_flows`` supplies them."""

    num_feat: int = 64
    num_block: int = 15

    @nn.compact
    def __call__(self, frames, flows_forward, flows_backward):
        b, t, h, w, c = frames.shape
        backward_branch = ConvResidualBlocks(self.num_feat, self.num_block,
                                             name="backward_trunk")
        forward_branch = ConvResidualBlocks(self.num_feat, self.num_block,
                                            name="forward_trunk")
        fusion = _conv(self.num_feat, 1, name="fusion")
        upconv1 = _conv(self.num_feat * 4, name="upconv1")
        upconv2 = _conv(64 * 4, name="upconv2")
        conv_hr = _conv(64, name="conv_hr")
        conv_last = _conv(3, name="conv_last")
        lrelu = lambda z: nn.leaky_relu(z, 0.1)

        # backward propagation (t-1 .. 0)
        def bwd_step(feat_prop, inp):
            frame, flow = inp
            feat_prop = flow_warp(feat_prop, flow)
            feat_prop = backward_branch(
                jnp.concatenate([frame, feat_prop], axis=-1))
            return feat_prop, feat_prop

        zeros = jnp.zeros((b, h, w, self.num_feat), frames.dtype)
        frames_rev = frames[:, ::-1].swapaxes(0, 1)  # [T,B,...]
        flows_b_rev = jnp.concatenate(
            [jnp.zeros_like(flows_backward[:, :1]), flows_backward], 1
        )[:, ::-1].swapaxes(0, 1)
        _, feats_bwd = _manual_scan(bwd_step, zeros,
                                    (frames_rev, flows_b_rev), t)
        feats_bwd = feats_bwd[::-1]

        # forward propagation + upsampling
        outs = []
        feat_prop = jnp.zeros((b, h, w, self.num_feat), frames.dtype)
        for i in range(t):
            frame = frames[:, i]
            if i > 0:
                feat_prop = flow_warp(feat_prop, flows_forward[:, i - 1])
            feat_prop = forward_branch(
                jnp.concatenate([frame, feat_prop], axis=-1))
            cat = jnp.concatenate([feats_bwd[i], feat_prop], axis=-1)
            out = lrelu(fusion(cat))
            out = lrelu(pixel_shuffle(upconv1(out), 2))
            out = lrelu(pixel_shuffle(upconv2(out), 2))
            out = lrelu(conv_hr(out))
            out = conv_last(out)
            base = resize2d(frame, (h * 4, w * 4), "bilinear")
            outs.append(out + base)
        return jnp.stack(outs, axis=1)


def _manual_scan(step, init, xs, length):
    """Static unroll helper (flax modules inside — params tied per call)."""
    carry = init
    ys = []
    for i in range(length):
        carry, y = step(carry, jax.tree_util.tree_map(lambda a: a[i], xs))
        ys.append(y)
    return carry, ys


class PCDAlignment(nn.Module):
    """Pyramid-cascading-deformable alignment (EDVR)."""

    num_feat: int = 64
    deform_groups: int = 8

    @nn.compact
    def __call__(self, nbr_pyr: Sequence[jnp.ndarray],
                 ref_pyr: Sequence[jnp.ndarray]):
        lrelu = lambda z: nn.leaky_relu(z, 0.1)
        k = 9
        upsampled_offset = None
        upsampled_feat = None
        feat = None
        for lvl in (3, 2, 1):
            nbr, ref = nbr_pyr[lvl - 1], ref_pyr[lvl - 1]
            off = lrelu(_conv(self.num_feat,
                              name=f"offset_conv1_l{lvl}")(
                jnp.concatenate([nbr, ref], -1)))
            if lvl < 3:
                off = lrelu(_conv(self.num_feat, name=f"offset_conv2_l{lvl}")(
                    jnp.concatenate([off, upsampled_offset], -1)))
                off = lrelu(_conv(self.num_feat, name=f"offset_conv3_l{lvl}")(off))
            else:
                off = lrelu(_conv(self.num_feat, name=f"offset_conv2_l{lvl}")(off))

            dcn_off = _conv(3 * self.deform_groups * k,
                            name=f"dcn_offset_l{lvl}")(off)
            o1, o2, m = jnp.split(dcn_off, 3, axis=-1)
            # DCNv2Pack offset layout (arch_util.py:323-326): plain channel
            # concat of the two chunks, interpreted [g][tap][(y,x)]
            offset = jnp.concatenate([o1, o2], axis=-1)
            mask = jax.nn.sigmoid(m)
            w_dcn = self.param(f"dcn_weight_l{lvl}",
                               nn.initializers.lecun_normal(),
                               (3, 3, self.num_feat, self.num_feat))
            b_dcn = self.param(f"dcn_bias_l{lvl}", nn.initializers.zeros,
                               (self.num_feat,))
            feat = modulated_deform_conv2d(
                nbr, offset, mask, w_dcn, b_dcn,
                deform_groups=self.deform_groups)
            if lvl < 3:
                feat = _conv(self.num_feat, name=f"feat_conv_l{lvl}")(
                    jnp.concatenate([feat, upsampled_feat], -1))
            if lvl > 1:
                feat = lrelu(feat)
                up = lambda z: 2.0 * resize2d(
                    z, (z.shape[1] * 2, z.shape[2] * 2), "bilinear")
                upsampled_offset = up(off)
                upsampled_feat = resize2d(
                    feat, (feat.shape[1] * 2, feat.shape[2] * 2), "bilinear")

        # cascading refinement at level 1
        ref = ref_pyr[0]
        off = lrelu(_conv(self.num_feat, name="cas_offset_conv1")(
            jnp.concatenate([feat, ref], -1)))
        off = lrelu(_conv(self.num_feat, name="cas_offset_conv2")(off))
        dcn_off = _conv(3 * self.deform_groups * k, name="cas_dcn_offset")(off)
        o1, o2, m = jnp.split(dcn_off, 3, axis=-1)
        offset = jnp.concatenate([o1, o2], axis=-1)
        w_dcn = self.param("cas_dcn_weight", nn.initializers.lecun_normal(),
                           (3, 3, self.num_feat, self.num_feat))
        b_dcn = self.param("cas_dcn_bias", nn.initializers.zeros,
                           (self.num_feat,))
        feat = modulated_deform_conv2d(
            feat, offset, jax.nn.sigmoid(m), w_dcn, b_dcn,
            deform_groups=self.deform_groups)
        return lrelu(feat)


class TSAFusion(nn.Module):
    """Temporal + spatial attention fusion (EDVR, edvr_arch.py TSAFusion):
    frame-correlation temporal weighting, then a two-level max/avg-pool
    spatial-attention pyramid with the reference's exact conv sizes."""

    num_feat: int = 64
    num_frame: int = 5
    center: int = 2

    @nn.compact
    def __call__(self, aligned):  # [B, T, H, W, C]
        b, t, h, w, c = aligned.shape
        lrelu = lambda z: nn.leaky_relu(z, 0.1)
        pool_kw = dict(window_shape=(3, 3), strides=(2, 2),
                       padding=((1, 1), (1, 1)))
        emb_ref = _conv(self.num_feat, name="temporal_attn1")(
            aligned[:, self.center])
        emb = _conv(self.num_feat, name="temporal_attn2")(
            aligned.reshape(b * t, h, w, c)).reshape(b, t, h, w, -1)
        corr = jnp.sum(emb * emb_ref[:, None], axis=-1, keepdims=True)
        prob = jax.nn.sigmoid(corr)
        # torch flattens [b,t,c,h,w] -> [b, t*c, h, w]: t-major channels
        al = (aligned * prob).transpose(0, 2, 3, 1, 4).reshape(b, h, w, t * c)
        feat = lrelu(_conv(self.num_feat, 1, name="feat_fusion")(al))

        # spatial attention pyramid (two pooled levels)
        attn = lrelu(_conv(self.num_feat, 1, name="spatial_attn1")(al))
        attn_max = nn.max_pool(attn, **pool_kw)
        attn_avg = nn.avg_pool(attn, **pool_kw, count_include_pad=True)
        attn = lrelu(_conv(self.num_feat, 1, name="spatial_attn2")(
            jnp.concatenate([attn_max, attn_avg], -1)))
        attn_level = lrelu(_conv(self.num_feat, 1, name="spatial_attn_l1")(
            attn))
        al_max = nn.max_pool(attn_level, **pool_kw)
        al_avg = nn.avg_pool(attn_level, **pool_kw, count_include_pad=True)
        attn_level = lrelu(_conv(self.num_feat, name="spatial_attn_l2")(
            jnp.concatenate([al_max, al_avg], -1)))
        attn_level = lrelu(_conv(self.num_feat, name="spatial_attn_l3")(
            attn_level))
        attn_level = resize2d(
            attn_level, (attn.shape[1], attn.shape[2]), "bilinear")
        attn = lrelu(_conv(self.num_feat, name="spatial_attn3")(attn)) \
            + attn_level
        attn = lrelu(_conv(self.num_feat, 1, name="spatial_attn4")(attn))
        attn = resize2d(attn, (h, w), "bilinear")
        attn = _conv(self.num_feat, name="spatial_attn5")(attn)
        attn_add = _conv(self.num_feat, 1, name="spatial_attn_add2")(
            lrelu(_conv(self.num_feat, 1, name="spatial_attn_add1")(attn)))
        return feat * jax.nn.sigmoid(attn) * 2 + attn_add


class EDVR(nn.Module):
    """EDVR video restoration: pyramid features -> PCD align to the center
    frame -> TSA fusion -> reconstruction + x4 pixel-shuffle."""

    num_feat: int = 64
    num_frame: int = 5
    num_extract_block: int = 5
    num_reconstruct_block: int = 10
    deform_groups: int = 8

    @nn.compact
    def __call__(self, frames):  # [B,T,H,W,3]
        b, t, h, w, _ = frames.shape
        center = t // 2
        lrelu = lambda z: nn.leaky_relu(z, 0.1)
        x = frames.reshape(b * t, h, w, 3)
        feat = lrelu(_conv(self.num_feat, name="conv_first")(x))
        for i in range(self.num_extract_block):
            feat = ResidualBlockNoBN(self.num_feat, name=f"extract_{i}")(feat)
        l1 = feat
        l2 = lrelu(_conv(self.num_feat, name="conv_l2_1", s=2)(l1))
        l2 = lrelu(_conv(self.num_feat, name="conv_l2_2")(l2))
        l3 = lrelu(_conv(self.num_feat, name="conv_l3_1", s=2)(l2))
        l3 = lrelu(_conv(self.num_feat, name="conv_l3_2")(l3))

        def pyr(z, lvl_h, lvl_w, cdim):
            return z.reshape(b, t, lvl_h, lvl_w, cdim)

        l1p = pyr(l1, h, w, self.num_feat)
        l2p = pyr(l2, h // 2, w // 2, self.num_feat)
        l3p = pyr(l3, h // 4, w // 4, self.num_feat)

        pcd = PCDAlignment(self.num_feat, self.deform_groups, name="pcd")
        ref_pyr = [l1p[:, center], l2p[:, center], l3p[:, center]]
        aligned = jnp.stack(
            [pcd([l1p[:, i], l2p[:, i], l3p[:, i]], ref_pyr)
             for i in range(t)],
            axis=1,
        )
        feat = TSAFusion(self.num_feat, t, center, name="fusion")(aligned)
        for i in range(self.num_reconstruct_block):
            feat = ResidualBlockNoBN(self.num_feat, name=f"recon_{i}")(feat)
        feat = lrelu(pixel_shuffle(_conv(self.num_feat * 4,
                                         name="upconv1")(feat), 2))
        feat = lrelu(pixel_shuffle(_conv(64 * 4, name="upconv2")(feat), 2))
        feat = lrelu(_conv(64, name="conv_hr")(feat))
        out = _conv(3, name="conv_last")(feat)
        base = resize2d(frames[:, center], (h * 4, w * 4), "bilinear")
        return out + base


class SecondOrderDeformAlign(nn.Module):
    """BasicVSR++ second-order flow-guided deformable alignment
    (basicvsrpp_arch.py:347-422 ``SecondOrderDeformableAlignment``):
    offsets = max_residue_magnitude * tanh(conv_offset(cond, flows)) with
    the two flows added as tiled (y,x) bases, mask sigmoided, DCN over the
    concatenated [feat_prop, feat_n2] (2C channels)."""

    num_feat: int = 64
    deform_groups: int = 16
    max_residue_magnitude: float = 10.0

    @nn.compact
    def __call__(self, x, cond, flow1, flow2):
        g = self.deform_groups
        lrelu = lambda z: nn.leaky_relu(z, 0.1)
        ef = jnp.concatenate([cond, flow1, flow2], axis=-1)
        h1 = lrelu(_conv(self.num_feat, name="offset_conv1")(ef))
        h1 = lrelu(_conv(self.num_feat, name="offset_conv2")(h1))
        h1 = lrelu(_conv(self.num_feat, name="offset_conv3")(h1))
        out = _conv(27 * g, name="offset_conv4")(h1)
        o1, o2, m = jnp.split(out, 3, axis=-1)
        offset = self.max_residue_magnitude * jnp.tanh(
            jnp.concatenate([o1, o2], axis=-1))
        off1, off2 = jnp.split(offset, 2, axis=-1)
        # flow.flip(1) in NCHW = (y, x) channel order, tiled across taps
        f1 = jnp.stack([flow1[..., 1], flow1[..., 0]], -1)
        f2 = jnp.stack([flow2[..., 1], flow2[..., 0]], -1)
        off1 = off1 + jnp.tile(f1, (1, 1, 1, off1.shape[-1] // 2))
        off2 = off2 + jnp.tile(f2, (1, 1, 1, off2.shape[-1] // 2))
        offset = jnp.concatenate([off1, off2], axis=-1)
        mask = jax.nn.sigmoid(m)
        cin = x.shape[-1]
        w_dcn = self.param("dcn_weight", nn.initializers.lecun_normal(),
                           (3, 3, cin, self.num_feat))
        b_dcn = self.param("dcn_bias", nn.initializers.zeros,
                           (self.num_feat,))
        return modulated_deform_conv2d(x, offset, mask, w_dcn, b_dcn,
                                       deform_groups=g)


BVPP_BRANCHES = ("backward_1", "forward_1", "backward_2", "forward_2")


class BasicVSRPlusPlus(nn.Module):
    """BasicVSR++ (basicvsrpp_arch.py:17-345): the full second-order
    4-branch grid propagation (backward_1/forward_1/backward_2/forward_2),
    each branch with flow-guided second-order deformable alignment and a
    growing-width residual backbone, then 5C reconstruction + x4
    pixel-shuffle. Flows are inputs (shared SpyNet tower)."""

    num_feat: int = 64
    num_block: int = 7
    deform_groups: int = 16

    @nn.compact
    def __call__(self, frames, flows_forward, flows_backward):
        b, t, h, w, _ = frames.shape
        lrelu = lambda z: nn.leaky_relu(z, 0.1)
        spatial = ConvResidualBlocks(self.num_feat, 5, name="feat_extract")(
            frames.reshape(b * t, h, w, 3)).reshape(
                b, t, h, w, self.num_feat)

        feats = {"spatial": [spatial[:, i] for i in range(t)]}
        for bi, name in enumerate(BVPP_BRANCHES):
            align = SecondOrderDeformAlign(
                self.num_feat, self.deform_groups,
                name=f"deform_align_{name}")
            backbone = ConvResidualBlocks(self.num_feat, self.num_block,
                                          name=f"backbone_{name}")
            backward = "backward" in name
            flows = flows_backward if backward else flows_forward
            frame_idx = list(range(t))[::-1] if backward else list(range(t))
            flow_idx = (frame_idx if backward
                        else [-1] + list(range(t - 1)))
            feats[name] = []
            feat_prop = jnp.zeros((b, h, w, self.num_feat), frames.dtype)
            for i, idx in enumerate(frame_idx):
                feat_current = feats["spatial"][idx]
                if i > 0:
                    flow_n1 = flows[:, flow_idx[i]]
                    cond_n1 = flow_warp(feat_prop, flow_n1)
                    feat_n2 = jnp.zeros_like(feat_prop)
                    flow_n2 = jnp.zeros_like(flow_n1)
                    cond_n2 = jnp.zeros_like(cond_n1)
                    if i > 1:  # second-order connection
                        feat_n2 = feats[name][-2]
                        flow_n2 = flows[:, flow_idx[i - 1]]
                        flow_n2 = flow_n1 + flow_warp(flow_n2, flow_n1)
                        cond_n2 = flow_warp(feat_n2, flow_n2)
                    cond = jnp.concatenate(
                        [cond_n1, feat_current, cond_n2], -1)
                    feat_prop = align(
                        jnp.concatenate([feat_prop, feat_n2], -1),
                        cond, flow_n1, flow_n2)
                feat = jnp.concatenate(
                    [feat_current]
                    + [feats[k][idx] for k in feats
                       if k not in ("spatial", name)]
                    + [feat_prop], -1)
                feat_prop = feat_prop + backbone(feat)
                feats[name].append(feat_prop)
            if backward:
                feats[name] = feats[name][::-1]

        recon = ConvResidualBlocks(self.num_feat, 5, name="reconstruction")
        up1 = _conv(self.num_feat * 4, name="upconv1")
        up2 = _conv(64 * 4, name="upconv2")
        conv_hr = _conv(64, name="conv_hr")
        conv_last = _conv(3, name="conv_last")
        outs = []
        for i in range(t):
            hr = jnp.concatenate(
                [feats["spatial"][i]] + [feats[k][i] for k in BVPP_BRANCHES],
                -1)
            hr = recon(hr)
            hr = lrelu(pixel_shuffle(up1(hr), 2))
            hr = lrelu(pixel_shuffle(up2(hr), 2))
            hr = conv_last(lrelu(conv_hr(hr)))
            base = resize2d(frames[:, i], (h * 4, w * 4), "bilinear")
            outs.append(hr + base)
        return jnp.stack(outs, axis=1)


class CouplePropModule(nn.Module):
    """Bidirectional flow-guided latent propagation
    (tempo_model_arch.py:29-95): warp the propagated hidden state with the
    given flows, fuse with the current latent through residual trunks, and
    emit per-frame residual corrections (conv_last(prop) + latent).

    The reference also declares ``backward_fusion``/``forward_fusion`` convs
    its forward never uses — declared here too so checkpoints round-trip."""

    num_ch: int = 4
    num_feat: int = 64
    num_block: int = 5

    @nn.compact
    def __call__(self, latents, flows_forward, flows_backward):
        from mgldvsr_tpu.models.layers import _ConvParams

        b, t, h, w, c = latents.shape
        bwd_trunk = ConvResidualBlocks(self.num_feat, self.num_block,
                                       name="backward_trunk")
        fwd_trunk = ConvResidualBlocks(self.num_feat, self.num_block,
                                       name="forward_trunk")
        conv_last = _conv(self.num_ch, name="conv_last")
        # dead-but-checkpointed convs (tempo_model_arch.py:49,52)
        _ConvParams(2 * self.num_feat, self.num_feat,
                    name="backward_fusion")()
        _ConvParams(2 * self.num_feat, self.num_feat,
                    name="forward_fusion")()

        bwd = [None] * t
        prop = jnp.zeros((b, h, w, self.num_feat), latents.dtype)
        for i in range(t - 1, -1, -1):
            if i < t - 1:
                prop = flow_warp(prop, flows_backward[:, i])
            prop = bwd_trunk(jnp.concatenate([latents[:, i], prop], -1))
            bwd[i] = prop
        outs = []
        prop = jnp.zeros((b, h, w, self.num_feat), latents.dtype)
        for i in range(t):
            if i > 0:
                prop = flow_warp(prop, flows_forward[:, i - 1])
            prop = fwd_trunk(
                jnp.concatenate([latents[:, i], bwd[i], prop], -1))
            outs.append(latents[:, i] + conv_last(prop))
        return jnp.stack(outs, axis=1)
