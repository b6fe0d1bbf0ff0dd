"""Face-restoration heritage architectures: DFDNet and HiFaceGAN.

Capability parity (structure studied, rebuilt channels-last flax):
- DFDNet (basicsr/archs/dfdnet_arch.py:57-169 + dfdnet_util.py): deep face
  dictionary network — VGG19-face multi-scale features, per-part (eyes /
  nose / mouth) dictionary feature swap with AdaIN + similarity argmax +
  attention, MS-dilation bottleneck, SFT-modulated upsampling decoder.
- HiFaceGAN (basicsr/archs/hifacegan_arch.py + hifacegan_util.py): SPADE
  renovation generator — LIP (local-importance pooling) encoder, SPADE
  ResNet trunk with the input image as the "segmentation" map, multiscale
  PatchGAN discriminator.

TPU notes: spectral norm is FOLDED at weight-conversion time (eval-mode
torch spectral_norm is just ``W / sigma(W)`` with the stored u/v — see
``io.ckpt_convert.fold_spectral_norm``), so every conv here is a plain MXU
conv. DFDNet's per-part dictionary swap operates on data-dependent face
boxes, so — exactly like the reference, which supports only batch-1
testing (dfdnet_arch.py:137-141) — the part logic runs as host
orchestration over jittable fixed-shape pieces.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Mapping, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def _conv(f, k=3, name=None, s=1, dilation=1, use_bias=True):
    return nn.Conv(f, (k, k), strides=(s, s),
                   padding=((k - 1) // 2) * dilation,
                   kernel_dilation=(dilation, dilation), use_bias=use_bias,
                   name=name, param_dtype=jnp.float32)


def lrelu(x, slope=0.2):
    return jax.nn.leaky_relu(x, slope)


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Per-sample, per-channel normalization over H,W (torch
    InstanceNorm2d(affine=False) semantics: biased variance)."""
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def adaptive_instance_norm(content: jnp.ndarray,
                           style: jnp.ndarray) -> jnp.ndarray:
    """AdaIN with torch-unbiased std (dfdnet_util.py:57-89): move the
    content features onto the style features' per-channel statistics."""

    def stats(f):
        mean = f.mean(axis=(1, 2), keepdims=True)
        n = f.shape[1] * f.shape[2]
        var = f.var(axis=(1, 2), keepdims=True) * (n / max(n - 1, 1))
        return mean, jnp.sqrt(var + 1e-5)

    c_mean, c_std = stats(content)
    s_mean, s_std = stats(style)
    return (content - c_mean) / c_std * s_std + s_mean


# ---------------------------------------------------------------------------
# VGG19-face feature extractor
# ---------------------------------------------------------------------------

_VGG19_PLAN: Sequence[Tuple[str, int]] = (
    ("conv1_1", 64), ("conv1_2", 64),
    ("conv2_1", 128), ("conv2_2", 128),
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), ("conv3_4", 256),
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), ("conv4_4", 512),
    ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512), ("conv5_4", 512),
)

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class VGG19Features(nn.Module):
    """VGG19 trunk with named-layer taps (basicsr/archs/vgg_arch.py
    ``VGGFeatureExtractor``): taps may name either the conv output
    (``convN_M``) or its relu (``reluN_M``); max-pool between blocks.
    ``range_norm`` maps [-1,1]->[0,1] first; ImageNet normalization."""

    taps: Sequence[str] = ("relu2_2", "relu3_4", "relu4_4", "conv5_4")
    use_input_norm: bool = True
    range_norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        if self.range_norm:
            x = (x + 1.0) / 2.0
        if self.use_input_norm:
            x = (x - jnp.asarray(IMAGENET_MEAN, x.dtype)) / jnp.asarray(
                IMAGENET_STD, x.dtype)
        out: Dict[str, jnp.ndarray] = {}
        # deepest tap bounds the trunk depth
        needed = max(
            i for i, (name, _) in enumerate(_VGG19_PLAN)
            if name in self.taps or f"relu{name[4:]}" in self.taps)
        prev_block = "1"
        for i, (name, ch) in enumerate(_VGG19_PLAN):
            if i > needed:
                break
            block = name[4]
            if block != prev_block:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                prev_block = block
            x = _conv(ch, name=name)(x)
            if name in self.taps:
                out[name] = x
            x = nn.relu(x)
            rname = f"relu{name[4:]}"
            if rname in self.taps:
                out[rname] = x
        return out


# ---------------------------------------------------------------------------
# DFDNet
# ---------------------------------------------------------------------------


class Blur(nn.Module):
    """Fixed binomial 3x3 anti-alias blur, depthwise (dfdnet_util.py:41-55)."""

    @nn.compact
    def __call__(self, x):
        k = jnp.asarray([[1, 2, 1], [2, 4, 2], [1, 2, 1]], x.dtype) / 16.0
        c = x.shape[-1]
        kern = jnp.tile(k[:, :, None, None], (1, 1, 1, c))
        return jax.lax.conv_general_dilated(
            x, kern, (1, 1), [(1, 1), (1, 1)], feature_group_count=c,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class AttentionBlock(nn.Module):
    """conv-lrelu-conv (dfdnet_util.py:92-96)."""

    channels: int

    @nn.compact
    def __call__(self, x):
        h = lrelu(_conv(self.channels, name="conv1")(x))
        return _conv(self.channels, name="conv2")(h)


class MSDilationBlock(nn.Module):
    """4 parallel double-conv branches at different dilations, concat +
    fusion conv + residual (dfdnet_util.py:123-148)."""

    channels: int
    dilations: Sequence[int] = (4, 3, 2, 1)

    @nn.compact
    def __call__(self, x):
        outs = []
        for i, d in enumerate(self.dilations):
            h = lrelu(_conv(self.channels, dilation=d, name=f"b{i}_conv1")(x))
            h = _conv(self.channels, dilation=d, name=f"b{i}_conv2")(h)
            outs.append(h)
        h = jnp.concatenate(outs, axis=-1)
        return _conv(self.channels, name="fusion")(h) + x


class UpResBlock(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        h = lrelu(_conv(self.channels, name="conv1")(x))
        return x + _conv(self.channels, name="conv2")(h)


class SFTUpBlock(nn.Module):
    """Blur + conv, SFT scale/shift from the dictionary-updated features,
    2x bilinear upsample (dfdnet_arch.py:12-54). The reference's stacked
    double-LeakyReLU is the single lrelu(0.04); the shift branch ends in
    sigmoid (quirk kept)."""

    out_channels: int

    @nn.compact
    def __call__(self, x, updated_feat):
        h = Blur(name="blur")(x)
        h = lrelu(_conv(self.out_channels, name="conv1")(h), 0.04)
        scale = _conv(self.out_channels, name="scale1")(updated_feat)
        scale = _conv(self.out_channels, name="scale2",
                      use_bias=False)(lrelu(scale))
        shift = _conv(self.out_channels, name="shift1")(updated_feat)
        shift = jax.nn.sigmoid(
            _conv(self.out_channels, name="shift2", use_bias=False)(
                lrelu(shift)))
        h = h * scale + shift
        b, hh, ww, c = h.shape
        h = jax.image.resize(h, (b, hh * 2, ww * 2, c), method="bilinear")
        return lrelu(_conv(self.out_channels, name="convup")(h))


class DFDNetDecoder(nn.Module):
    """The jittable half of DFDNet: MS-dilation bottleneck + 4 SFT up
    blocks + final reconstruction (dfdnet_arch.py:99-107,160-169)."""

    num_feat: int = 64

    @nn.compact
    def __call__(self, conv5_feat, updated_feats: Sequence[jnp.ndarray]):
        nf = self.num_feat
        h = MSDilationBlock(nf * 8, name="msdilate")(conv5_feat)
        h = SFTUpBlock(nf * 8, name="up0")(h, updated_feats[3])
        h = SFTUpBlock(nf * 4, name="up1")(h, updated_feats[2])
        h = SFTUpBlock(nf * 2, name="up2")(h, updated_feats[1])
        h = SFTUpBlock(nf, name="up3")(h, updated_feats[0])
        h = lrelu(_conv(nf, name="out_conv")(h))
        h = UpResBlock(nf, name="out_res1")(h)
        h = UpResBlock(nf, name="out_res2")(h)
        return jnp.tanh(_conv(3, name="out_rgb")(h))


PARTS = ("left_eye", "right_eye", "nose", "mouth")
FEATURE_SIZES = (256, 128, 64, 32)
CHANNEL_SIZES = (128, 256, 512, 512)
VGG_TAPS = ("relu2_2", "relu3_4", "relu4_4", "conv5_4")


class DFDNet:
    """Host-orchestrated DFDNet (dfdnet_arch.py:57-169).

    ``dictionary``: {f_size(str or int): {part: [N, h, w, C] array}} — the
    offline facial-component feature dictionary. Forward is batch-1 (the
    reference supports only that) with data-dependent part boxes handled
    on host; each compute piece (VGG tower, attention, decoder) is flax.
    """

    def __init__(self, num_feat: int = 64,
                 dictionary: Mapping[Any, Mapping[str, jnp.ndarray]] = None):
        self.num_feat = num_feat
        self.dictionary = dictionary or {}
        self.vgg = VGG19Features(taps=VGG_TAPS)
        self.decoder = DFDNetDecoder(num_feat)
        self.attn_blocks = {
            f"{part}_{fs}": AttentionBlock(ch)
            for fs, ch in zip(FEATURE_SIZES, CHANNEL_SIZES)
            for part in PARTS
        }

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        k = iter(jax.random.split(rng, 2 + len(self.attn_blocks)))
        params = {
            "vgg": self.vgg.init(next(k), jnp.zeros((1, 64, 64, 3))),
            "decoder": self.decoder.init(
                next(k), jnp.zeros((1, 32, 32, self.num_feat * 8)),
                [jnp.zeros((1, 256 // (2 ** i), 256 // (2 ** i), ch))
                 for i, ch in enumerate(CHANNEL_SIZES)]),
        }
        for name, blk in self.attn_blocks.items():
            ch = CHANNEL_SIZES[FEATURE_SIZES.index(int(name.rsplit("_", 1)[1]))]
            params[name] = blk.init(next(k), jnp.zeros((1, 8, 8, ch)))
        return params

    def _swap_part(self, params, vgg_feat, updated, box, part, f_size):
        """dfdnet_arch.py:109-127 — dictionary feature swap for one part."""
        x0, y0, x1, y1 = [int(v) for v in box]
        part_feat = vgg_feat[:, y0:y1, x0:x1, :]
        dict_feat = jnp.asarray(self.dictionary[str(f_size)][part])
        n, dh, dw, c = dict_feat.shape
        # torch F.interpolate(bilinear) does not antialias on downsample
        part_resize = jax.image.resize(
            part_feat, (1, dh, dw, c), method="bilinear", antialias=False)
        dict_feat = adaptive_instance_norm(dict_feat, part_resize)
        # similarity: valid conv of the part against every dict entry ==
        # one [1, dh*dw*c] x [dh*dw*c, n] matmul
        score = part_resize.reshape(1, -1) @ dict_feat.reshape(n, -1).T
        idx = int(jnp.argmax(jax.nn.softmax(score.reshape(-1))))
        swap = nearest_resize_torch(dict_feat[idx:idx + 1],
                                    y1 - y0, x1 - x0)
        attn = self.attn_blocks[f"{part}_{f_size}"].apply(
            params[f"{part}_{f_size}"], swap - part_feat)
        return updated.at[:, y0:y1, x0:x1, :].set(attn * swap + part_feat)

    def __call__(self, params, x: jnp.ndarray,
                 part_locations: Sequence[Sequence[float]]) -> jnp.ndarray:
        """x: [1,512,512,3] in [-1,1]; part_locations: 4 boxes
        (x0,y0,x1,y1) at 512 scale, order left_eye/right_eye/nose/mouth."""
        feats = self.vgg.apply(params["vgg"], x)
        updated_feats: List[jnp.ndarray] = []
        for tap, f_size in zip(VGG_TAPS, FEATURE_SIZES):
            vgg_feat = feats[tap]
            updated = vgg_feat
            for part_idx, part in enumerate(PARTS):
                box = [int(v // (512 / f_size))
                       for v in part_locations[part_idx]]
                if str(f_size) in {str(kk) for kk in self.dictionary}:
                    updated = self._swap_part(
                        params, vgg_feat, updated, box, part, f_size)
            updated_feats.append(updated)
        return self.decoder.apply(params["decoder"], feats["conv5_4"],
                                  updated_feats)


# ---------------------------------------------------------------------------
# HiFaceGAN
# ---------------------------------------------------------------------------


def nearest_resize_torch(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """torch legacy-``nearest`` interpolate (src = floor(dst * in/out)) —
    differs from jax.image.resize's half-pixel nearest on downsampling;
    needed for checkpoint output parity."""
    ih, iw = x.shape[1:3]
    ri = jnp.floor(jnp.arange(h) * (ih / h)).astype(jnp.int32)
    ci = jnp.floor(jnp.arange(w) * (iw / w)).astype(jnp.int32)
    return x[:, ri][:, :, ci]


class HFGSpade(nn.Module):
    """HiFaceGAN's SPADE (hifacegan_util.py:12-54): instance-norm
    param-free base (the syncbatch config degrades to instance on single
    device, as the reference does), nearest-resized guidance map, shared
    conv + gamma/beta convs (no bias)."""

    norm_nc: int
    label_nc: int = 3
    ks: int = 3

    @nn.compact
    def __call__(self, x, segmap):
        normalized = instance_norm(x)
        b, h, w, _ = x.shape
        seg = nearest_resize_torch(segmap, h, w)
        nhidden = 128 if self.norm_nc > 128 else self.norm_nc
        actv = nn.relu(_conv(nhidden, self.ks, name="mlp_shared")(seg))
        gamma = _conv(self.norm_nc, self.ks, name="mlp_gamma",
                      use_bias=False)(actv)
        beta = _conv(self.norm_nc, self.ks, name="mlp_beta",
                     use_bias=False)(actv)
        return normalized * gamma + beta


class SPADEResnetBlock(nn.Module):
    """hifacegan_util.py:57-111 — norm-act-conv x2 with optional learned
    1x1 shortcut (fin != fout); lrelu slope 0.2."""

    fin: int
    fout: int

    @nn.compact
    def __call__(self, x, seg):
        fmiddle = min(self.fin, self.fout)
        dx = _conv(fmiddle, name="conv_0")(
            lrelu(HFGSpade(self.fin, name="norm_0")(x, seg)))
        dx = _conv(self.fout, name="conv_1")(
            lrelu(HFGSpade(fmiddle, name="norm_1")(dx, seg)))
        if self.fin != self.fout:
            x = _conv(self.fout, 1, name="conv_s", use_bias=False)(
                HFGSpade(self.fin, name="norm_s")(x, seg))
        return x + dx


def lip2d(x, logit, kernel=3, stride=2):
    """Local-importance pooling (hifacegan_util.py:154-156):
    avgpool(x*e^logit)/avgpool(e^logit)."""
    w = jnp.exp(logit)

    def avg(z):
        s = jax.lax.reduce_window(
            z, 0.0, jax.lax.add, (1, kernel, kernel, 1),
            (1, stride, stride, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])
        return s  # same window for num/den: normalizer cancels

    return avg(x * w) / (avg(w) + 1e-12)


class SimplifiedLIP(nn.Module):
    """hifacegan_util.py:166-180: logit = softgate(IN_affine(conv(x)))."""

    channels: int

    @nn.compact
    def __call__(self, x):
        h = _conv(self.channels, name="logit_conv", use_bias=False)(x)
        h = instance_norm(h)
        scale = self.param("in_scale", nn.initializers.ones, (self.channels,))
        bias = self.param("in_bias", nn.initializers.zeros, (self.channels,))
        h = h * scale + bias
        logit = jax.nn.sigmoid(h) * 12.0  # SoftGate COEFF
        return lip2d(x, logit)


class LIPEncoder(nn.Module):
    """hifacegan_util.py:182-214: conv-IN-relu stem, then n_2xdown LIP
    downsample stages (channel growth capped at 16x)."""

    ngf: int
    n_2xdown: int = 5

    @nn.compact
    def __call__(self, x):
        h = _conv(self.ngf, name="stem", use_bias=False)(x)
        h = nn.relu(instance_norm(h))
        cur = 1
        for i in range(self.n_2xdown):
            nxt = min(cur * 2, 16)
            h = SimplifiedLIP(self.ngf * cur, name=f"lip_{i}")(h)
            h = _conv(self.ngf * nxt, name=f"conv_{i}")(h)
            h = instance_norm(h)
            if i < self.n_2xdown - 1:
                h = nn.relu(h)
            cur = nxt
        return h


@dataclasses.dataclass(frozen=True)
class HiFaceGANConfig:
    num_in_ch: int = 3
    num_feat: int = 64
    lip_encoder: bool = True  # HiFaceGAN; False = plain SPADEGenerator
    n_up_stages: int = 4  # is_train phase: to_rgb index used = phase-1


class HiFaceGAN(nn.Module):
    """hifacegan_arch.py:10-165: encode (LIP or nearest-downsample+conv),
    SPADE head + 2 middle blocks + progressive up stages, tanh RGB."""

    cfg: HiFaceGANConfig = HiFaceGANConfig()

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        nf = cfg.num_feat
        seg = x
        if cfg.lip_encoder:
            h = LIPEncoder(nf, name="encoder")(x)
        else:
            hh, ww = x.shape[1:3]
            h = nearest_resize_torch(x, hh // 32, ww // 32)
            h = _conv(16 * nf, name="fc")(h)
        h = SPADEResnetBlock(16 * nf, 16 * nf, name="head_0")(h, seg)

        def up(z):
            return jnp.repeat(jnp.repeat(z, 2, axis=1), 2, axis=2)

        h = up(h)
        h = SPADEResnetBlock(16 * nf, 16 * nf, name="g_middle_0")(h, seg)
        h = SPADEResnetBlock(16 * nf, 16 * nf, name="g_middle_1")(h, seg)
        mults = (8, 4, 2, 1)
        for i in range(cfg.n_up_stages):
            h = up(h)
            fin = 16 * nf if i == 0 else mults[i - 1] * nf
            h = SPADEResnetBlock(fin, mults[i] * nf, name=f"ups_{i}")(h, seg)
        h = _conv(3, name=f"to_rgb_{cfg.n_up_stages - 1}")(lrelu(h))
        return jnp.tanh(h)


class NLayerDiscriminator(nn.Module):
    """PatchGAN stage (hifacegan_arch.py:223-262): k4 convs, stride 2
    (last body layer stride 1), spectral(folded)+instance norm, feature
    list output."""

    num_feat: int = 64
    n_layers: int = 4

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        results = []
        nf = self.num_feat
        h = lrelu(nn.Conv(nf, (4, 4), strides=(2, 2), padding=2,
                          name="conv0", param_dtype=jnp.float32)(x))
        results.append(h)
        for n in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            stride = 1 if n == self.n_layers - 1 else 2
            # norm-wrapped convs lose their bias in the reference
            # (get_nonspade_norm_layer removes it, hifacegan_util.py:236)
            h = nn.Conv(nf, (4, 4), strides=(stride, stride), padding=2,
                        use_bias=False, name=f"conv{n}",
                        param_dtype=jnp.float32)(h)
            h = lrelu(instance_norm(h))
            results.append(h)
        results.append(nn.Conv(1, (4, 4), padding=2, name="conv_out",
                               param_dtype=jnp.float32)(h))
        return results


class HiFaceGANDiscriminator(nn.Module):
    """Multiscale PatchGAN (hifacegan_arch.py:168-221): num_d stages, each
    on a 2x-downsampled (count_include_pad=False avg pool) input;
    conditional input is cat(lq, rendered)."""

    num_d: int = 2
    n_layers: int = 4
    num_feat: int = 64

    @nn.compact
    def __call__(self, x) -> List[List[jnp.ndarray]]:
        out = []
        for i in range(self.num_d):
            out.append(NLayerDiscriminator(
                self.num_feat, self.n_layers, name=f"d_{i}")(x))
            ones = jnp.ones_like(x[..., :1])
            num = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 2, 2, 1),
                [(0, 0), (1, 1), (1, 1), (0, 0)])
            den = jax.lax.reduce_window(
                ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 2, 2, 1),
                [(0, 0), (1, 1), (1, 1), (0, 0)])
            x = num / den
        return out
