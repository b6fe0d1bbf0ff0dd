"""SD-style KL autoencoders, including the temporal-aware video decoder with
CFW-style LQ-feature fusion.

Capability parity (structure studied, re-designed channels-last for TPU):
- Encoder with ``return_fea`` (multi-scale LQ features at down-levels 1 and 2):
  /root/reference/ldm/modules/diffusionmodules/model.py:473-572
- Decoder / VideoDecoder_Mix (temporal conv after every ResnetBlock + mid,
  Fuse_sft_block_ResidualDenseBlock at up-levels 1,2 weighted by fusion_w):
  model.py:575-684, 926-1056
- Fuse_sft_block_ResidualDenseBlock + RDB: model.py:1354-1367,
  /root/reference/basicsr/archs/rrdbnet_arch.py
- AutoencoderKL / VideoAutoencoderKLResi:
  /root/reference/ldm/models/autoencoder.py:299-456, 1564-2024
- DiagonalGaussianDistribution:
  /root/reference/ldm/modules/distributions/distributions.py:24-92

One parameterized Decoder covers the reference's Decoder / VideoDecoder /
Decoder_Mix / VideoDecoder_Mix zoo: ``num_frames>1`` enables temporal mixing,
``enable_fusion`` enables the LQ-feature fusion taps.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mgldvsr_tpu.models.layers import (
    VAEAttnBlock,
    VAEDownsample,
    VAEResnetBlock,
    Upsample,
    conv1x1,
    conv3x3,
    group_norm,
    norm_silu_conv3x3,
)
from mgldvsr_tpu.models.temporal import SpatialTemporalConv

Dtype = Any


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    ch: int = 128
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    resolution: int = 512
    in_channels: int = 3
    z_channels: int = 4
    double_z: bool = True
    embed_dim: int = 4
    dropout: float = 0.0
    num_frames: int = 1          # >1 => temporal mixing in the decoder
    enable_fusion: bool = False  # LQ-feature fusion taps (VideoDecoder_Mix)
    num_fuse_block: int = 2
    use_checkpoint: bool = False  # per-block activation remat (training):
    # stage-2 runs fwd+bwd over PIXEL-space activations (512^2 x frames),
    # where the un-rematerialized backward's residency is the limiting
    # factor — same lever as UNetConfig.use_checkpoint, same param tree.
    remat_min_res: int = 0  # selective remat: only blocks whose running
    # spatial height >= this value are rematerialized (0 = every block, the
    # r4 behavior). Memory blowup is dominated by the high-res levels
    # (512^2 x 128ch activations) while the recompute tax is paid per
    # block — skipping remat below e.g. 256 keeps the fit lever where it
    # matters and saves the low-res recompute. Parameter tree unchanged.
    dtype: Any = jnp.float32

    def res_block_cls(self, cur_h: int):
        """ResnetBlock class for a block running at spatial height cur_h:
        remat'd when checkpointing is on and the resolution qualifies."""
        if self.use_checkpoint and cur_h >= self.remat_min_res:
            return nn.remat(VAEResnetBlock)
        return VAEResnetBlock

    def fuse_block_cls(self, cur_h: int):
        if self.use_checkpoint and cur_h >= self.remat_min_res:
            return nn.remat(FuseBlock)
        return FuseBlock


class Encoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x, return_fea: bool = False):
        cfg = self.cfg
        dt = cfg.dtype
        num_res = len(cfg.ch_mult)
        curr_res = cfg.resolution
        h = conv3x3(cfg.ch, dt, name="conv_in")(x)
        fea_list = []
        for i_level in range(num_res):
            block_out = cfg.ch * cfg.ch_mult[i_level]
            res_cls = cfg.res_block_cls(h.shape[1])
            for i_block in range(cfg.num_res_blocks):
                h = res_cls(block_out, cfg.dropout, dt,
                            name=f"down_{i_level}_block_{i_block}")(h)
                if curr_res in cfg.attn_resolutions:
                    h = VAEAttnBlock(dt, name=f"down_{i_level}_attn_{i_block}")(h)
            if return_fea and i_level in (1, 2):
                fea_list.append(h)
            if i_level != num_res - 1:
                h = VAEDownsample(block_out, dt, name=f"down_{i_level}_downsample")(h)
                curr_res //= 2
        res_cls = cfg.res_block_cls(h.shape[1])
        h = res_cls(h.shape[-1], cfg.dropout, dt, name="mid_block_1")(h)
        h = VAEAttnBlock(dt, name="mid_attn_1")(h)
        h = res_cls(h.shape[-1], cfg.dropout, dt, name="mid_block_2")(h)
        out_c = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        h = norm_silu_conv3x3(h, out_c, dt, "conv_out", "GroupNorm_0",
                              eps=1e-6)
        if return_fea:
            return h, fea_list
        return h


class SimpleResBlock(nn.Module):
    """norm-swish-conv x2 with 1x1 skip (the VAE-side ResBlock used in the
    fusion modules, model.py:1312-1335)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        h = norm_silu_conv3x3(x, self.out_channels, self.dtype,
                              "conv1", "GroupNorm_0", eps=1e-6)
        h = norm_silu_conv3x3(h, self.out_channels, self.dtype,
                              "conv2", "GroupNorm_1", eps=1e-6)
        if c_in != self.out_channels:
            x = conv1x1(self.out_channels, self.dtype, name="conv_out")(x)
        return x + h


class _ConvParams(nn.Module):
    """Declares the kernel/bias of a 3x3 conv WITHOUT computing it — the
    parameter tree is identical to ``nn.Conv(features, (3,3))`` under the
    same name, so checkpoints and converters are unaffected when the owner
    reorganizes the actual convolution arithmetic."""

    cin: int
    cout: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, self.cin, self.cout), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.cout,),
                       jnp.float32)
        return k, b


class ResidualDenseBlock(nn.Module):
    """RRDB-style residual dense block (5 densely connected 3x3 convs,
    LeakyReLU 0.2, 0.2-scaled residual).

    TPU-first decomposition: the reference computes ``conv_j(cat(x, x1..
    x_{j-1}))`` with 32 output channels — on the MXU a 32-lane output conv
    runs at <10% utilization (r03 decode trace: ~35 ms/call across the fuse
    blocks). Since conv over a concat is the sum of convs over the parts,
    the five convs' x-slices are batched into ONE wide conv
    ``x -> [g,g,g,g,num_feat]`` (MXU-shaped), and only the tiny incremental
    convs over the 32-channel growth features stay narrow. Identical
    parameters, identical math up to fp reassociation of partial sums."""

    num_feat: int
    num_grow_ch: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        lrelu = lambda z: nn.leaky_relu(z, negative_slope=0.2)
        from mgldvsr_tpu.models.layers import int8_conv_enabled
        if int8_conv_enabled() or os.environ.get("MGLD_RDB_DECOMP") == "0":
            # experiment path: keep the literal concat structure so the
            # int8 quantized conv modules see the full-width inputs
            x1 = lrelu(conv3x3(self.num_grow_ch, self.dtype, name="conv1")(x))
            x2 = lrelu(conv3x3(self.num_grow_ch, self.dtype, name="conv2")(
                jnp.concatenate([x, x1], axis=-1)))
            x3 = lrelu(conv3x3(self.num_grow_ch, self.dtype, name="conv3")(
                jnp.concatenate([x, x1, x2], axis=-1)))
            x4 = lrelu(conv3x3(self.num_grow_ch, self.dtype, name="conv4")(
                jnp.concatenate([x, x1, x2, x3], axis=-1)))
            x5 = conv3x3(self.num_feat, self.dtype, name="conv5")(
                jnp.concatenate([x, x1, x2, x3, x4], axis=-1))
            return x + 0.2 * x5

        c = x.shape[-1]
        g = self.num_grow_ch
        k1, b1 = _ConvParams(c, g, name="conv1")()
        k2, b2 = _ConvParams(c + g, g, name="conv2")()
        k3, b3 = _ConvParams(c + 2 * g, g, name="conv3")()
        k4, b4 = _ConvParams(c + 3 * g, g, name="conv4")()
        k5, b5 = _ConvParams(c + 4 * g, self.num_feat, name="conv5")()

        dt = self.dtype

        def conv(inp, kern):
            return jax.lax.conv_general_dilated(
                inp.astype(dt), kern.astype(dt), (1, 1),
                [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        # one MXU-wide conv covers every dense conv's x-slice
        base_k = jnp.concatenate(
            [k1, k2[:, :, :c], k3[:, :, :c], k4[:, :, :c], k5[:, :, :c]],
            axis=-1)
        base = conv(x, base_k)
        y1 = base[..., :g]
        y2 = base[..., g:2 * g]
        y3 = base[..., 2 * g:3 * g]
        y4 = base[..., 3 * g:4 * g]
        y5 = base[..., 4 * g:]

        cast = lambda b: b.astype(dt)
        x1 = lrelu(y1 + cast(b1))
        x2 = lrelu(y2 + cast(b2) + conv(x1, k2[:, :, c:]))
        x3 = lrelu(y3 + cast(b3)
                   + conv(jnp.concatenate([x1, x2], axis=-1), k3[:, :, c:]))
        x4 = lrelu(y4 + cast(b4)
                   + conv(jnp.concatenate([x1, x2, x3], axis=-1),
                          k4[:, :, c:]))
        x5 = (y5 + cast(b5)
              + conv(jnp.concatenate([x1, x2, x3, x4], axis=-1),
                     k5[:, :, c:]))
        return x + 0.2 * x5


class FuseBlock(nn.Module):
    """Fuse LQ-encoder features into decoder activations:
    concat -> ResBlock -> RDB x n -> ResBlock; out = dec + w * residual."""

    channels: int
    num_block: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, enc_feat, dec_feat, w: float | jnp.ndarray = 1.0):
        h = jnp.concatenate([enc_feat, dec_feat], axis=-1)
        h = SimpleResBlock(self.channels, self.dtype, name="encode_enc_1")(h)
        for i in range(self.num_block):
            h = ResidualDenseBlock(self.channels, dtype=self.dtype,
                                   name=f"encode_enc_2_{i}")(h)
        h = SimpleResBlock(self.channels, self.dtype, name="encode_enc_3")(h)
        return dec_feat + w * h


class Decoder(nn.Module):
    """Parameterized SD-VAE decoder.

    num_frames>1 inserts SpatialTemporalConv after every ResnetBlock and after
    mid block_1; enable_fusion adds FuseBlock taps at up-levels 1 and 2 fed by
    the encoder's ``return_fea`` outputs, applied after that level's blocks and
    before its upsample.
    """

    cfg: VAEConfig

    @nn.compact
    def __call__(self, z, enc_fea: Optional[Sequence[jnp.ndarray]] = None,
                 fusion_w: float | jnp.ndarray = 1.0):
        cfg = self.cfg
        dt = cfg.dtype
        num_res = len(cfg.ch_mult)
        temporal = cfg.num_frames > 1
        block_in = cfg.ch * cfg.ch_mult[num_res - 1]
        curr_res = cfg.resolution // 2 ** (num_res - 1)

        h = conv3x3(block_in, dt, name="conv_in")(z)
        res_cls = cfg.res_block_cls(h.shape[1])
        h = res_cls(block_in, cfg.dropout, dt, name="mid_block_1")(h)
        if temporal:
            h = SpatialTemporalConv(cfg.num_frames, dt, name="mid_temporal")(h)
        h = VAEAttnBlock(dt, name="mid_attn_1")(h)
        h = res_cls(block_in, cfg.dropout, dt, name="mid_block_2")(h)

        for i_level in reversed(range(num_res)):
            block_out = cfg.ch * cfg.ch_mult[i_level]
            res_cls = cfg.res_block_cls(h.shape[1])
            for i_block in range(cfg.num_res_blocks + 1):
                h = res_cls(block_out, cfg.dropout, dt,
                            name=f"up_{i_level}_block_{i_block}")(h)
                if temporal:
                    h = SpatialTemporalConv(cfg.num_frames, dt,
                                            name=f"up_{i_level}_temporal_{i_block}")(h)
                if curr_res in cfg.attn_resolutions:
                    h = VAEAttnBlock(dt, name=f"up_{i_level}_attn_{i_block}")(h)
            if (cfg.enable_fusion and enc_fea is not None
                    and i_level in (1, 2)):
                h = cfg.fuse_block_cls(h.shape[1])(
                    block_out, cfg.num_fuse_block, dt,
                    name=f"fusion_layer_{i_level}")(
                    enc_fea[i_level - 1], h, fusion_w)
            if i_level != 0:
                h = Upsample(block_out, True, dt, name=f"up_{i_level}_upsample")(h)
                curr_res *= 2

        return norm_silu_conv3x3(h, cfg.out_ch, dt, "conv_out",
                                 "GroupNorm_0", eps=1e-6)


# ---------------------------------------------------------------------------
# Diagonal Gaussian posterior (functional — moments array is the state).
# ---------------------------------------------------------------------------


class DiagonalGaussian:
    """posterior = DiagonalGaussian(moments); moments = [mean | logvar] on the
    channel axis."""

    def __init__(self, moments: jnp.ndarray, deterministic: bool = False):
        self.mean, logvar = jnp.split(moments, 2, axis=-1)
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)
        self.var = jnp.exp(self.logvar)
        self.deterministic = deterministic

    def sample(self, rng: jax.Array) -> jnp.ndarray:
        if self.deterministic:
            return self.mean
        return self.mean + self.std * jax.random.normal(
            rng, self.mean.shape, dtype=self.mean.dtype
        )

    def mode(self) -> jnp.ndarray:
        return self.mean

    def kl(self, other: "DiagonalGaussian | None" = None) -> jnp.ndarray:
        if self.deterministic:
            return jnp.zeros(())
        if other is None:
            return 0.5 * jnp.sum(
                self.mean**2 + self.var - 1.0 - self.logvar,
                axis=tuple(range(1, self.mean.ndim)),
            )
        return 0.5 * jnp.sum(
            (self.mean - other.mean) ** 2 / other.var
            + self.var / other.var
            - 1.0
            - self.logvar
            + other.logvar,
            axis=tuple(range(1, self.mean.ndim)),
        )

    def nll(self, sample: jnp.ndarray) -> jnp.ndarray:
        if self.deterministic:
            return jnp.zeros(())
        logtwopi = jnp.log(2.0 * jnp.pi)
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + (sample - self.mean) ** 2 / self.var,
            axis=tuple(range(1, sample.ndim)),
        )


class AutoencoderKL(nn.Module):
    """Frozen SD first-stage VAE (encode/decode via method= dispatch)."""

    cfg: VAEConfig

    def setup(self):
        self.encoder = Encoder(self.cfg)
        dec_cfg = dataclasses.replace(self.cfg, num_frames=1, enable_fusion=False)
        self.decoder = Decoder(dec_cfg)
        self.quant_conv = conv1x1(2 * self.cfg.embed_dim, self.cfg.dtype)
        self.post_quant_conv = conv1x1(self.cfg.z_channels, self.cfg.dtype)

    def encode_moments(self, x):
        return self.quant_conv(self.encoder(x))

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x):
        moments = self.encode_moments(x)
        mean, _ = jnp.split(moments, 2, axis=-1)
        return self.decode(mean)


class VideoAutoencoderKLResi(nn.Module):
    """Video VAE: encode returns (moments, enc_fea); decode consumes an
    externally supplied latent (the diffusion output) plus the LQ features."""

    cfg: VAEConfig

    def setup(self):
        self.encoder = Encoder(self.cfg)
        self.decoder = Decoder(self.cfg)
        self.quant_conv = conv1x1(2 * self.cfg.embed_dim, self.cfg.dtype)
        self.post_quant_conv = conv1x1(self.cfg.z_channels, self.cfg.dtype)

    def encode(self, x):
        h, enc_fea = self.encoder(x, return_fea=True)
        return self.quant_conv(h), enc_fea

    def decode(self, z, enc_fea, fusion_w: float | jnp.ndarray = 1.0):
        return self.decoder(self.post_quant_conv(z), enc_fea, fusion_w)

    def __call__(self, x, latent, fusion_w: float | jnp.ndarray = 1.0):
        moments, enc_fea = self.encode(x)
        return self.decode(latent, enc_fea, fusion_w), moments
