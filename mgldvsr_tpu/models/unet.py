"""The dual-conditioned inflated denoiser UNet and the struct-cond encoder.

Capability parity (structure studied, rebuilt channels-last / flax):
- InflatedUNetModelDualcondV2
  (/root/reference/ldm/modules/diffusionmodules/openaimodel.py:1903-2313):
  SD2.1 UNet (model_channels 320, ch_mult 1/2/4/4, 2 res blocks/level,
  SpatialTransformer with linear projections and context_dim 1024 at
  downsample rates 1/2/4), every ResBlock is a *dual* block whose output is
  SPADE-modulated by struct-cond features; temporal modules
  (SpatialTemporalConv + TemporalAttention) live in the middle block only.
- InflatedEncoderUNetModelWT (openaimodel.py:2316-2525): timestep-aware
  half-UNet over the LQ latent; collects the feature entering each downsample
  plus the middle output, projects each through a ``fea_tran`` ResBlock, and
  returns a dict keyed by spatial size string (consumed by SPADE).

TPU-first: static Python loops unroll at trace time into one XLA program;
bf16 compute with fp32 params/norms; attention via the shared dispatch.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from mgldvsr_tpu.core.schedules import timestep_embedding
from mgldvsr_tpu.models.attention_blocks import QKVAttentionBlock, SpatialTransformer
from mgldvsr_tpu.models.layers import (
    Downsample,
    TimestepEmbedMLP,
    UNetResBlock,
    Upsample,
    conv3x3,
    group_norm,
    norm_silu_conv3x3,
)
from mgldvsr_tpu.models.spade import SPADE
from mgldvsr_tpu.models.temporal import SpatialTemporalConv, TemporalAttention

Dtype = Any


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 320
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_head_channels: int = 64
    transformer_depth: int = 1
    context_dim: int = 1024
    semb_channels: int = 256
    num_frames: int = 5
    dropout: float = 0.0
    use_linear_in_transformer: bool = True
    use_temporal: bool = True  # False => image-SR UNetModelDualcondV2
    use_spade: bool = True  # False + use_temporal=False => stock UNetModel
    use_checkpoint: bool = False  # activation remat per block (training memory)
    dtype: Any = jnp.float32


class DualResBlock(nn.Module):
    """UNet ResBlock whose residual branch is SPADE-modulated by struct-cond
    features before the skip-add (ResBlockDual, openaimodel.py:362-482).

    With ``use_spade=False`` this is the stock SD ResBlock
    (openaimodel.py:233-360) — ``s_cond`` is ignored (pass ``None``)."""

    out_channels: int
    emb_channels: int
    semb_channels: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    use_spade: bool = True

    @nn.compact
    def __call__(self, x, emb, s_cond: Optional[Dict[str, jnp.ndarray]],
                 deterministic=True):
        c_in = x.shape[-1]
        h = norm_silu_conv3x3(x, self.out_channels, self.dtype,
                              "conv1", "GroupNorm_0")
        emb_out = nn.Dense(self.out_channels, dtype=self.dtype,
                           param_dtype=jnp.float32, name="emb_proj")(nn.silu(emb))
        h = h + emb_out[:, None, None, :]
        if self.dropout and not deterministic:
            h = group_norm(dtype=self.dtype, name="GroupNorm_1")(h)
            h = nn.silu(h)
            h = nn.Dropout(self.dropout)(h, deterministic=False)
            h = conv3x3(self.out_channels, self.dtype, zero_init=True,
                        name="conv2")(h)
        else:
            h = norm_silu_conv3x3(h, self.out_channels, self.dtype,
                                  "conv2", "GroupNorm_1", zero_init=True)
        if self.use_spade:
            h = SPADE(self.out_channels, dtype=self.dtype,
                      name="spade")(h, s_cond)
        if c_in != self.out_channels:
            from mgldvsr_tpu.models.layers import conv1x1
            x = conv1x1(self.out_channels, self.dtype, name="skip")(x)
        return x + h


class InflatedUNetDualCond(nn.Module):
    """Denoiser: eps = f(x_t, t, text-context, struct_cond)."""

    cfg: UNetConfig

    @nn.compact
    def __call__(self, x, timesteps, context, struct_cond,
                 *, deterministic: bool = True):
        cfg = self.cfg
        dt = cfg.dtype
        mc = cfg.model_channels
        emb_dim = mc * 4

        t_feat = timestep_embedding(timesteps, mc)
        emb = TimestepEmbedMLP(emb_dim, dt, name="time_embed")(t_feat)

        # ``use_checkpoint`` = per-block activation rematerialization
        # (jax.checkpoint), the TPU equivalent of the reference's
        # CheckpointFunction flag (diffusionmodules/util.py:102-148):
        # recompute block activations in the backward pass instead of
        # keeping them resident in HBM. `deterministic` is static argnum 4
        # (self=0) so the python bool never hits the tracer.
        res_cls = (nn.remat(DualResBlock, static_argnums=(4,))
                   if cfg.use_checkpoint else DualResBlock)
        tr_cls = (nn.remat(SpatialTransformer)
                  if cfg.use_checkpoint else SpatialTransformer)

        def res(out_ch, name):
            return res_cls(out_ch, emb_dim, cfg.semb_channels, cfg.dropout,
                           dt, cfg.use_spade, name=name)

        def transformer(ch, name):
            heads = ch // cfg.num_head_channels
            return tr_cls(
                heads, cfg.num_head_channels, cfg.transformer_depth,
                cfg.context_dim, cfg.use_linear_in_transformer, dtype=dt, name=name)

        hs = []
        h = conv3x3(mc, dt, name="conv_in")(x.astype(dt))
        hs.append(h)
        ds = 1
        ch = mc
        for level, mult in enumerate(cfg.channel_mult):
            for nr in range(cfg.num_res_blocks):
                ch = mult * mc
                h = res(ch, f"in_{level}_{nr}_res")(h, emb, struct_cond,
                                                    deterministic)
                if ds in cfg.attention_resolutions:
                    h = transformer(ch, f"in_{level}_{nr}_attn")(h, context)
                hs.append(h)
            if level != len(cfg.channel_mult) - 1:
                h = Downsample(ch, True, dt, name=f"in_{level}_down")(h)
                hs.append(h)
                ds *= 2

        # middle block: res -> st-conv -> transformer -> t-attn -> res -> st-conv
        # (temporal modules only when use_temporal — image SR omits them,
        # matching UNetModelDualcondV2, openaimodel.py:982)
        heads_mid = ch // cfg.num_head_channels
        h = res(ch, "mid_res1")(h, emb, struct_cond, deterministic)
        if cfg.use_temporal:
            h = SpatialTemporalConv(cfg.num_frames, dt, name="mid_stconv1")(h)
        h = transformer(ch, "mid_attn")(h, context)
        if cfg.use_temporal:
            h = TemporalAttention(cfg.num_frames, heads_mid,
                                  cfg.num_head_channels, dt,
                                  name="mid_tattn")(h)
        h = res(ch, "mid_res2")(h, emb, struct_cond, deterministic)
        if cfg.use_temporal:
            h = SpatialTemporalConv(cfg.num_frames, dt, name="mid_stconv2")(h)

        for level, mult in reversed(list(enumerate(cfg.channel_mult))):
            for i in range(cfg.num_res_blocks + 1):
                ch = mult * mc
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = res(ch, f"out_{level}_{i}_res")(h, emb, struct_cond,
                                                    deterministic)
                if ds in cfg.attention_resolutions:
                    h = transformer(ch, f"out_{level}_{i}_attn")(h, context)
                if level and i == cfg.num_res_blocks:
                    h = Upsample(ch, True, dt, name=f"out_{level}_up")(h)
                    ds //= 2

        h = norm_silu_conv3x3(h, cfg.out_channels, dt, "conv_out",
                              "GroupNorm_0", zero_init=True)
        return h.astype(jnp.float32)


@dataclasses.dataclass(frozen=True)
class StructCondConfig:
    in_channels: int = 4
    model_channels: int = 256
    out_channels: int = 256
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    channel_mult: Sequence[int] = (1, 1, 2, 2)
    num_heads: int = 4
    dropout: float = 0.0
    num_frames: int = 5
    use_checkpoint: bool = False  # activation remat per block
    dtype: Any = jnp.float32


class StructCondEncoder(nn.Module):
    """Timestep-aware half-UNet over the LQ latent -> multi-scale SPADE
    conditioning dict keyed by spatial width string."""

    cfg: StructCondConfig

    @nn.compact
    def __call__(self, x, timesteps, *, deterministic: bool = True
                 ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        dt = cfg.dtype
        mc = cfg.model_channels
        emb_dim = mc * 4
        t_feat = timestep_embedding(timesteps, mc)
        emb = TimestepEmbedMLP(emb_dim, dt, name="time_embed")(t_feat)

        res_cls = (nn.remat(UNetResBlock, static_argnums=(3,))
                   if cfg.use_checkpoint else UNetResBlock)

        h = conv3x3(mc, dt, name="conv_in")(x.astype(dt))
        feats = []
        ds = 1
        for level, mult in enumerate(cfg.channel_mult):
            ch = mult * mc
            for nr in range(cfg.num_res_blocks):
                h = res_cls(ch, emb_dim, cfg.dropout, dtype=dt,
                            name=f"in_{level}_{nr}_res")(
                    h, emb, deterministic)
                if ds in cfg.attention_resolutions:
                    h = QKVAttentionBlock(cfg.num_heads, dtype=dt,
                                          name=f"in_{level}_{nr}_attn")(h)
            if level != len(cfg.channel_mult) - 1:
                feats.append(h)  # feature entering the downsample
                h = Downsample(ch, True, dt, name=f"in_{level}_down")(h)
                ds *= 2

        h = res_cls(h.shape[-1], emb_dim, cfg.dropout, dtype=dt,
                    name="mid_res1")(h, emb, deterministic)
        h = QKVAttentionBlock(cfg.num_heads, dtype=dt, name="mid_attn")(h)
        h = res_cls(h.shape[-1], emb_dim, cfg.dropout, dtype=dt,
                    name="mid_res2")(h, emb, deterministic)
        feats.append(h)

        results: Dict[str, jnp.ndarray] = {}
        for i, f in enumerate(feats):
            proj = res_cls(cfg.out_channels, emb_dim, cfg.dropout, dtype=dt,
                           name=f"fea_tran_{i}")(
                f, emb, deterministic)
            results[str(proj.shape[-2])] = proj
        return results
