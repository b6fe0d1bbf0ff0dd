"""Noisy-latent image classifier.

Capability parity with the reference's
/root/reference/ldm/models/diffusion/classifier.py
(``NoisyLatentImageClassifier``): a timestep-aware half-UNet classifier
trained on diffusion latents noised to an arbitrary step t, used for
classifier guidance / probing experiments. (In the reference this module is
dead code — it imports ``EncoderUNetModel`` from openaimodel.py, which only
defines ``EncoderUNetModelWT``; the class is rebuilt here from its
guided-diffusion lineage so the capability actually runs.)

Pool heads mirror the lineage options: ``adaptive`` (global average pool +
dense), ``attention`` (``AttentionPool2d``, openaimodel.py:67-99: learned
positional embedding, mean-token query, single multi-head attention
readout), ``spatial`` (flatten + MLP).

TPU-first: NHWC, static trunk unrolled at trace time, one jittable forward.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from mgldvsr_tpu.core.schedules import timestep_embedding
from mgldvsr_tpu.models.attention_blocks import QKVAttentionBlock
from mgldvsr_tpu.models.layers import (
    Downsample,
    TimestepEmbedMLP,
    UNetResBlock,
    conv3x3,
)

Dtype = Any


class AttentionPool2d(nn.Module):
    """CLIP-style attention pooling (openaimodel.py:67-99): tokens =
    [mean(x), x...] + positional embedding; one multi-head attention with
    the mean token as query; returns that token's output projection."""

    num_heads: int
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        tokens = jnp.concatenate(
            [tokens.mean(axis=1, keepdims=True), tokens], axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(c ** -0.5),
                         (h * w + 1, c), jnp.float32)
        tokens = (tokens + pos[None]).astype(self.dtype)
        q = nn.Dense(c, dtype=self.dtype, name="q_proj")(tokens[:, :1])
        k = nn.Dense(c, dtype=self.dtype, name="k_proj")(tokens)
        v = nn.Dense(c, dtype=self.dtype, name="v_proj")(tokens)
        d = c // self.num_heads
        q = q.reshape(b, 1, self.num_heads, d)
        k = k.reshape(b, -1, self.num_heads, d)
        v = v.reshape(b, -1, self.num_heads, d)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(d).astype(
            self.dtype)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, c)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="c_proj")(out)


@dataclasses.dataclass(frozen=True)
class ClassifierConfig:
    in_channels: int = 4  # SD latent channels
    model_channels: int = 64
    num_classes: int = 1000
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 8)
    channel_mult: Sequence[int] = (1, 2, 4)
    num_heads: int = 4
    pool: str = "attention"  # adaptive | attention | spatial
    dtype: Any = jnp.float32


class NoisyLatentClassifier(nn.Module):
    """logits = f(z_t, t) over noised diffusion latents."""

    cfg: ClassifierConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, timesteps: jnp.ndarray,
                 *, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.cfg
        dt = cfg.dtype
        mc = cfg.model_channels
        emb_dim = mc * 4
        emb = TimestepEmbedMLP(emb_dim, dt, name="time_embed")(
            timestep_embedding(timesteps, mc))

        h = conv3x3(mc, dt, name="conv_in")(x.astype(dt))
        ds = 1
        for level, mult in enumerate(cfg.channel_mult):
            ch = mult * mc
            for nr in range(cfg.num_res_blocks):
                h = UNetResBlock(ch, emb_dim, dtype=dt,
                                 name=f"in_{level}_{nr}_res")(
                    h, emb, deterministic)
                if ds in cfg.attention_resolutions:
                    h = QKVAttentionBlock(cfg.num_heads, dtype=dt,
                                          name=f"in_{level}_{nr}_attn")(h)
            if level != len(cfg.channel_mult) - 1:
                h = Downsample(ch, True, dt, name=f"in_{level}_down")(h)
                ds *= 2
        h = UNetResBlock(h.shape[-1], emb_dim, dtype=dt, name="mid_res1")(
            h, emb, deterministic)
        h = QKVAttentionBlock(cfg.num_heads, dtype=dt, name="mid_attn")(h)
        h = UNetResBlock(h.shape[-1], emb_dim, dtype=dt, name="mid_res2")(
            h, emb, deterministic)

        if cfg.pool == "attention":
            out = AttentionPool2d(cfg.num_heads, cfg.num_classes, dt,
                                  name="pool")(h)
        elif cfg.pool == "adaptive":
            out = nn.Dense(cfg.num_classes, dtype=dt, name="head")(
                h.mean(axis=(1, 2)))
        elif cfg.pool == "spatial":
            b = h.shape[0]
            flat = h.reshape(b, -1)
            hmid = nn.Dense(2 * cfg.model_channels, dtype=dt,
                            name="head_fc1")(flat)
            out = nn.Dense(cfg.num_classes, dtype=dt, name="head_fc2")(
                nn.relu(hmid))
        else:
            raise ValueError(f"unknown pool {self.cfg.pool!r}")
        return out.astype(jnp.float32)
