"""OpenCLIP text tower (the frozen conditioning encoder).

Capability parity: FrozenOpenCLIPEmbedder
(/root/reference/ldm/modules/encoders/modules.py:140-199) wrapping the
open_clip ViT-H-14 text transformer — token + positional embeddings, 24
pre-LN causal transformer blocks, final LayerNorm, with the "penultimate"
option stopping one block early (SD 2.1 convention). At VSR inference the
prompt is always '' (scripts old.py:330-331), so ``empty_prompt_tokens``
provides the token row without needing the BPE vocabulary.

TPU-first: batch-major [B, L, D] (no NLD->LND dance), fused XLA attention
with a causal mask, everything jittable; the tower is frozen so params can
live in bf16 with fp32 LayerNorms.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

SOT_TOKEN = 49406
EOT_TOKEN = 49407


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    width: int = 1024
    heads: int = 16
    layers: int = 24
    context_length: int = 77
    layer: str = "penultimate"  # or "last"
    act: str = "gelu"  # ViT-H-14 uses exact gelu; OpenAI CLIP "quick_gelu"
    dtype: Any = jnp.float32


def frozen_clip_vit_l_config(dtype: Any = jnp.float32) -> CLIPTextConfig:
    """FrozenCLIPEmbedder parity
    (/root/reference/ldm/modules/encoders/modules.py:202-230): the HF CLIP
    ViT-L/14 text tower used by SD 1.x — width 768, 12 layers/heads,
    quick-gelu activation, final-layer (post final-LN) output. Weights load
    via ``io.ckpt_convert.convert_hf_clip_text``."""
    return CLIPTextConfig(width=768, heads=12, layers=12, layer="last",
                          act="quick_gelu", dtype=dtype)


def empty_prompt_tokens(batch: int, context_length: int = 77) -> jnp.ndarray:
    """Token ids for the empty prompt: [SOT, EOT, 0, ...]."""
    row = jnp.zeros((context_length,), dtype=jnp.int32)
    row = row.at[0].set(SOT_TOKEN).at[1].set(EOT_TOKEN)
    return jnp.tile(row[None], (batch, 1))


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    act: str = "gelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        d = self.width
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                       param_dtype=jnp.float32, name=name)
        y = ln("ln_1")(x)
        qkv = nn.Dense(3 * d, dtype=self.dtype, param_dtype=jnp.float32,
                       name="attn_in_proj")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, l, _ = q.shape
        hd = d // self.heads

        def split(z):
            return z.reshape(b, l, self.heads, hd)

        attn = jax.nn.dot_product_attention(
            split(q), split(k), split(v), mask=mask
        ).reshape(b, l, d)
        x = x + nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32,
                         name="attn_out_proj")(attn)

        y = ln("ln_2")(x)
        h = nn.Dense(4 * d, dtype=self.dtype, param_dtype=jnp.float32,
                     name="mlp_c_fc")(y)
        if self.act == "quick_gelu":
            h = h * jax.nn.sigmoid(1.702 * h)
        else:
            h = jax.nn.gelu(h, approximate=False)
        x = x + nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32,
                         name="mlp_c_proj")(h)
        return x


class OpenCLIPTextEncoder(nn.Module):
    """tokens [B, 77] int32 -> context embeddings [B, 77, width]."""

    cfg: CLIPTextConfig = CLIPTextConfig()

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        tok_emb = self.param(
            "token_embedding",
            nn.initializers.normal(0.02),
            (cfg.vocab_size, cfg.width),
        )
        pos_emb = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (cfg.context_length, cfg.width),
        )
        x = tok_emb[tokens] + pos_emb[None]
        x = x.astype(cfg.dtype)

        l = cfg.context_length
        causal = jnp.tril(jnp.ones((l, l), dtype=bool))[None, None]

        n_blocks = cfg.layers - (1 if cfg.layer == "penultimate" else 0)
        for i in range(n_blocks):
            x = ResidualAttentionBlock(
                cfg.width, cfg.heads, cfg.act, cfg.dtype, name=f"resblock_{i}"
            )(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="ln_final")(x)
        return x.astype(jnp.float32)
