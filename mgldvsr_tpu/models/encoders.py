"""Alternate conditioning encoders (the non-default zoo).

Capability parity with /root/reference/ldm/modules/encoders/modules.py's
unused-by-shipped-configs alternates (the default towers live elsewhere:
OpenCLIP text in ``models/cliptext.py``):

- ``ClassEmbedder`` (modules.py:23-35): class-id -> single cross-attn token.
- ``TransformerTextEmbedder`` (modules.py:37-52 ``TransformerEmbedder`` and
  :82-106 ``BERTEmbedder``, both thin wrappers over
  ``ldm/modules/x_transformer.py``'s ``TransformerWrapper(Encoder(...))``):
  token + learned absolute position embeddings, ``depth`` pre-LN
  bidirectional transformer blocks, final LayerNorm, returned as
  embeddings (the reference always calls with ``return_embeddings=True``,
  so the logits head is never used and is omitted here).
- ``SpatialRescaler`` (modules.py:108-137): repeated interpolation plus an
  optional 1x1 channel remap.
- ``CLIPImageEncoder`` + ``FrozenClipImageEmbedder`` (modules.py:292-380
  and the ``ClipImageEmbedder*`` variants :398-492): the CLIP ViT visual
  tower — patch conv, class token, ln_pre, transformer, ln_post, optional
  output projection — with the kornia-equivalent [-1,1] -> CLIP-stats
  preprocessing.

TPU-first: everything is batch-major jittable flax; the ViT patch embed is
one strided conv (an MXU matmul over 14x14x3 patches); attention reuses the
fused ``jax.nn.dot_product_attention`` path of the text tower.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mgldvsr_tpu.models.cliptext import ResidualAttentionBlock

Dtype = Any

CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


class ClassEmbedder(nn.Module):
    """Class-conditional embedding for cross-attention: ids [B] -> [B,1,D]
    (modules.py:23-35; the reference indexes ``batch[key][:, None]``)."""

    embed_dim: int
    n_classes: int = 1000

    @nn.compact
    def __call__(self, class_ids: jnp.ndarray) -> jnp.ndarray:
        table = self.param("embedding", nn.initializers.normal(1.0),
                           (self.n_classes, self.embed_dim))
        return table[class_ids][:, None, :]


@dataclasses.dataclass(frozen=True)
class TransformerTextConfig:
    vocab_size: int = 30522  # BERT vocab (BERTEmbedder default)
    width: int = 1280
    depth: int = 32
    heads: int = 8
    max_seq_len: int = 77
    dtype: Any = jnp.float32


class TransformerTextEmbedder(nn.Module):
    """tokens [B, L] int32 -> embeddings [B, L, width].

    The BERTEmbedder/TransformerEmbedder tower (modules.py:37-106): LDM's
    self-contained x_transformer ``TransformerWrapper`` with a plain
    ``Encoder`` stack (x_transformer.py:549-641) — bidirectional (no causal
    mask), learned absolute position embedding, pre-LN blocks, final
    LayerNorm, embeddings returned directly."""

    cfg: TransformerTextConfig = TransformerTextConfig()

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        tok = self.param("token_embedding", nn.initializers.normal(0.02),
                         (cfg.vocab_size, cfg.width))
        pos = self.param("positional_embedding", nn.initializers.normal(0.02),
                         (cfg.max_seq_len, cfg.width))
        x = (tok[tokens] + pos[None, : tokens.shape[1]]).astype(cfg.dtype)
        for i in range(cfg.depth):
            x = ResidualAttentionBlock(cfg.width, cfg.heads, "gelu",
                                       cfg.dtype, name=f"block_{i}")(x, None)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="norm")(x)
        return x.astype(jnp.float32)


class SpatialRescaler(nn.Module):
    """Repeated ``scale_factor`` interpolation + optional 1x1 remap
    (modules.py:108-137). NHWC."""

    n_stages: int = 1
    method: str = "bilinear"
    multiplier: float = 0.5
    out_channels: Optional[int] = None
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for _ in range(self.n_stages):
            b, h, w, c = x.shape
            nh = max(int(round(h * self.multiplier)), 1)
            nw = max(int(round(w * self.multiplier)), 1)
            x = jax.image.resize(x, (b, nh, nw, c), method=self.method)
        if self.out_channels is not None:
            x = nn.Conv(self.out_channels, (1, 1), use_bias=self.use_bias,
                        name="channel_mapper")(x)
        return x


@dataclasses.dataclass(frozen=True)
class CLIPImageConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1024
    heads: int = 16
    layers: int = 24
    output_dim: Optional[int] = 768  # None: return pre-proj pooled width
    act: str = "quick_gelu"  # OpenAI CLIP ViT towers use quick-gelu
    dtype: Any = jnp.float32


class CLIPImageEncoder(nn.Module):
    """CLIP ViT visual tower: images [B,H,W,3] (CLIP-normalized) ->
    pooled embedding [B, output_dim].

    Mirrors OpenAI ``clip``'s ``VisionTransformer`` (the tower behind
    ``FrozenClipImageEmbedder``, modules.py:292-322): strided patch conv
    without bias, prepended class embedding, learned positional embedding,
    ln_pre, pre-LN transformer, ln_post on the class token, linear
    projection. With ``pool=False`` returns all patch tokens [B,1+N,D]
    (the ``ClipImageEmbedder`` cross-attn variants, modules.py:398-492)."""

    cfg: CLIPImageConfig = CLIPImageConfig()

    @nn.compact
    def __call__(self, x: jnp.ndarray, pool: bool = True) -> jnp.ndarray:
        cfg = self.cfg
        d = cfg.width
        p = cfg.patch_size
        b = x.shape[0]
        h = nn.Conv(d, (p, p), strides=(p, p), use_bias=False,
                    dtype=cfg.dtype, param_dtype=jnp.float32,
                    name="patch_embed")(x.astype(cfg.dtype))
        h = h.reshape(b, -1, d)  # [B, N, D]
        cls = self.param("class_embedding", nn.initializers.normal(d ** -0.5),
                         (d,))
        n_tok = h.shape[1] + 1
        pos = self.param("positional_embedding",
                         nn.initializers.normal(d ** -0.5), (n_tok, d))
        h = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(h.dtype), (b, 1, d)), h], axis=1)
        h = h + pos[None].astype(h.dtype)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="ln_pre")(h)
        h = h.astype(cfg.dtype)
        for i in range(cfg.layers):
            h = ResidualAttentionBlock(d, cfg.heads, cfg.act, cfg.dtype,
                                       name=f"resblock_{i}")(h, None)
        if not pool:
            return h.astype(jnp.float32)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="ln_post")(h[:, 0])
        if cfg.output_dim is not None:
            proj = self.param("proj", nn.initializers.normal(d ** -0.5),
                              (d, cfg.output_dim))
            h = h @ proj.astype(h.dtype)
        return h.astype(jnp.float32)


def clip_preprocess(images_pm1: jnp.ndarray, size: int = 224,
                    resize: bool = True) -> jnp.ndarray:
    """[-1,1] NHWC images -> CLIP-normalized tower input
    (modules.py:310-318: bicubic resize to 224, /2+.5, mean/std)."""
    x = images_pm1
    if resize and x.shape[1:3] != (size, size):
        # the reference resizes with kornia antialias=False (modules.py:313)
        x = jax.image.resize(x, (x.shape[0], size, size, x.shape[3]),
                             method="bicubic", antialias=False)
    x = (x + 1.0) / 2.0
    mean = jnp.asarray(CLIP_IMAGE_MEAN, x.dtype)
    std = jnp.asarray(CLIP_IMAGE_STD, x.dtype)
    return (x - mean) / std


class FrozenClipImageEmbedder(nn.Module):
    """[-1,1] images -> pooled CLIP image embedding (modules.py:292-322);
    ``project_dim`` adds the extra Linear of ``FrozenClipImageEmbedderNew``
    (modules.py:325-385)."""

    cfg: CLIPImageConfig = CLIPImageConfig()
    project_dim: Optional[int] = None

    @nn.compact
    def __call__(self, images_pm1: jnp.ndarray) -> jnp.ndarray:
        z = CLIPImageEncoder(self.cfg, name="visual")(
            clip_preprocess(images_pm1, self.cfg.image_size))
        if self.project_dim is not None:
            z = nn.Dense(self.project_dim, name="linear")(z)
        return z
