"""Torch-checkpoint → flax-pytree weight conversion.

Converts the reference ecosystem's checkpoints into this framework's
parameter trees (a required deliverable — SURVEY.md §5.4):

- MGLD-VSR / SD 2.1 Lightning checkpoints: denoiser UNet
  (``model.diffusion_model.*``), struct-cond encoder
  (``structcond_stage_model.*``), first-stage VAE
  (``first_stage_model.*``), OpenCLIP text tower
  (``cond_stage_model.model.*``) — key layout per
  /root/reference/ldm/modules/diffusionmodules/openaimodel.py,
  ldm/modules/diffusionmodules/model.py, ldm/models/autoencoder.py
  (checkpoint surgery :309-326, 1652-1672).
- Video VAE checkpoints (``VideoAutoencoderKLResi``: encoder + VideoDecoder_Mix
  with temporal_mixing + fusion_layer_{1,2}).
- RAFT (raft-things.pth) and SpyNet flow checkpoints.

Layout transforms: torch convs [O,I,kh,kw] → flax [kh,kw,I,O]; torch linears
[O,I] → flax [I,O]; 3-D temporal convs [O,I,kt,1,1] → [kt,1,1,I,O]; the
OpenAI legacy qkv attention interleaves heads ([H,3,d] channel blocks) and is
permuted to this framework's [3,H,d] ordering.

No torch dependency at conversion time beyond reading the pickle: tensors
are converted via ``.numpy()`` if torch is available, else expected as numpy.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Sequence, Tuple

import numpy as np

from flax import traverse_util


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _np(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x
    # torch tensor (possibly bf16) without importing torch at module scope
    try:
        return x.detach().cpu().float().numpy()
    except AttributeError:
        return np.asarray(x)


def conv_kernel(w) -> np.ndarray:
    """[O,I,kh,kw] -> [kh,kw,I,O]; [O,I,kt,kh,kw] -> [kt,kh,kw,I,O]."""
    w = _np(w)
    if w.ndim == 4:
        return w.transpose(2, 3, 1, 0)
    if w.ndim == 5:
        return w.transpose(2, 3, 4, 1, 0)
    if w.ndim == 3:  # conv1d [O,I,k] -> [k,I,O]
        return w.transpose(2, 1, 0)
    raise ValueError(f"unexpected conv kernel ndim {w.ndim}")


def linear_kernel(w) -> np.ndarray:
    return _np(w).transpose(1, 0)


class SDGet:
    """Prefix-scoped accessor over a flat torch state dict that records
    which keys were consumed (for unconverted-key reporting)."""

    def __init__(self, sd: Mapping[str, Any], prefix: str = "",
                 used: Optional[set] = None):
        self.sd = sd
        self.prefix = prefix
        self.used = used if used is not None else set()

    def scope(self, sub: str) -> "SDGet":
        return SDGet(self.sd, f"{self.prefix}{sub}.", self.used)

    def __contains__(self, key: str) -> bool:
        return f"{self.prefix}{key}" in self.sd

    def raw(self, key: str):
        full = f"{self.prefix}{key}"
        self.used.add(full)
        return self.sd[full]

    def conv(self, key: str) -> Dict[str, np.ndarray]:
        out = {"kernel": conv_kernel(self.raw(f"{key}.weight"))}
        if f"{key}.bias" in self:
            out["bias"] = _np(self.raw(f"{key}.bias"))
        return out

    def linear(self, key: str) -> Dict[str, np.ndarray]:
        out = {"kernel": linear_kernel(self.raw(f"{key}.weight"))}
        if f"{key}.bias" in self:
            out["bias"] = _np(self.raw(f"{key}.bias"))
        return out

    def norm(self, key: str) -> Dict[str, np.ndarray]:
        return {
            "scale": _np(self.raw(f"{key}.weight")),
            "bias": _np(self.raw(f"{key}.bias")),
        }


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------


def _resblock(g: SDGet, dual: bool) -> Dict[str, Any]:
    """ResBlock / ResBlockDual (openaimodel.py:233-360 / 362-482)."""
    out: Dict[str, Any] = {
        "GroupNorm_0": g.norm("in_layers.0"),
        "conv1": g.conv("in_layers.2"),
        "emb_proj": g.linear("emb_layers.1"),
        "GroupNorm_1": g.norm("out_layers.0"),
        "conv2": g.conv("out_layers.3"),
    }
    if "skip_connection.weight" in g:
        out["skip"] = g.conv("skip_connection")
    if dual:
        s = g.scope("spade")
        out["spade"] = {
            "GroupNorm_0": s.norm("param_free_norm"),
            "mlp_shared": s.conv("mlp_shared.0"),
            "mlp_gamma": s.conv("mlp_gamma"),
            "mlp_beta": s.conv("mlp_beta"),
        }
    return out


def _cross_attn(g: SDGet) -> Dict[str, Any]:
    return {
        "to_q": g.linear("to_q"),
        "to_k": g.linear("to_k"),
        "to_v": g.linear("to_v"),
        "to_out": g.linear("to_out.0"),
    }


def _transformer(g: SDGet, depth: int = 1) -> Dict[str, Any]:
    """SpatialTransformer(V2) (attention.py:406-546)."""
    out: Dict[str, Any] = {
        "GroupNorm_0": g.norm("norm"),
        "proj_in": g.linear("proj_in")
        if g.raw("proj_in.weight").ndim == 2
        else g.conv("proj_in"),
        "proj_out": g.linear("proj_out")
        if g.raw("proj_out.weight").ndim == 2
        else g.conv("proj_out"),
    }
    for d in range(depth):
        b = g.scope(f"transformer_blocks.{d}")
        out[f"block_{d}"] = {
            "norm1": b.norm("norm1"),
            "norm2": b.norm("norm2"),
            "norm3": b.norm("norm3"),
            "attn1": _cross_attn(b.scope("attn1")),
            "attn2": _cross_attn(b.scope("attn2")),
            "ff": {
                "proj_in": b.linear("ff.net.0.proj"),
                "proj_out": b.linear("ff.net.2"),
            },
        }
    return out


def _stconv(g: SDGet) -> Dict[str, Any]:
    return {
        "temporal_conv": g.conv("temporal_conv"),
        "alpha": _np(g.raw("temporal_alpha")).reshape(1),
    }


def _tattn(g: SDGet) -> Dict[str, Any]:
    a = g.scope("temporal_attn")
    return {
        "norm": g.norm("norm"),
        "to_q": a.linear("to_q"),
        "to_k": a.linear("to_k"),
        "to_v": a.linear("to_v"),
        "to_out": a.linear("to_out.0"),
        "alpha": _np(g.raw("temporal_alpha")).reshape(1),
    }


def _qkv_legacy(g: SDGet, channels: int, num_heads: int) -> Dict[str, Any]:
    """OpenAI AttentionBlock with QKVAttentionLegacy head-interleaved qkv
    conv1d — permute [H,3,d] channel blocks to [3,H,d] and convert to Dense."""
    w = _np(g.raw("qkv.weight"))  # [3C, C, 1]
    b = _np(g.raw("qkv.bias"))
    d = channels // num_heads
    w = w[..., 0].reshape(num_heads, 3, d, channels)
    w = w.transpose(1, 0, 2, 3).reshape(3 * channels, channels)
    b = b.reshape(num_heads, 3, d).transpose(1, 0, 2).reshape(3 * channels)
    pw = _np(g.raw("proj_out.weight"))[..., 0]  # conv1d [C, C, 1]
    return {
        "GroupNorm_0": g.norm("norm"),
        "qkv": {"kernel": w.transpose(1, 0), "bias": b},
        "proj_out": {
            "kernel": pw.transpose(1, 0),
            "bias": _np(g.raw("proj_out.bias")),
        },
    }


def _time_embed(g: SDGet) -> Dict[str, Any]:
    return {"fc1": g.linear("0"), "fc2": g.linear("2")}


# ---------------------------------------------------------------------------
# UNet (InflatedUNetModelDualcondV2, openaimodel.py:1903-2313)
# ---------------------------------------------------------------------------


def convert_unet(
    sd: Mapping[str, Any],
    prefix: str = "model.diffusion_model.",
    channel_mult: Sequence[int] = (1, 2, 4, 4),
    num_res_blocks: int = 2,
    attention_resolutions: Sequence[int] = (4, 2, 1),
    transformer_depth: int = 1,
    used: Optional[set] = None,
    dual: bool = True,
    temporal: bool = True,
) -> Dict[str, Any]:
    """``dual=True, temporal=True``: InflatedUNetModelDualcondV2
    (openaimodel.py:1903-2313). ``dual=False, temporal=False``: the stock SD
    ``UNetModel`` (openaimodel.py:650-980) — e.g. SD2.1's text2img denoiser,
    whose middle block is res/attn/res with no temporal or SPADE modules."""
    g = SDGet(sd, prefix, used)
    out: Dict[str, Any] = {
        "time_embed": _time_embed(g.scope("time_embed")),
        "conv_in": g.conv("input_blocks.0.0"),
        "GroupNorm_0": g.norm("out.0"),
        "conv_out": g.conv("out.2"),
    }

    idx = 1
    ds = 1
    for level in range(len(channel_mult)):
        for nr in range(num_res_blocks):
            blk = g.scope(f"input_blocks.{idx}")
            out[f"in_{level}_{nr}_res"] = _resblock(blk.scope("0"), dual=dual)
            if ds in attention_resolutions:
                out[f"in_{level}_{nr}_attn"] = _transformer(
                    blk.scope("1"), transformer_depth
                )
            idx += 1
        if level != len(channel_mult) - 1:
            out[f"in_{level}_down"] = {
                "op": g.conv(f"input_blocks.{idx}.0.op")
            }
            idx += 1
            ds *= 2

    mid = g.scope("middle_block")
    if temporal:
        out["mid_res1"] = _resblock(mid.scope("0"), dual=dual)
        out["mid_stconv1"] = _stconv(mid.scope("1"))
        out["mid_attn"] = _transformer(mid.scope("2"), transformer_depth)
        out["mid_tattn"] = _tattn(mid.scope("3"))
        out["mid_res2"] = _resblock(mid.scope("4"), dual=dual)
        out["mid_stconv2"] = _stconv(mid.scope("5"))
    else:
        out["mid_res1"] = _resblock(mid.scope("0"), dual=dual)
        out["mid_attn"] = _transformer(mid.scope("1"), transformer_depth)
        out["mid_res2"] = _resblock(mid.scope("2"), dual=dual)

    idx = 0
    for level in reversed(range(len(channel_mult))):
        for i in range(num_res_blocks + 1):
            blk = g.scope(f"output_blocks.{idx}")
            out[f"out_{level}_{i}_res"] = _resblock(blk.scope("0"), dual=dual)
            sub = 1
            if ds in attention_resolutions:
                out[f"out_{level}_{i}_attn"] = _transformer(
                    blk.scope(f"{sub}"), transformer_depth
                )
                sub += 1
            if level and i == num_res_blocks:
                out[f"out_{level}_up"] = {
                    "conv": blk.conv(f"{sub}.conv")
                }
                ds //= 2
            idx += 1
    return {"params": out}


# ---------------------------------------------------------------------------
# Struct-cond encoder (InflatedEncoderUNetModelWT, openaimodel.py:2316-2525)
# ---------------------------------------------------------------------------


def convert_structcond(
    sd: Mapping[str, Any],
    prefix: str = "structcond_stage_model.",
    channel_mult: Sequence[int] = (1, 1, 2, 2),
    model_channels: int = 256,
    num_res_blocks: int = 2,
    attention_resolutions: Sequence[int] = (4, 2, 1),
    num_heads: int = 4,
    used: Optional[set] = None,
) -> Dict[str, Any]:
    g = SDGet(sd, prefix, used)
    out: Dict[str, Any] = {
        "time_embed": _time_embed(g.scope("time_embed")),
        "conv_in": g.conv("input_blocks.0.0"),
    }
    idx = 1
    ds = 1
    for level, mult in enumerate(channel_mult):
        ch = mult * model_channels
        for nr in range(num_res_blocks):
            blk = g.scope(f"input_blocks.{idx}")
            out[f"in_{level}_{nr}_res"] = _resblock(blk.scope("0"), dual=False)
            if ds in attention_resolutions:
                out[f"in_{level}_{nr}_attn"] = _qkv_legacy(
                    blk.scope("1"), ch, num_heads
                )
            idx += 1
        if level != len(channel_mult) - 1:
            out[f"in_{level}_down"] = {"op": g.conv(f"input_blocks.{idx}.0.op")}
            idx += 1
            ds *= 2

    mid = g.scope("middle_block")
    ch = channel_mult[-1] * model_channels
    out["mid_res1"] = _resblock(mid.scope("0"), dual=False)
    out["mid_attn"] = _qkv_legacy(mid.scope("1"), ch, num_heads)
    out["mid_res2"] = _resblock(mid.scope("2"), dual=False)

    n_feats = len(channel_mult)  # (levels-1) pre-downsample taps + middle
    for i in range(n_feats):
        out[f"fea_tran_{i}"] = _resblock(g.scope(f"fea_tran.{i}"), dual=False)
    return {"params": out}


# ---------------------------------------------------------------------------
# VAE (model.py Encoder/Decoder/VideoDecoder_Mix, autoencoder.py)
# ---------------------------------------------------------------------------


def _vae_resnet(g: SDGet) -> Dict[str, Any]:
    out = {
        "GroupNorm_0": g.norm("norm1"),
        "conv1": g.conv("conv1"),
        "GroupNorm_1": g.norm("norm2"),
        "conv2": g.conv("conv2"),
    }
    if "nin_shortcut.weight" in g:
        out["nin_shortcut"] = g.conv("nin_shortcut")
    return out


def _vae_attn(g: SDGet) -> Dict[str, Any]:
    return {
        "GroupNorm_0": g.norm("norm"),
        "q": g.conv("q"),
        "k": g.conv("k"),
        "v": g.conv("v"),
        "proj_out": g.conv("proj_out"),
    }


def _simple_resblock(g: SDGet) -> Dict[str, Any]:
    out = {
        "GroupNorm_0": g.norm("norm1"),
        "conv1": g.conv("conv1"),
        "GroupNorm_1": g.norm("norm2"),
        "conv2": g.conv("conv2"),
    }
    if "conv_out.weight" in g:
        out["conv_out"] = g.conv("conv_out")
    return out


def _rdb(g: SDGet) -> Dict[str, Any]:
    return {f"conv{i}": g.conv(f"conv{i}") for i in range(1, 6)}


def convert_vae_encoder(
    g: SDGet,
    ch_mult: Sequence[int] = (1, 2, 4, 4),
    num_res_blocks: int = 2,
    attn_resolutions: Sequence[int] = (),
    resolution: int = 512,
) -> Dict[str, Any]:
    out: Dict[str, Any] = {"conv_in": g.conv("conv_in")}
    curr_res = resolution
    for i in range(len(ch_mult)):
        for j in range(num_res_blocks):
            out[f"down_{i}_block_{j}"] = _vae_resnet(
                g.scope(f"down.{i}.block.{j}")
            )
            if curr_res in attn_resolutions:
                out[f"down_{i}_attn_{j}"] = _vae_attn(
                    g.scope(f"down.{i}.attn.{j}")
                )
        if i != len(ch_mult) - 1:
            out[f"down_{i}_downsample"] = {
                "conv": g.conv(f"down.{i}.downsample.conv")
            }
            curr_res //= 2
    out["mid_block_1"] = _vae_resnet(g.scope("mid.block_1"))
    out["mid_attn_1"] = _vae_attn(g.scope("mid.attn_1"))
    out["mid_block_2"] = _vae_resnet(g.scope("mid.block_2"))
    out["GroupNorm_0"] = g.norm("norm_out")
    out["conv_out"] = g.conv("conv_out")
    return out


def convert_vae_decoder(
    g: SDGet,
    ch_mult: Sequence[int] = (1, 2, 4, 4),
    num_res_blocks: int = 2,
    attn_resolutions: Sequence[int] = (),
    resolution: int = 512,
    video: bool = False,
    fusion: bool = False,
) -> Dict[str, Any]:
    out: Dict[str, Any] = {"conv_in": g.conv("conv_in")}
    out["mid_block_1"] = _vae_resnet(g.scope("mid.block_1"))
    if video:
        out["mid_temporal"] = _stconv(g.scope("temporal_mixing"))
    out["mid_attn_1"] = _vae_attn(g.scope("mid.attn_1"))
    out["mid_block_2"] = _vae_resnet(g.scope("mid.block_2"))
    curr_res = resolution // 2 ** (len(ch_mult) - 1)
    for i in reversed(range(len(ch_mult))):
        for j in range(num_res_blocks + 1):
            out[f"up_{i}_block_{j}"] = _vae_resnet(g.scope(f"up.{i}.block.{j}"))
            if video:
                out[f"up_{i}_temporal_{j}"] = _stconv(
                    g.scope(f"up.{i}.temporal_mixing.{j}")
                )
            if curr_res in attn_resolutions:
                out[f"up_{i}_attn_{j}"] = _vae_attn(g.scope(f"up.{i}.attn.{j}"))
        if fusion and i in (1, 2):
            f = g.scope(f"fusion_layer_{i}")
            num_block = 0
            while f"encode_enc_2.{num_block}.conv1.weight" in f:
                num_block += 1
            out[f"fusion_layer_{i}"] = {
                "encode_enc_1": _simple_resblock(f.scope("encode_enc_1")),
                "encode_enc_3": _simple_resblock(f.scope("encode_enc_3")),
                **{
                    f"encode_enc_2_{k}": _rdb(f.scope(f"encode_enc_2.{k}"))
                    for k in range(num_block)
                },
            }
        if i != 0:
            out[f"up_{i}_upsample"] = {"conv": g.conv(f"up.{i}.upsample.conv")}
            curr_res *= 2
    out["GroupNorm_0"] = g.norm("norm_out")
    out["conv_out"] = g.conv("conv_out")
    return out


def convert_autoencoder(
    sd: Mapping[str, Any],
    prefix: str = "first_stage_model.",
    video: bool = False,
    fusion: bool = False,
    ch_mult: Sequence[int] = (1, 2, 4, 4),
    num_res_blocks: int = 2,
    attn_resolutions: Sequence[int] = (),
    resolution: int = 512,
    used: Optional[set] = None,
) -> Dict[str, Any]:
    """AutoencoderKL (image) or VideoAutoencoderKLResi (video+fusion).

    Handles reference checkpoints whose keys carry the given prefix; the
    reference itself strips/remaps prefixes non-strictly
    (autoencoder.py:1652-1672)."""
    g = SDGet(sd, prefix, used)
    # fusion layers live on the VideoDecoder_Mix itself
    params = {
        "encoder": convert_vae_encoder(
            g.scope("encoder"), ch_mult, num_res_blocks, attn_resolutions,
            resolution,
        ),
        "decoder": convert_vae_decoder(
            g.scope("decoder"), ch_mult, num_res_blocks, attn_resolutions,
            resolution, video=video, fusion=fusion,
        ),
        "quant_conv": g.conv("quant_conv"),
        "post_quant_conv": g.conv("post_quant_conv"),
    }
    return {"params": params}


# ---------------------------------------------------------------------------
# OpenCLIP text tower
# ---------------------------------------------------------------------------


def convert_openclip_text(
    sd: Mapping[str, Any],
    prefix: str = "cond_stage_model.model.",
    layers: int = 24,
    penultimate: bool = True,
    used: Optional[set] = None,
) -> Dict[str, Any]:
    g = SDGet(sd, prefix, used)
    out: Dict[str, Any] = {
        "token_embedding": _np(g.raw("token_embedding.weight")),
        "positional_embedding": _np(g.raw("positional_embedding")),
        "ln_final": g.norm("ln_final"),
    }
    n_blocks = layers - (1 if penultimate else 0)
    for i in range(n_blocks):
        b = g.scope(f"transformer.resblocks.{i}")
        out[f"resblock_{i}"] = {
            "ln_1": b.norm("ln_1"),
            "ln_2": b.norm("ln_2"),
            "attn_in_proj": {
                "kernel": linear_kernel(b.raw("attn.in_proj_weight")),
                "bias": _np(b.raw("attn.in_proj_bias")),
            },
            "attn_out_proj": b.linear("attn.out_proj"),
            "mlp_c_fc": b.linear("mlp.c_fc"),
            "mlp_c_proj": b.linear("mlp.c_proj"),
        }
    return {"params": out}


def convert_hf_clip_text(
    sd: Mapping[str, Any],
    prefix: str = "cond_stage_model.transformer.",
    layers: int = 12,
    penultimate: bool = False,
    used: Optional[set] = None,
) -> Dict[str, Any]:
    """HuggingFace ``CLIPTextModel`` layout (the FrozenCLIPEmbedder tower,
    modules.py:202-230; SD 1.x checkpoints): separate q/k/v projections are
    fused into our single in-proj Dense; position embedding is an embedding
    table rather than a parameter matrix."""
    g = SDGet(sd, f"{prefix}text_model.", used)
    out: Dict[str, Any] = {
        "token_embedding": _np(g.raw("embeddings.token_embedding.weight")),
        "positional_embedding": _np(
            g.raw("embeddings.position_embedding.weight")),
        "ln_final": g.norm("final_layer_norm"),
    }
    n_blocks = layers - (1 if penultimate else 0)
    for i in range(n_blocks):
        b = g.scope(f"encoder.layers.{i}")
        qw = _np(b.raw("self_attn.q_proj.weight"))
        kw = _np(b.raw("self_attn.k_proj.weight"))
        vw = _np(b.raw("self_attn.v_proj.weight"))
        qb = _np(b.raw("self_attn.q_proj.bias"))
        kb = _np(b.raw("self_attn.k_proj.bias"))
        vb = _np(b.raw("self_attn.v_proj.bias"))
        out[f"resblock_{i}"] = {
            "ln_1": b.norm("layer_norm1"),
            "ln_2": b.norm("layer_norm2"),
            "attn_in_proj": {
                "kernel": np.concatenate([qw, kw, vw], 0).transpose(1, 0),
                "bias": np.concatenate([qb, kb, vb], 0),
            },
            "attn_out_proj": b.linear("self_attn.out_proj"),
            "mlp_c_fc": b.linear("mlp.fc1"),
            "mlp_c_proj": b.linear("mlp.fc2"),
        }
    return {"params": out}


def convert_clip_image(
    sd: Mapping[str, Any],
    prefix: str = "visual.",
    layers: int = 24,
    used: Optional[set] = None,
) -> Dict[str, Any]:
    """OpenAI ``clip`` ``VisionTransformer`` layout (the tower
    ``FrozenClipImageEmbedder`` loads via ``clip.load``,
    modules.py:292-322): conv1 patch embed, class/positional embeddings,
    ln_pre/ln_post, fused in_proj attention blocks, output ``proj``."""
    g = SDGet(sd, prefix, used)
    out: Dict[str, Any] = {
        "patch_embed": {"kernel": conv_kernel(g.raw("conv1.weight"))},
        "class_embedding": _np(g.raw("class_embedding")),
        "positional_embedding": _np(g.raw("positional_embedding")),
        "ln_pre": g.norm("ln_pre"),
        "ln_post": g.norm("ln_post"),
    }
    if "proj" in g:
        out["proj"] = _np(g.raw("proj"))
    for i in range(layers):
        b = g.scope(f"transformer.resblocks.{i}")
        out[f"resblock_{i}"] = {
            "ln_1": b.norm("ln_1"),
            "ln_2": b.norm("ln_2"),
            "attn_in_proj": {
                "kernel": linear_kernel(b.raw("attn.in_proj_weight")),
                "bias": _np(b.raw("attn.in_proj_bias")),
            },
            "attn_out_proj": b.linear("attn.out_proj"),
            "mlp_c_fc": b.linear("mlp.c_fc"),
            "mlp_c_proj": b.linear("mlp.c_proj"),
        }
    return {"params": out}


def convert_hf_clip_vision(
    sd: Mapping[str, Any],
    prefix: str = "",
    layers: int = 24,
    used: Optional[set] = None,
) -> Dict[str, Any]:
    """HuggingFace ``CLIPVisionModel`` layout: separate q/k/v fused into
    one in-proj; embeddings under ``vision_model.embeddings``; no output
    proj (HF keeps it on ``CLIPVisionModelWithProjection``)."""
    g = SDGet(sd, f"{prefix}vision_model.", used)
    out: Dict[str, Any] = {
        "patch_embed": {
            "kernel": conv_kernel(
                g.raw("embeddings.patch_embedding.weight"))},
        "class_embedding": _np(g.raw("embeddings.class_embedding")),
        "positional_embedding": _np(
            g.raw("embeddings.position_embedding.weight")),
        "ln_pre": g.norm("pre_layrnorm"),  # [sic] HF's key is misspelled
        "ln_post": g.norm("post_layernorm"),
    }
    for i in range(layers):
        b = g.scope(f"encoder.layers.{i}")
        qw, kw, vw = (_np(b.raw(f"self_attn.{p}_proj.weight"))
                      for p in "qkv")
        qb, kb, vb = (_np(b.raw(f"self_attn.{p}_proj.bias"))
                      for p in "qkv")
        out[f"resblock_{i}"] = {
            "ln_1": b.norm("layer_norm1"),
            "ln_2": b.norm("layer_norm2"),
            "attn_in_proj": {
                "kernel": np.concatenate([qw, kw, vw], 0).transpose(1, 0),
                "bias": np.concatenate([qb, kb, vb], 0),
            },
            "attn_out_proj": b.linear("self_attn.out_proj"),
            "mlp_c_fc": b.linear("mlp.fc1"),
            "mlp_c_proj": b.linear("mlp.fc2"),
        }
    return {"params": out}


def convert_deresnet(
    sd: Mapping[str, Any],
    prefix: str = "",
    num_degradation: int = 2,
    num_feats: Sequence[int] = (64, 128, 256, 512),
    num_blocks: Sequence[int] = (2, 2, 2, 2),
    downscales: Sequence[int] = (2, 2, 2, 1),
    used: Optional[set] = None,
) -> Dict[str, Any]:
    """DEResNet degradation estimator (degradat_arch.py:7-90): per-branch
    ``body.{d}`` is an nn.Sequential mixing ResidualBlockNoBN and plain
    downscale convs — replay the construction order to index it."""
    g = SDGet(sd, prefix, used)
    out: Dict[str, Any] = {}
    n_stage = len(num_feats)
    for d in range(num_degradation):
        out[f"first_{d}"] = g.conv(f"conv_first.{d}")
        seq = 0
        for stage in range(n_stage):
            for b in range(num_blocks[stage]):
                blk = g.scope(f"body.{d}.{seq}")
                out[f"body_{d}_{stage}_{b}"] = {
                    "conv1": blk.conv("conv1"), "conv2": blk.conv("conv2")}
                seq += 1
            if downscales[stage] == 2 or (
                    downscales[stage] == 1 and stage < n_stage - 1
                    and num_feats[stage] != num_feats[stage + 1]):
                out[f"down_{d}_{stage}"] = g.conv(f"body.{d}.{seq}")
                seq += 1
        out[f"fc1_{d}"] = g.linear(f"fc_degree.{d}.0")
        out[f"fc2_{d}"] = g.linear(f"fc_degree.{d}.2")
    return {"params": out}


def fold_spectral_norm(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Fold torch ``spectral_norm`` parametrizations into plain weights:
    every ``X.weight_orig``/``X.weight_u``/``X.weight_v`` triple becomes
    ``X.weight = W / sigma`` with eval-mode sigma ``u . (W_mat v)`` —
    bit-identical to what ``remove_spectral_norm`` would store."""
    out: Dict[str, Any] = {}
    for k, v in sd.items():
        if k.endswith(".weight_u") or k.endswith(".weight_v"):
            continue
        if k.endswith(".weight_orig"):
            base = k[: -len("_orig")]
            w = _np(v)
            u = _np(sd[f"{base}_u"])
            vv = _np(sd[f"{base}_v"])
            wm = w.reshape(w.shape[0], -1)
            sigma = float(u @ (wm @ vv))
            out[base] = w / sigma
        else:
            out[k] = v
    return out


def _hfg_spade(g: "SDGet") -> Dict[str, Any]:
    return {
        "mlp_shared": g.conv("mlp_shared.0"),
        "mlp_gamma": g.conv("mlp_gamma"),
        "mlp_beta": g.conv("mlp_beta"),
    }


def _hfg_spade_block(g: "SDGet", learned_shortcut: bool) -> Dict[str, Any]:
    out = {
        "conv_0": g.conv("conv_0"),
        "conv_1": g.conv("conv_1"),
        "norm_0": _hfg_spade(g.scope("norm_0")),
        "norm_1": _hfg_spade(g.scope("norm_1")),
    }
    if learned_shortcut:
        out["conv_s"] = g.conv("conv_s")
        out["norm_s"] = _hfg_spade(g.scope("norm_s"))
    return out


def convert_vgg_face(
    sd: Mapping[str, Any],
    prefix: str = "vgg_extractor.",
    used: Optional[set] = None,
) -> Dict[str, Any]:
    """basicsr ``VGGFeatureExtractor`` named-layer VGG (vgg_arch.py:56-130)
    -> ``models.heritage.face_archs.VGG19Features`` tree."""
    g = SDGet(sd, f"{prefix}vgg_net.", used)
    out: Dict[str, Any] = {}
    for key in sd:
        if not key.startswith(f"{prefix}vgg_net.") or not key.endswith(
                ".weight"):
            continue
        name = key[len(f"{prefix}vgg_net."):-len(".weight")]
        out[name] = g.conv(name)
    # normalization buffers are constants in our module
    for buf in ("mean", "std"):
        if f"{prefix}{buf}" in sd and used is not None:
            used.add(f"{prefix}{buf}")
    return {"params": out}


def convert_dfdnet(
    sd: Mapping[str, Any],
    prefix: str = "",
    used: Optional[set] = None,
) -> Dict[str, Any]:
    """DFDNet (dfdnet_arch.py:57-169) -> the host-orchestrated
    ``face_archs.DFDNet`` params dict (vgg / decoder / per-part attention
    blocks). Spectral norm folded."""
    sd = fold_spectral_norm(sd)
    g = SDGet(sd, prefix, used)
    out: Dict[str, Any] = {"vgg": convert_vgg_face(sd, f"{prefix}vgg_extractor.", used)}
    parts = ("left_eye", "right_eye", "nose", "mouth")
    for fs in (256, 128, 64, 32):
        for part in parts:
            a = g.scope(f"attn_blocks.{part}_{fs}")
            out[f"{part}_{fs}"] = {"params": {
                "conv1": a.conv("0"), "conv2": a.conv("2")}}
    dec: Dict[str, Any] = {}
    ms = g.scope("multi_scale_dilation")
    msd: Dict[str, Any] = {"fusion": ms.conv("conv_fusion")}
    for i in range(4):
        msd[f"b{i}_conv1"] = ms.conv(f"conv_blocks.{i}.0")
        msd[f"b{i}_conv2"] = ms.conv(f"conv_blocks.{i}.2")
    dec["msdilate"] = msd
    for i in range(4):
        u = g.scope(f"upsample{i}")
        dec[f"up{i}"] = {
            "conv1": u.conv("conv1.1"),
            "convup": u.conv("convup.1"),
            "scale1": u.conv("scale_block.0"),
            "scale2": u.conv("scale_block.2"),
            "shift1": u.conv("shift_block.0"),
            "shift2": u.conv("shift_block.2"),
        }
    u4 = g.scope("upsample4")
    dec["out_conv"] = u4.conv("0")
    dec["out_res1"] = {"conv1": u4.conv("2.body.0"),
                       "conv2": u4.conv("2.body.2")}
    dec["out_res2"] = {"conv1": u4.conv("3.body.0"),
                       "conv2": u4.conv("3.body.2")}
    dec["out_rgb"] = u4.conv("4")
    out["decoder"] = {"params": dec}
    return out


def convert_hifacegan(
    sd: Mapping[str, Any],
    prefix: str = "",
    num_feat: int = 64,
    n_2xdown: int = 5,
    used: Optional[set] = None,
) -> Dict[str, Any]:
    """HiFaceGAN generator (hifacegan_arch.py:145-165). Pass the state
    dict through ``fold_spectral_norm`` first (or pass a dict saved after
    ``remove_spectral_norm``)."""
    sd = fold_spectral_norm(sd)
    g = SDGet(sd, prefix, used)
    enc: Dict[str, Any] = {}
    # LIPEncoder nn.Sequential replay (hifacegan_util.py:193-211):
    # [conv, IN, relu] + per-stage [LIP, conv, IN(, relu)]
    enc["stem"] = g.conv("lip_encoder.model.0")
    seq = 3
    for i in range(n_2xdown):
        lip = g.scope(f"lip_encoder.model.{seq}")
        enc[f"lip_{i}"] = {
            "logit_conv": lip.conv("logit.0"),
            "in_scale": _np(lip.raw("logit.1.weight")),
            "in_bias": _np(lip.raw("logit.1.bias")),
        }
        enc[f"conv_{i}"] = g.conv(f"lip_encoder.model.{seq + 1}")
        seq += 4 if i < n_2xdown - 1 else 3
    out: Dict[str, Any] = {"encoder": enc}
    # HiFaceGAN inherits (and never calls) SPADEGenerator's fc encoder —
    # the dead weights still live in the checkpoint (hifacegan_arch.py:38)
    if "fc.weight" in g:
        g.conv("fc")
    out["head_0"] = _hfg_spade_block(g.scope("head_0"), False)
    out["g_middle_0"] = _hfg_spade_block(g.scope("g_middle_0"), False)
    out["g_middle_1"] = _hfg_spade_block(g.scope("g_middle_1"), False)
    for i in range(4):
        out[f"ups_{i}"] = _hfg_spade_block(g.scope(f"ups.{i}"), True)
    out["to_rgb_3"] = g.conv("to_rgbs.3")
    # unreached-phase rgb heads exist in the checkpoint; consume them
    for i in range(3):
        if f"to_rgbs.{i}.weight" in g:
            g.conv(f"to_rgbs.{i}")
    return {"params": out}


def convert_hifacegan_discriminator(
    sd: Mapping[str, Any],
    prefix: str = "",
    num_d: int = 2,
    n_layers: int = 4,
    used: Optional[set] = None,
) -> Dict[str, Any]:
    """Multiscale PatchGAN (hifacegan_arch.py:168-262); spectral norm
    folded, norm-wrapped convs are bias-free."""
    sd = fold_spectral_norm(sd)
    g = SDGet(sd, prefix, used)
    out: Dict[str, Any] = {}
    for i in range(num_d):
        d = g.scope(f"discriminator_{i}")
        dd: Dict[str, Any] = {"conv0": d.conv("model0.0")}
        for n in range(1, n_layers):
            dd[f"conv{n}"] = d.conv(f"model{n}.0.0")
        dd["conv_out"] = d.conv(f"model{n_layers}.0")
        out[f"d_{i}"] = dd
    return {"params": out}


# ---------------------------------------------------------------------------
# LPIPS (taming vgg.pth: torchvision VGG16 'net.slice*' + 'lin*' heads)
# ---------------------------------------------------------------------------

# torchvision VGG16 'features' indices of the 13 convs, grouped by stage
_VGG16_FEATURE_IDX = ((0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28))


def convert_lpips(
    sd: Mapping[str, Any], prefix: str = "", used: Optional[set] = None
) -> Dict[str, Any]:
    """taming-style LPIPS checkpoint: VGG16 convs under
    ``net.slice{s}.{idx}`` (torchvision feature indices) and 1x1 heads under
    ``lin{i}.model.1``."""
    g = SDGet(sd, prefix, used)
    vgg: Dict[str, Any] = {}
    for stage, idxs in enumerate(_VGG16_FEATURE_IDX):
        for j, idx in enumerate(idxs):
            key = f"net.slice{stage + 1}.{idx}"
            if f"{key}.weight" not in g:  # plain torchvision layout fallback
                key = f"features.{idx}"
            vgg[f"conv{stage + 1}_{j + 1}"] = g.conv(key)
    params: Dict[str, Any] = {"vgg": vgg}
    for i in range(5):
        params[f"lin{i}"] = {"kernel": conv_kernel(g.raw(f"lin{i}.model.1.weight"))}
    return {"params": params}


# ---------------------------------------------------------------------------
# Heritage SR backbones (rrdbnet_arch.py, srresnet_arch.py, srvgg_arch.py)
# ---------------------------------------------------------------------------


def convert_rrdbnet(sd: Mapping[str, Any], prefix: str = "",
                    num_block: int = 23,
                    used: Optional[set] = None) -> Dict[str, Any]:
    g = SDGet(sd, prefix, used)
    out: Dict[str, Any] = {
        "conv_first": g.conv("conv_first"),
        "conv_body": g.conv("conv_body"),
        "conv_up1": g.conv("conv_up1"),
        "conv_up2": g.conv("conv_up2"),
        "conv_hr": g.conv("conv_hr"),
        "conv_last": g.conv("conv_last"),
    }
    for i in range(num_block):
        out[f"body_{i}"] = {
            f"rdb{j}": _rdb(g.scope(f"body.{i}.rdb{j}"))
            for j in (1, 2, 3)
        }
    return {"params": out}


def convert_msrresnet(sd: Mapping[str, Any], prefix: str = "",
                      num_block: int = 16, upscale: int = 4,
                      used: Optional[set] = None) -> Dict[str, Any]:
    g = SDGet(sd, prefix, used)
    out: Dict[str, Any] = {
        "conv_first": g.conv("conv_first"),
        "upconv1": g.conv("upconv1"),
        "conv_hr": g.conv("conv_hr"),
        "conv_last": g.conv("conv_last"),
    }
    if upscale == 4:
        out["upconv2"] = g.conv("upconv2")
    for i in range(num_block):
        out[f"body_{i}"] = {
            "conv1": g.conv(f"body.{i}.conv1"),
            "conv2": g.conv(f"body.{i}.conv2"),
        }
    return {"params": out}


def convert_srvgg(sd: Mapping[str, Any], prefix: str = "",
                  num_conv: int = 16,
                  used: Optional[set] = None) -> Dict[str, Any]:
    """SRVGGNetCompact sequential body: conv at even indices, PReLU (with a
    per-channel weight) at odd indices, final conv at 2*(num_conv+1)."""
    g = SDGet(sd, prefix, used)
    out: Dict[str, Any] = {"conv_first": g.conv("body.0"),
                           "act0_alpha": _np(g.raw("body.1.weight"))}
    for i in range(num_conv):
        idx = 2 * (i + 1)
        out[f"body_{i}"] = g.conv(f"body.{idx}")
        out[f"act{i + 1}_alpha"] = _np(g.raw(f"body.{idx + 1}.weight"))
    out["conv_last"] = g.conv(f"body.{2 * (num_conv + 1)}")
    return {"params": out}


# ---------------------------------------------------------------------------
# CouplePropModule (tempo_model_arch.py:29-95, used by
# VideoEncoderUNetModelWT)
# ---------------------------------------------------------------------------


def _conv_res_blocks(g: SDGet, num_block: int) -> Dict[str, Any]:
    out: Dict[str, Any] = {"conv_in": g.conv("main.0")}
    for i in range(num_block):
        out[f"block_{i}"] = {
            "conv1": g.conv(f"main.2.{i}.conv1"),
            "conv2": g.conv(f"main.2.{i}.conv2"),
        }
    return out


def convert_rcan(sd: Mapping[str, Any], prefix: str = "",
                 num_group: int = 10, num_block: int = 16,
                 upscale: int = 4,
                 used: Optional[set] = None) -> Dict[str, Any]:
    """RCAN (rcan_arch.py:72-135): residual groups of RCAB blocks; the
    channel-attention Sequential puts its convs at indices 1 and 3; the
    pixel-shuffle Upsample puts convs at even indices."""
    g = SDGet(sd, prefix, used)
    out: Dict[str, Any] = {
        "conv_first": g.conv("conv_first"),
        "conv_after_body": g.conv("conv_after_body"),
        "conv_last": g.conv("conv_last"),
    }
    for gi in range(num_group):
        grp: Dict[str, Any] = {"conv": g.conv(f"body.{gi}.conv")}
        for bi in range(num_block):
            r = g.scope(f"body.{gi}.residual_group.{bi}")
            grp[f"rcab_{bi}"] = {
                "conv1": r.conv("rcab.0"),
                "conv2": r.conv("rcab.2"),
                "ca": {"down": r.conv("rcab.3.attention.1"),
                       "up": r.conv("rcab.3.attention.3")},
            }
        out[f"group_{gi}"] = grp
    # Upsample Sequential: scale 2^n -> conv at 0,2,..; scale 3 -> conv at 0
    idx = 0
    up = upscale
    while up > 1:
        r_ = 3 if up % 3 == 0 else 2
        out[f"up_x{up}"] = g.conv(f"upsample.{idx}")
        idx += 2
        up //= r_
    return {"params": out}


def convert_basicvsr(sd: Mapping[str, Any], prefix: str = "",
                     num_block: int = 15,
                     used: Optional[set] = None) -> Dict[str, Any]:
    """BasicVSR (basicvsr_arch.py:11-102). The internal SpyNet tower is
    converted separately (``convert_spynet(prefix='spynet.')``) since our
    module takes precomputed flows."""
    g = SDGet(sd, prefix, used)
    out: Dict[str, Any] = {
        "backward_trunk": _conv_res_blocks(g.scope("backward_trunk"),
                                           num_block),
        "forward_trunk": _conv_res_blocks(g.scope("forward_trunk"), num_block),
        "fusion": g.conv("fusion"),
        "upconv1": g.conv("upconv1"),
        "upconv2": g.conv("upconv2"),
        "conv_hr": g.conv("conv_hr"),
        "conv_last": g.conv("conv_last"),
    }
    return {"params": out}


def convert_edvr(sd: Mapping[str, Any], prefix: str = "",
                 num_extract_block: int = 5, num_reconstruct_block: int = 10,
                 used: Optional[set] = None) -> Dict[str, Any]:
    """EDVR with TSA, no predeblur (edvr_arch.py): PCD align (DCNv2Pack
    weight/bias + conv_offset per level) + TSA fusion + reconstruction."""
    g = SDGet(sd, prefix, used)
    out: Dict[str, Any] = {
        "conv_first": g.conv("conv_first"),
        "conv_l2_1": g.conv("conv_l2_1"), "conv_l2_2": g.conv("conv_l2_2"),
        "conv_l3_1": g.conv("conv_l3_1"), "conv_l3_2": g.conv("conv_l3_2"),
        "upconv1": g.conv("upconv1"), "upconv2": g.conv("upconv2"),
        "conv_hr": g.conv("conv_hr"), "conv_last": g.conv("conv_last"),
    }
    for i in range(num_extract_block):
        out[f"extract_{i}"] = {
            "conv1": g.conv(f"feature_extraction.{i}.conv1"),
            "conv2": g.conv(f"feature_extraction.{i}.conv2")}
    for i in range(num_reconstruct_block):
        out[f"recon_{i}"] = {
            "conv1": g.conv(f"reconstruction.{i}.conv1"),
            "conv2": g.conv(f"reconstruction.{i}.conv2")}
    p = g.scope("pcd_align")
    pcd: Dict[str, Any] = {}
    for lvl in (3, 2, 1):
        pcd[f"offset_conv1_l{lvl}"] = p.conv(f"offset_conv1.l{lvl}")
        pcd[f"offset_conv2_l{lvl}"] = p.conv(f"offset_conv2.l{lvl}")
        if lvl < 3:
            pcd[f"offset_conv3_l{lvl}"] = p.conv(f"offset_conv3.l{lvl}")
            pcd[f"feat_conv_l{lvl}"] = p.conv(f"feat_conv.l{lvl}")
        pcd[f"dcn_offset_l{lvl}"] = p.conv(f"dcn_pack.l{lvl}.conv_offset")
        pcd[f"dcn_weight_l{lvl}"] = conv_kernel(
            p.raw(f"dcn_pack.l{lvl}.weight"))
        pcd[f"dcn_bias_l{lvl}"] = _np(p.raw(f"dcn_pack.l{lvl}.bias"))
    pcd["cas_offset_conv1"] = p.conv("cas_offset_conv1")
    pcd["cas_offset_conv2"] = p.conv("cas_offset_conv2")
    pcd["cas_dcn_offset"] = p.conv("cas_dcnpack.conv_offset")
    pcd["cas_dcn_weight"] = conv_kernel(p.raw("cas_dcnpack.weight"))
    pcd["cas_dcn_bias"] = _np(p.raw("cas_dcnpack.bias"))
    out["pcd"] = pcd
    f = g.scope("fusion")
    out["fusion"] = {
        name: f.conv(name) for name in (
            "temporal_attn1", "temporal_attn2", "feat_fusion",
            "spatial_attn1", "spatial_attn2", "spatial_attn3",
            "spatial_attn4", "spatial_attn5", "spatial_attn_l1",
            "spatial_attn_l2", "spatial_attn_l3", "spatial_attn_add1",
            "spatial_attn_add2")
    }
    return {"params": out}


def convert_swinir(sd: Mapping[str, Any], prefix: str = "",
                   depths: Sequence[int] = (2, 2),
                   upscale: int = 4,
                   used: Optional[set] = None) -> Dict[str, Any]:
    """SwinIR classical-SR 'pixelshuffle' flavor (swinir_arch.py).
    relative_position_index / attn_mask buffers are recomputed by our
    module and only marked consumed."""
    g = SDGet(sd, prefix, used)
    out: Dict[str, Any] = {
        "conv_first": g.conv("conv_first"),
        "norm_embed": g.norm("patch_embed.norm"),
        "norm_body": g.norm("norm"),
        "conv_after_body": g.conv("conv_after_body"),
        "conv_before_upsample": g.conv("conv_before_upsample.0"),
        "conv_last": g.conv("conv_last"),
    }
    for li, depth in enumerate(depths):
        lay: Dict[str, Any] = {"conv": g.conv(f"layers.{li}.conv")}
        for bi in range(depth):
            b = g.scope(f"layers.{li}.residual_group.blocks.{bi}")
            lay[f"block_{bi}"] = {
                "norm1": b.norm("norm1"),
                "norm2": b.norm("norm2"),
                "attn": {
                    "qkv": b.linear("attn.qkv"),
                    "proj": b.linear("attn.proj"),
                    "relative_position_bias_table": _np(
                        b.raw("attn.relative_position_bias_table")),
                },
                "mlp_fc1": b.linear("mlp.fc1"),
                "mlp_fc2": b.linear("mlp.fc2"),
            }
            for buf in ("attn.relative_position_index", "attn_mask"):
                if buf in b:
                    b.raw(buf)
        out[f"layer_{li}"] = lay
    idx = 0
    up = upscale
    while up > 1:
        r = 3 if up % 3 == 0 else 2
        out[f"upsample_conv_x{up}"] = g.conv(f"upsample.{idx}")
        idx += 2
        up //= r
    return {"params": out}


def convert_basicvsrpp(sd: Mapping[str, Any], prefix: str = "",
                       num_block: int = 7,
                       used: Optional[set] = None) -> Dict[str, Any]:
    """BasicVSR++ (basicvsrpp_arch.py:17-345). SpyNet converted
    separately; flows are inputs to our module."""
    g = SDGet(sd, prefix, used)
    out: Dict[str, Any] = {
        "feat_extract": _conv_res_blocks(g.scope("feat_extract"), 5),
        "reconstruction": _conv_res_blocks(g.scope("reconstruction"), 5),
        "upconv1": g.conv("upconv1"), "upconv2": g.conv("upconv2"),
        "conv_hr": g.conv("conv_hr"), "conv_last": g.conv("conv_last"),
    }
    for name in ("backward_1", "forward_1", "backward_2", "forward_2"):
        d = g.scope(f"deform_align.{name}")
        out[f"deform_align_{name}"] = {
            "offset_conv1": d.conv("conv_offset.0"),
            "offset_conv2": d.conv("conv_offset.2"),
            "offset_conv3": d.conv("conv_offset.4"),
            "offset_conv4": d.conv("conv_offset.6"),
            "dcn_weight": conv_kernel(d.raw("weight")),
            "dcn_bias": _np(d.raw("bias")),
        }
        out[f"backbone_{name}"] = _conv_res_blocks(
            g.scope(f"backbone.{name}"), num_block)
    return {"params": out}


def _bn(g: "SDGet", key: str) -> Dict[str, np.ndarray]:
    """torch BatchNorm (eval) -> frozen scale/bias/mean/var."""
    return {
        "scale": _np(g.raw(f"{key}.weight")),
        "bias": _np(g.raw(f"{key}.bias")),
        "mean": _np(g.raw(f"{key}.running_mean")),
        "var": _np(g.raw(f"{key}.running_var")),
    }


def convert_toflow(sd: Mapping[str, Any], prefix: str = "",
                   used: Optional[set] = None) -> Dict[str, Any]:
    """TOFlow (tof_arch.py:96-172) incl. its BatchNorm SPyNetTOF tower.
    num_batches_tracked and the mean/std buffers are consumed only."""
    g = SDGet(sd, prefix, used)
    out: Dict[str, Any] = {
        f"conv_{i}": g.conv(f"conv_{i}") for i in (1, 2, 3, 4)}
    spy: Dict[str, Any] = {}
    for i in range(4):
        b = g.scope(f"spynet.basic_module.{i}.basic_module")
        mod: Dict[str, Any] = {}
        for k in range(4):
            mod[f"conv{k}"] = b.conv(f"{3 * k}")
            mod[f"bn{k}"] = _bn(b, f"{3 * k + 1}")
            if f"{3 * k + 1}.num_batches_tracked" in b:
                b.raw(f"{3 * k + 1}.num_batches_tracked")
        mod["conv4"] = b.conv("12")
        spy[f"basic_module_{i}"] = mod
    out["spynet"] = spy
    for buf in ("mean", "std"):
        if buf in g:
            g.raw(buf)
    return {"params": out}


def convert_duf(sd: Mapping[str, Any], prefix: str = "",
                num_layer: int = 52,
                used: Optional[set] = None) -> Dict[str, Any]:
    """DUF (duf_arch.py:181-276)."""
    num_block = {16: 3, 28: 9, 52: 21}[num_layer]
    g = SDGet(sd, prefix, used)

    def unit(b: "SDGet") -> Dict[str, Any]:
        out = {"bn0": _bn(b, "0"), "conv0": b.conv("2"),
               "bn1": _bn(b, "3"), "conv1": b.conv("5")}
        for k in ("0", "3"):
            if f"{k}.num_batches_tracked" in b:
                b.raw(f"{k}.num_batches_tracked")
        return out

    out: Dict[str, Any] = {
        "conv3d1": g.conv("conv3d1"),
        "bn3d2": _bn(g, "bn3d2"),
        "conv3d2": g.conv("conv3d2"),
        "conv3d_r1": g.conv("conv3d_r1"),
        "conv3d_r2": g.conv("conv3d_r2"),
        "conv3d_f1": g.conv("conv3d_f1"),
        "conv3d_f2": g.conv("conv3d_f2"),
    }
    if "bn3d2.num_batches_tracked" in g:
        g.raw("bn3d2.num_batches_tracked")
    for i in range(num_block):
        out[f"dense_{i}"] = unit(g.scope(f"dense_block1.dense_blocks.{i}"))
    for i in range(3):
        out[f"reduce_{i}"] = unit(
            g.scope(f"dense_block2.temporal_reduce{i + 1}"))
    return {"params": out}


def convert_ridnet(sd: Mapping[str, Any], prefix: str = "",
                   num_block: int = 4,
                   used: Optional[set] = None) -> Dict[str, Any]:
    """RIDNet (ridnet_arch.py:140-185). The MeanShift convs are
    reconstructed as constants in our module; consumed only."""
    g = SDGet(sd, prefix, used)
    out: Dict[str, Any] = {"head": g.conv("head"), "tail": g.conv("tail")}
    for ms in ("sub_mean", "add_mean"):
        g.raw(f"{ms}.weight")
        g.raw(f"{ms}.bias")
    for i in range(num_block):
        b = g.scope(f"body.{i}")
        out[f"eam_{i}"] = {
            "mr_d1_conv1": b.conv("merge.dilation1.0"),
            "mr_d1_conv2": b.conv("merge.dilation1.2"),
            "mr_d2_conv1": b.conv("merge.dilation2.0"),
            "mr_d2_conv2": b.conv("merge.dilation2.2"),
            "mr_agg": b.conv("merge.aggregation.0"),
            "block1": {"conv1": b.conv("block1.conv1"),
                       "conv2": b.conv("block1.conv2")},
            "er_conv1": b.conv("block2.body.0"),
            "er_conv2": b.conv("block2.body.2"),
            "er_conv3": b.conv("block2.body.4"),
            "ca_down": b.conv("ca.attention.1"),
            "ca_up": b.conv("ca.attention.3"),
        }
    return {"params": out}


def _ecb_rep(g: "SDGet", with_idt: bool) -> Dict[str, np.ndarray]:
    """Fold the multi-branch training-form ECB into its deploy 3x3 conv
    (ecbsr_arch.py rep_params) — exactly what the reference's eval forward
    computes."""
    w = _np(g.raw("conv3x3.weight")).copy()
    b = _np(g.raw("conv3x3.bias")).copy()
    k0 = _np(g.raw("conv1x1_3x3.k0"))[:, :, 0, 0]  # [M, In]
    b0 = _np(g.raw("conv1x1_3x3.b0"))
    k1 = _np(g.raw("conv1x1_3x3.k1"))  # [O, M, 3, 3]
    b1 = _np(g.raw("conv1x1_3x3.b1"))
    w += np.einsum("omhw,mi->oihw", k1, k0)
    b += b1 + np.einsum("m,omhw->o", b0, k1)
    for name in ("sbx", "sby", "lpl"):
        s = g.scope(f"conv1x1_{name}")
        ek0 = _np(s.raw("k0"))[:, :, 0, 0]  # [O, In]
        eb0 = _np(s.raw("b0"))
        scale = _np(s.raw("scale"))
        bias = _np(s.raw("bias"))
        mask = _np(s.raw("mask"))
        tmp = (scale * mask)[:, 0]  # [O, 3, 3]
        w += np.einsum("ohw,oi->oihw", tmp, ek0)
        b += bias + eb0 * tmp.sum(axis=(1, 2))
    if with_idt and w.shape[0] == w.shape[1]:
        for o in range(w.shape[0]):
            w[o, o, 1, 1] += 1.0
    return {"kernel": conv_kernel(w), "bias": b}


def convert_ecbsr(sd: Mapping[str, Any], prefix: str = "",
                  num_block: int = 4, with_idt: bool = False,
                  used: Optional[set] = None) -> Dict[str, Any]:
    """ECBSR training checkpoint -> our deploy-form module: each ECB's five
    branches are folded to one 3x3 conv (+ PReLU alpha)."""
    g = SDGet(sd, prefix, used)
    out: Dict[str, Any] = {}

    def block(idx: int, name: str, act: bool):
        sub = g.scope(f"backbone.{idx}")
        rep = _ecb_rep(sub, with_idt)
        if act:
            out[name] = {"conv": rep,
                         "prelu_alpha": _np(sub.raw("act.weight"))}
        else:
            out[name] = rep

    block(0, "ecb_in", True)
    for i in range(num_block):
        block(i + 1, f"ecb_{i}", True)
    block(num_block + 1, "conv_out", False)
    return {"params": out}


def _sg2_modconv(g: "SDGet") -> Dict[str, Any]:
    return {
        "weight": conv_kernel(_np(g.raw("weight"))[0]),  # [1,O,I,k,k]
        "modulation": {
            "weight": linear_kernel(g.raw("modulation.weight")),
            "bias": _np(g.raw("modulation.bias")),
        },
    }


def _sg2_styleconv(g: "SDGet") -> Dict[str, Any]:
    return {
        "modulated_conv": _sg2_modconv(g.scope("modulated_conv")),
        "noise_weight": _np(g.raw("weight")).reshape(()),
        "bias": _np(g.raw("activate.bias")),
    }


def _sg2_torgb(g: "SDGet") -> Dict[str, Any]:
    return {
        "modulated_conv": _sg2_modconv(g.scope("modulated_conv")),
        "bias": _np(g.raw("bias")).reshape(-1),
    }


def convert_stylegan2(sd: Mapping[str, Any], prefix: str = "",
                      out_size: int = 64, num_mlp: int = 8,
                      used: Optional[set] = None) -> Dict[str, Any]:
    """StyleGAN2 generator (stylegan2_arch.py:395-586). Returns
    ``(params, noises)``-style dict: the stored per-layer noise buffers are
    under key '_noises' (NHWC, pass as ``noises=`` for stored-noise
    parity)."""
    import math as _math

    g = SDGet(sd, prefix, used)
    out: Dict[str, Any] = {
        "constant_input": _np(
            g.raw("constant_input.weight")).transpose(0, 2, 3, 1),
        "style_conv1": _sg2_styleconv(g.scope("style_conv1")),
        "to_rgb1": _sg2_torgb(g.scope("to_rgb1")),
    }
    for i in range(num_mlp):
        out[f"mlp_{i}"] = {
            "weight": linear_kernel(g.raw(f"style_mlp.{i + 1}.weight")),
            "bias": _np(g.raw(f"style_mlp.{i + 1}.bias")),
        }
    log_size = int(_math.log2(out_size))
    num_layers = (log_size - 2) * 2 + 1
    for j in range(2 * (log_size - 2)):
        out[f"style_convs_{j}"] = _sg2_styleconv(g.scope(f"style_convs.{j}"))
    for i in range(log_size - 2):
        out[f"to_rgbs_{i}"] = _sg2_torgb(g.scope(f"to_rgbs.{i}"))
    noises = [
        _np(g.raw(f"noises.noise{i}")).transpose(0, 2, 3, 1)
        for i in range(num_layers)
    ]
    return {"params": out, "_noises": noises}


def convert_stylegan2_discriminator(
        sd: Mapping[str, Any], prefix: str = "", in_size: int = 64,
        used: Optional[set] = None) -> Dict[str, Any]:
    """StyleGAN2 discriminator (stylegan2_arch.py:734-799)."""
    import math as _math

    g = SDGet(sd, prefix, used)

    def convlayer(sub: "SDGet", conv_idx: int, bias: bool) -> Dict[str, Any]:
        out = {"conv": {"weight": conv_kernel(
            sub.raw(f"{conv_idx}.weight"))}}
        if bias:
            out["bias"] = _np(sub.raw(f"{conv_idx + 1}.bias"))
        return out

    log_size = int(_math.log2(in_size))
    out: Dict[str, Any] = {
        "conv_body_0": convlayer(g.scope("conv_body.0"), 0, True)}
    for li in range(1, log_size - 1):
        b = g.scope(f"conv_body.{li}")
        out[f"conv_body_{li}"] = {
            "conv1": convlayer(b.scope("conv1"), 0, True),
            "conv2": convlayer(b.scope("conv2"), 1, True),
            "skip": convlayer(b.scope("skip"), 1, False),
        }
    out["final_conv"] = convlayer(g.scope("final_conv"), 0, True)
    out["final_linear_0"] = {
        "weight": linear_kernel(g.raw("final_linear.0.weight")),
        "bias": _np(g.raw("final_linear.0.bias"))}
    out["final_linear_1"] = {
        "weight": linear_kernel(g.raw("final_linear.1.weight")),
        "bias": _np(g.raw("final_linear.1.bias"))}
    return {"params": out}


def convert_coupleprop(sd: Mapping[str, Any], prefix: str = "",
                       num_block: int = 5,
                       used: Optional[set] = None) -> Dict[str, Any]:
    g = SDGet(sd, prefix, used)
    return {"params": {
        "backward_trunk": _conv_res_blocks(g.scope("backward_trunk"),
                                           num_block),
        "forward_trunk": _conv_res_blocks(g.scope("forward_trunk"),
                                          num_block),
        "backward_fusion": g.conv("backward_fusion"),
        "forward_fusion": g.conv("forward_fusion"),
        "conv_last": g.conv("conv_last"),
    }}


# ---------------------------------------------------------------------------
# PatchGAN discriminator (taming NLayerDiscriminator, used by the stage-2
# GAN loss — contperceptual.py:132)
# ---------------------------------------------------------------------------


def convert_discriminator(sd: Mapping[str, Any], prefix: str = "",
                          n_layers: int = 3,
                          used: Optional[set] = None) -> Dict[str, Any]:
    """taming NLayerDiscriminator (sequential ``main.{i}``) ->
    models.discriminator.NLayerDiscriminator ({'params', 'batch_stats'})."""
    g = SDGet(sd, prefix, used)
    params: Dict[str, Any] = {"conv0": g.conv("main.0")}
    stats: Dict[str, Any] = {}
    for n in range(1, n_layers + 1):
        idx = 2 + 3 * (n - 1)
        params[f"conv{n}"] = g.conv(f"main.{idx}")
        params[f"bn{n}"] = {
            "scale": _np(g.raw(f"main.{idx + 1}.weight")),
            "bias": _np(g.raw(f"main.{idx + 1}.bias")),
        }
        stats[f"bn{n}"] = {
            "mean": _np(g.raw(f"main.{idx + 1}.running_mean")),
            "var": _np(g.raw(f"main.{idx + 1}.running_var")),
        }
    params["conv_out"] = g.conv(f"main.{2 + 3 * n_layers}")
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# FID InceptionV3 (pt_inception-2015-12-05, basicsr/archs/inception.py)
# ---------------------------------------------------------------------------


def convert_inception(sd: Mapping[str, Any], prefix: str = "",
                      used: Optional[set] = None) -> Dict[str, Any]:
    """pt_inception FID checkpoint -> InceptionV3FID params.

    Walks the torch module paths generically: every ``<path>.conv.weight`` /
    ``<path>.bn.{weight,bias,running_mean,running_var}`` quintet becomes a
    BasicConv at the same nested path (names match 1:1). The 1008-class fc
    head and AuxLogits are not part of the pool3 feature tower and are
    skipped (but marked consumed for reporting)."""
    g = SDGet(sd, prefix, used)
    out: Dict[str, Any] = {}
    for key in sd:
        if not key.startswith(prefix):
            continue
        rel = key[len(prefix):]
        if rel.startswith(("fc.", "AuxLogits.")):
            g.used.add(key)
            continue
        if "num_batches_tracked" in rel:
            g.used.add(key)
            continue
        parts = rel.split(".")
        leaf = parts[-1]
        kind = parts[-2]  # 'conv' or 'bn'
        node = out
        for p in parts[:-2]:
            node = node.setdefault(p, {})
        if kind == "conv" and leaf == "weight":
            node["conv"] = {"kernel": conv_kernel(g.raw(rel))}
        elif kind == "bn":
            bn = node.setdefault("bn", {})
            name = {"weight": "scale", "bias": "bias",
                    "running_mean": "mean", "running_var": "var"}[leaf]
            bn[name] = _np(g.raw(rel))
        else:
            raise KeyError(f"unrecognized inception key {key}")
    return {"params": out}


# ---------------------------------------------------------------------------
# RAFT / SpyNet
# ---------------------------------------------------------------------------


def _raft_resblock(g: SDGet, batch_norm: bool) -> Dict[str, Any]:
    out: Dict[str, Any] = {"conv1": g.conv("conv1"), "conv2": g.conv("conv2")}
    if batch_norm:
        out["norm1"] = _frozen_bn(g.scope("norm1"))
        out["norm2"] = _frozen_bn(g.scope("norm2"))
    if "downsample.0.weight" in g:
        out["downsample"] = g.conv("downsample.0")
        if batch_norm and "downsample.1.weight" in g:
            out["norm3"] = _frozen_bn(g.scope("downsample.1"))
    return out


def _frozen_bn(g: SDGet) -> Dict[str, np.ndarray]:
    return {
        "scale": _np(g.raw("weight")),
        "bias": _np(g.raw("bias")),
        "mean": _np(g.raw("running_mean")),
        "var": _np(g.raw("running_var")),
    }


def _raft_encoder(g: SDGet, batch_norm: bool) -> Dict[str, Any]:
    out: Dict[str, Any] = {"conv1": g.conv("conv1"), "conv2": g.conv("conv2")}
    if batch_norm:
        out["norm1"] = _frozen_bn(g.scope("norm1"))
    for layer in (1, 2, 3):
        for blk in (0, 1):
            out[f"layer{layer}_{blk}"] = _raft_resblock(
                g.scope(f"layer{layer}.{blk}"), batch_norm
            )
    return out


def convert_raft(sd: Mapping[str, Any], prefix: str = "",
                 used: Optional[set] = None) -> Dict[str, Any]:
    """raft-things.pth ('normal' RAFT: instance-norm fnet, batch-norm cnet)."""
    g = SDGet(sd, prefix, used)
    upd = g.scope("update_block")
    params = {
        "fnet": _raft_encoder(g.scope("fnet"), batch_norm=False),
        "cnet": _raft_encoder(g.scope("cnet"), batch_norm=True),
        # the update block lives under the nn.scan wrapper scope
        "update_scan": {"update_block": None},
    }
    update_block = {
            "encoder": {
                "convc1": upd.conv("encoder.convc1"),
                "convc2": upd.conv("encoder.convc2"),
                "convf1": upd.conv("encoder.convf1"),
                "convf2": upd.conv("encoder.convf2"),
                "conv": upd.conv("encoder.conv"),
            },
            "gru": {
                name: upd.conv(f"gru.{name}")
                for name in ("convz1", "convr1", "convq1",
                             "convz2", "convr2", "convq2")
            },
            "flow_head_conv1": upd.conv("flow_head.conv1"),
            "flow_head_conv2": upd.conv("flow_head.conv2"),
            "mask_conv1": upd.conv("mask.0"),
            "mask_conv2": upd.conv("mask.2"),
    }
    params["update_scan"]["update_block"] = update_block
    return {"params": params}


def deconv_kernel(w) -> np.ndarray:
    """torch ConvTranspose2d [in, out, kh, kw] -> flax ConvTranspose
    [kh, kw, in, out], spatially flipped (lax.conv_transpose with
    transpose_kernel=False does not flip; torch's operator does)."""
    w = _np(w)
    return np.ascontiguousarray(w.transpose(2, 3, 0, 1)[::-1, ::-1])


def convert_maskflownet(sd: Mapping[str, Any], prefix: str = "",
                        used: Optional[set] = None) -> Dict[str, Any]:
    """maskflownet-ft-sintel ckpt (MaskFlownet_S,
    basicsr/archs/maskflownet_arch.py:91-440) -> flow.maskflownet.MaskFlownetS.

    Name map: conv{i}{a,b,c}.0 -> enc{i-1}{a,b,c}; conv{k}_{j}.0 ->
    head{k-1}/conv_{j}; upfeat{k}/deform{k}/conv{k}f -> *{k-1};
    dc_conv{1..6}.0 -> dc{0..5}; dc_conv7 -> dc_flow."""
    g = SDGet(sd, prefix, used)
    params: Dict[str, Any] = {}
    for i in range(1, 7):
        for s in "abc":
            params[f"enc{i - 1}{s}"] = {"conv": g.conv(f"conv{i}{s}.0")}

    def head(ref_prefix: str, name: str):
        params[name] = {
            f"conv_{j}": {"conv": g.conv(f"{ref_prefix}_{j}.0")}
            for j in range(5)
        }

    head("conv6", "head6")
    params["pred_flow6"] = g.conv("pred_flow6")
    params["pred_mask6"] = g.conv("pred_mask6")
    for k in (5, 4, 3, 2):  # reference level k == our level k-1
        o = k - 1
        params[f"upfeat{o}"] = {
            "deconv": {
                "kernel": deconv_kernel(g.raw(f"upfeat{k}.weight")),
                "bias": _np(g.raw(f"upfeat{k}.bias")),
            }
        }
        params[f"deform{o}"] = {
            "weight": conv_kernel(g.raw(f"deform{k}.weight")),
            "bias": _np(g.raw(f"deform{k}.bias")),
        }
        params[f"convf{o}"] = g.conv(f"conv{k}f.0")
        head(f"conv{k}", f"head{o}")
        params[f"pred_flow{o}"] = g.conv(f"pred_flow{k}")
        if k != 2:
            params[f"pred_mask{o}"] = g.conv(f"pred_mask{k}")
    for i in range(1, 7):
        params[f"dc{i - 1}"] = {"conv": g.conv(f"dc_conv{i}.0")}
    params["dc_flow"] = g.conv("dc_conv7")
    return {"params": params}


def convert_spynet(sd: Mapping[str, Any], prefix: str = "",
                   used: Optional[set] = None) -> Dict[str, Any]:
    """spynet_sintel_final ckpt ({'params': ...} wrapper handled by caller)."""
    g = SDGet(sd, prefix, used)
    params = {}
    for i in range(6):
        m = g.scope(f"basic_module.{i}.basic_module")
        params[f"basic_module{i}"] = {
            f"conv{j}": m.conv(f"{2 * j}") for j in range(5)
        }
    return {"params": params}


# ---------------------------------------------------------------------------
# top-level loaders
# ---------------------------------------------------------------------------


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "params", "params_ema", "model"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
            break
    # strip DDP 'module.' prefixes (raft_arch.py:579-584)
    return {
        (k[7:] if k.startswith("module.") else k): v for k, v in obj.items()
    }


def apply_litema_shadows(
    sd: Mapping[str, Any],
    used: Optional[set] = None,
) -> Tuple[Dict[str, Any], int]:
    """Swap ``model.*`` weights for their LitEma shadow buffers.

    The reference samples inside ``model.ema_scope()`` (scripts
    vsr_val...old.py:321), which copies the EMA shadows onto the live
    model first (ldm/models/diffusion/ddpm.py:294-307). LitEma stores one
    shadow buffer per trainable param under the param's dotted name with
    the dots REMOVED (ldm/modules/ema.py:16-21), so a use_ema-trained
    Lightning checkpoint carries ``model_ema.diffusion_modelinput_blocks...``
    keys whose tensors are the effective inference weights. We reconstruct
    the dotted->flat mapping from the checkpoint's own ``model.*`` keys
    (unambiguous: derived names are checked for collisions) and substitute.

    Returns (new state dict, number of params replaced). No ``model_ema.*``
    keys -> the dict is returned unchanged with count 0.
    """
    shadows = {
        k[len("model_ema."):]: v
        for k, v in sd.items()
        if k.startswith("model_ema.")
        and k not in ("model_ema.decay", "model_ema.num_updates")
    }
    out = dict(sd)
    if not shadows:
        return out, 0
    flat_to_key: Dict[str, str] = {}
    n = 0
    for k in sd:
        if not k.startswith("model."):
            continue
        flat = k[len("model."):].replace(".", "")
        if flat in flat_to_key:
            raise ValueError(
                f"ambiguous LitEma flattened name {flat!r}: both "
                f"{flat_to_key[flat]!r} and {k!r} map to it")
        flat_to_key[flat] = k
        if flat in shadows:
            out[k] = shadows[flat]
            n += 1
            if used is not None:
                used.add("model_ema." + flat)
    unmatched = set(shadows) - set(flat_to_key)
    if unmatched:
        raise KeyError(
            f"{len(unmatched)} model_ema.* shadows have no matching "
            f"model.* param, e.g. {sorted(unmatched)[:3]}")
    if used is not None:
        for aux in ("model_ema.decay", "model_ema.num_updates"):
            if aux in sd:
                used.add(aux)
    return out, n


def convert_mgld_checkpoint(
    sd: Mapping[str, Any],
    report_unused: bool = False,
    use_ema: bool = True,
) -> Dict[str, Any]:
    """Full MGLD-VSR Lightning checkpoint -> pipeline param dict
    {'unet', 'structcond', 'vae', 'clip'} (flow nets ship separately).

    ``use_ema=True`` (default) prefers LitEma shadow weights when the
    checkpoint carries ``model_ema.*`` keys — matching the reference's
    ``ema_scope()`` inference protocol (scripts old.py:321)."""
    used: set = set()
    n_ema = 0
    if use_ema:
        sd, n_ema = apply_litema_shadows(sd, used=used)
    if n_ema:
        print(f"[ckpt_convert] LitEma shadows applied: {n_ema} model params "
              "use EMA weights (ema_scope protocol)")
    out = {
        "unet": convert_unet(sd, used=used),
        "structcond": convert_structcond(sd, used=used),
        "vae": convert_autoencoder(sd, used=used),
        "clip": convert_openclip_text(sd, used=used),
    }
    if report_unused:
        unused = sorted(set(sd) - used)
        out["_unused_keys"] = unused
        out["_ema_shadows_applied"] = n_ema
    return out


def to_jax(tree):
    """numpy pytree -> jnp arrays."""
    import jax.numpy as jnp

    return traverse_util.unflatten_dict(
        {
            k: jnp.asarray(v)
            for k, v in traverse_util.flatten_dict(tree).items()
        }
    )
