"""Weight-converter tests.

Functional: torch forward oracles (written from the documented reference
structure) with random weights, converted through the converter, must match
the flax modules' outputs.

Structural: converting a synthetic full-UNet state dict must produce exactly
the parameter tree a fresh flax init produces (keys and shapes).
"""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from flax import traverse_util

from mgldvsr_tpu.io import ckpt_convert as cc
from mgldvsr_tpu.models.attention_blocks import QKVAttentionBlock, SpatialTransformer
from mgldvsr_tpu.models.temporal import SpatialTemporalConv, TemporalAttention
from mgldvsr_tpu.models.vae import VAEConfig
from mgldvsr_tpu.models.layers import VAEResnetBlock
from mgldvsr_tpu.models.cliptext import CLIPTextConfig, OpenCLIPTextEncoder


def _t(shape, seed):
    return torch.from_numpy(
        np.random.RandomState(seed).randn(*shape).astype(np.float32)
    )


# --- QKV legacy attention ---------------------------------------------------


def _torch_qkv_legacy(x_nchw, sd, heads):
    """OpenAI AttentionBlock: norm -> 1x1 qkv -> legacy head-split attention
    -> zero-init proj; residual."""
    n, c, h, w = x_nchw.shape
    y = F.group_norm(x_nchw, 32, sd["norm.weight"], sd["norm.bias"], eps=1e-5)
    y = y.reshape(n, c, h * w)
    qkv = F.conv1d(y, sd["qkv.weight"], sd["qkv.bias"])  # [n, 3c, hw]
    d = c // heads
    qkv = qkv.reshape(n * heads, 3 * d, h * w)
    q, k, v = qkv.split(d, dim=1)
    scale = 1 / (d**0.5)
    attn = torch.softmax(q.transpose(1, 2) @ k * scale, dim=-1)
    out = (v @ attn.transpose(1, 2)).reshape(n, c, h * w)
    out = F.conv1d(out, sd["proj_out.weight"], sd["proj_out.bias"])
    return x_nchw + out.reshape(n, c, h, w)


def test_qkv_legacy_attention_matches_torch():
    c, heads, hw = 64, 4, 8
    sd = {
        "norm.weight": _t((c,), 0),
        "norm.bias": _t((c,), 1),
        "qkv.weight": _t((3 * c, c, 1), 2) * 0.1,
        "qkv.bias": _t((3 * c,), 3) * 0.1,
        "proj_out.weight": _t((c, c, 1), 4) * 0.1,
        "proj_out.bias": _t((c,), 5) * 0.1,
    }
    x = _t((2, c, hw, hw), 6)

    ref = _torch_qkv_legacy(x, sd, heads).numpy().transpose(0, 2, 3, 1)

    params = {"params": cc._qkv_legacy(cc.SDGet(sd), c, heads)}
    mod = QKVAttentionBlock(num_heads=heads)
    ours = np.asarray(
        mod.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    )
    assert np.allclose(ours, ref, atol=2e-4), np.abs(ours - ref).max()


# --- SpatialTransformer -------------------------------------------------------


def _torch_transformer(x_nchw, sd, heads, dim_head, ctx):
    n, c, h, w = x_nchw.shape
    inner = heads * dim_head

    def lin(name, z):
        return z @ sd[f"{name}.weight"].T + (
            sd[f"{name}.bias"] if f"{name}.bias" in sd else 0.0
        )

    def attn(pref, z, context):
        q = z @ sd[f"{pref}.to_q.weight"].T
        k = context @ sd[f"{pref}.to_k.weight"].T
        v = context @ sd[f"{pref}.to_v.weight"].T

        def split(a):
            b, l, _ = a.shape
            return a.reshape(b, l, heads, dim_head).permute(0, 2, 1, 3)

        o = F.scaled_dot_product_attention(split(q), split(k), split(v))
        o = o.permute(0, 2, 1, 3).reshape(z.shape[0], -1, inner)
        return lin(f"{pref}.to_out.0", o)

    y = F.group_norm(x_nchw, 32, sd["norm.weight"], sd["norm.bias"], eps=1e-6)
    y = y.reshape(n, c, h * w).transpose(1, 2)
    y = lin("proj_in", y)
    ln = lambda nm, z: F.layer_norm(
        z, (z.shape[-1],), sd[f"{nm}.weight"], sd[f"{nm}.bias"]
    )
    b = "transformer_blocks.0"
    y = y + attn(f"{b}.attn1", ln(f"{b}.norm1", y), ln(f"{b}.norm1", y))
    y = y + attn(f"{b}.attn2", ln(f"{b}.norm2", y), ctx)
    ff_in = lin(f"{b}.ff.net.0.proj", ln(f"{b}.norm3", y))
    a, gate = ff_in.chunk(2, dim=-1)
    y = y + lin(f"{b}.ff.net.2", a * F.gelu(gate))
    y = lin("proj_out", y)
    return x_nchw + y.transpose(1, 2).reshape(n, c, h, w)


def test_spatial_transformer_matches_torch():
    c, heads, dim_head, hw, ctx_dim = 64, 4, 16, 4, 32
    inner = heads * dim_head
    s = iter(range(100))
    sd = {
        "norm.weight": _t((c,), next(s)),
        "norm.bias": _t((c,), next(s)),
        "proj_in.weight": _t((inner, c), next(s)) * 0.1,
        "proj_in.bias": _t((inner,), next(s)) * 0.1,
        "proj_out.weight": _t((c, inner), next(s)) * 0.1,
        "proj_out.bias": _t((c,), next(s)) * 0.1,
    }
    b = "transformer_blocks.0"
    for nm in ("norm1", "norm2", "norm3"):
        sd[f"{b}.{nm}.weight"] = _t((inner,), next(s))
        sd[f"{b}.{nm}.bias"] = _t((inner,), next(s))
    for a in ("attn1", "attn2"):
        kdim = inner if a == "attn1" else ctx_dim
        sd[f"{b}.{a}.to_q.weight"] = _t((inner, inner), next(s)) * 0.1
        sd[f"{b}.{a}.to_k.weight"] = _t((inner, kdim), next(s)) * 0.1
        sd[f"{b}.{a}.to_v.weight"] = _t((inner, kdim), next(s)) * 0.1
        sd[f"{b}.{a}.to_out.0.weight"] = _t((inner, inner), next(s)) * 0.1
        sd[f"{b}.{a}.to_out.0.bias"] = _t((inner,), next(s)) * 0.1
    sd[f"{b}.ff.net.0.proj.weight"] = _t((inner * 8, inner), next(s)) * 0.1
    sd[f"{b}.ff.net.0.proj.bias"] = _t((inner * 8,), next(s)) * 0.1
    sd[f"{b}.ff.net.2.weight"] = _t((inner, inner * 4), next(s)) * 0.1
    sd[f"{b}.ff.net.2.bias"] = _t((inner,), next(s)) * 0.1

    x = _t((2, c, hw, hw), 90)
    ctx = _t((2, 7, ctx_dim), 91)
    ref = (
        _torch_transformer(x, sd, heads, dim_head, ctx)
        .numpy()
        .transpose(0, 2, 3, 1)
    )

    params = {"params": cc._transformer(cc.SDGet(sd), depth=1)}
    mod = SpatialTransformer(heads, dim_head, 1, ctx_dim, use_linear=True)
    ours = np.asarray(
        mod.apply(
            params,
            jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
            jnp.asarray(ctx.numpy()),
        )
    )
    assert np.allclose(ours, ref, atol=2e-4), np.abs(ours - ref).max()


# --- temporal modules ---------------------------------------------------------


def test_temporal_conv_matches_torch():
    c, t, hw = 8, 5, 4
    sd = {
        "temporal_conv.weight": _t((c, c, 3, 1, 1), 0) * 0.2,
        "temporal_conv.bias": _t((c,), 1) * 0.2,
        "temporal_alpha": torch.tensor([0.3]),
    }
    x = _t((t, c, hw, hw), 2)
    v = x.reshape(1, t, c, hw, hw).permute(0, 2, 1, 3, 4)  # b c t h w
    res = F.conv3d(v, sd["temporal_conv.weight"], sd["temporal_conv.bias"],
                   padding=(1, 0, 0))
    res = res.permute(0, 2, 1, 3, 4).reshape(t, c, hw, hw)
    a = sd["temporal_alpha"]
    ref = (a * res + (1 - a) * x).numpy().transpose(0, 2, 3, 1)

    params = {"params": cc._stconv(cc.SDGet(sd))}
    mod = SpatialTemporalConv(num_frames=t)
    ours = np.asarray(mod.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    assert np.allclose(ours, ref, atol=1e-5), np.abs(ours - ref).max()


def test_temporal_attention_matches_torch():
    c, t, hw, heads, dim_head = 16, 5, 2, 2, 8
    inner = heads * dim_head
    s = iter(range(100, 130))
    sd = {
        "norm.weight": _t((c,), next(s)),
        "norm.bias": _t((c,), next(s)),
        "temporal_attn.to_q.weight": _t((inner, c), next(s)) * 0.2,
        "temporal_attn.to_k.weight": _t((inner, c), next(s)) * 0.2,
        "temporal_attn.to_v.weight": _t((inner, c), next(s)) * 0.2,
        "temporal_attn.to_out.0.weight": _t((c, inner), next(s)) * 0.2,
        "temporal_attn.to_out.0.bias": _t((c,), next(s)) * 0.2,
        "temporal_alpha": torch.tensor([0.4]),
    }
    x = _t((t, c, hw, hw), 3)
    # torch oracle: (b t) c h w -> (b h w) t c
    seq = x.reshape(1, t, c, hw * hw).permute(0, 3, 1, 2).reshape(hw * hw, t, c)
    y = F.layer_norm(seq, (c,), sd["norm.weight"], sd["norm.bias"])
    q = y @ sd["temporal_attn.to_q.weight"].T
    k = y @ sd["temporal_attn.to_k.weight"].T
    v = y @ sd["temporal_attn.to_v.weight"].T

    def split(z):
        return z.reshape(hw * hw, t, heads, dim_head).permute(0, 2, 1, 3)

    o = F.scaled_dot_product_attention(split(q), split(k), split(v))
    o = o.permute(0, 2, 1, 3).reshape(hw * hw, t, inner)
    o = o @ sd["temporal_attn.to_out.0.weight"].T + sd["temporal_attn.to_out.0.bias"]
    res = o.reshape(1, hw * hw, t, c).permute(0, 2, 3, 1).reshape(t, c, hw, hw)
    a = sd["temporal_alpha"]
    ref = (a * res + (1 - a) * x).numpy().transpose(0, 2, 3, 1)

    params = {"params": cc._tattn(cc.SDGet(sd))}
    mod = TemporalAttention(num_frames=t, num_heads=heads, dim_head=dim_head)
    ours = np.asarray(mod.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    assert np.allclose(ours, ref, atol=2e-5), np.abs(ours - ref).max()


# --- VAE resnet ---------------------------------------------------------------


def test_vae_resnet_matches_torch():
    cin, cout, hw = 32, 64, 8
    s = iter(range(50))
    sd = {
        "norm1.weight": _t((cin,), next(s)),
        "norm1.bias": _t((cin,), next(s)),
        "conv1.weight": _t((cout, cin, 3, 3), next(s)) * 0.1,
        "conv1.bias": _t((cout,), next(s)) * 0.1,
        "norm2.weight": _t((cout,), next(s)),
        "norm2.bias": _t((cout,), next(s)),
        "conv2.weight": _t((cout, cout, 3, 3), next(s)) * 0.1,
        "conv2.bias": _t((cout,), next(s)) * 0.1,
        "nin_shortcut.weight": _t((cout, cin, 1, 1), next(s)) * 0.1,
        "nin_shortcut.bias": _t((cout,), next(s)) * 0.1,
    }
    x = _t((2, cin, hw, hw), 49)
    h = F.group_norm(x, 32, sd["norm1.weight"], sd["norm1.bias"], eps=1e-6)
    h = h * torch.sigmoid(h)
    h = F.conv2d(h, sd["conv1.weight"], sd["conv1.bias"], padding=1)
    h = F.group_norm(h, 32, sd["norm2.weight"], sd["norm2.bias"], eps=1e-6)
    h = h * torch.sigmoid(h)
    h = F.conv2d(h, sd["conv2.weight"], sd["conv2.bias"], padding=1)
    skip = F.conv2d(x, sd["nin_shortcut.weight"], sd["nin_shortcut.bias"])
    ref = (skip + h).numpy().transpose(0, 2, 3, 1)

    params = {"params": cc._vae_resnet(cc.SDGet(sd))}
    mod = VAEResnetBlock(out_channels=cout)
    ours = np.asarray(mod.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    assert np.allclose(ours, ref, atol=2e-4), np.abs(ours - ref).max()


# --- CLIP text block ----------------------------------------------------------


def test_clip_text_tower_matches_torch_oracle():
    cfg = CLIPTextConfig(vocab_size=100, width=32, heads=4, layers=2,
                         context_length=8, layer="last")
    s = iter(range(200, 260))
    d = cfg.width
    sd = {
        "token_embedding.weight": _t((cfg.vocab_size, d), next(s)) * 0.1,
        "positional_embedding": _t((cfg.context_length, d), next(s)) * 0.1,
        "ln_final.weight": _t((d,), next(s)),
        "ln_final.bias": _t((d,), next(s)),
    }
    for i in range(cfg.layers):
        p = f"transformer.resblocks.{i}"
        sd[f"{p}.ln_1.weight"] = _t((d,), next(s))
        sd[f"{p}.ln_1.bias"] = _t((d,), next(s))
        sd[f"{p}.ln_2.weight"] = _t((d,), next(s))
        sd[f"{p}.ln_2.bias"] = _t((d,), next(s))
        sd[f"{p}.attn.in_proj_weight"] = _t((3 * d, d), next(s)) * 0.1
        sd[f"{p}.attn.in_proj_bias"] = _t((3 * d,), next(s)) * 0.1
        sd[f"{p}.attn.out_proj.weight"] = _t((d, d), next(s)) * 0.1
        sd[f"{p}.attn.out_proj.bias"] = _t((d,), next(s)) * 0.1
        sd[f"{p}.mlp.c_fc.weight"] = _t((4 * d, d), next(s)) * 0.1
        sd[f"{p}.mlp.c_fc.bias"] = _t((4 * d,), next(s)) * 0.1
        sd[f"{p}.mlp.c_proj.weight"] = _t((d, 4 * d), next(s)) * 0.1
        sd[f"{p}.mlp.c_proj.bias"] = _t((d,), next(s)) * 0.1

    tokens = np.array([[1, 5, 7, 2, 0, 0, 0, 0]], dtype=np.int32)

    # torch oracle
    x = sd["token_embedding.weight"][torch.from_numpy(tokens).long()]
    x = x + sd["positional_embedding"]
    L = cfg.context_length
    mask = torch.full((L, L), float("-inf")).triu(1)
    for i in range(cfg.layers):
        p = f"transformer.resblocks.{i}"
        y = F.layer_norm(x, (d,), sd[f"{p}.ln_1.weight"], sd[f"{p}.ln_1.bias"])
        qkv = y @ sd[f"{p}.attn.in_proj_weight"].T + sd[f"{p}.attn.in_proj_bias"]
        q, k, v = qkv.chunk(3, dim=-1)
        hd = d // cfg.heads

        def split(z):
            return z.reshape(1, L, cfg.heads, hd).permute(0, 2, 1, 3)

        o = F.scaled_dot_product_attention(split(q), split(k), split(v),
                                           attn_mask=mask)
        o = o.permute(0, 2, 1, 3).reshape(1, L, d)
        x = x + (o @ sd[f"{p}.attn.out_proj.weight"].T
                 + sd[f"{p}.attn.out_proj.bias"])
        y = F.layer_norm(x, (d,), sd[f"{p}.ln_2.weight"], sd[f"{p}.ln_2.bias"])
        h = y @ sd[f"{p}.mlp.c_fc.weight"].T + sd[f"{p}.mlp.c_fc.bias"]
        h = F.gelu(h)
        x = x + (h @ sd[f"{p}.mlp.c_proj.weight"].T
                 + sd[f"{p}.mlp.c_proj.bias"])
    ref = F.layer_norm(x, (d,), sd["ln_final.weight"], sd["ln_final.bias"]).numpy()

    params = cc.convert_openclip_text(sd, prefix="", layers=cfg.layers,
                                      penultimate=False)
    mod = OpenCLIPTextEncoder(cfg)
    ours = np.asarray(mod.apply(cc.to_jax(params), jnp.asarray(tokens)))
    assert np.allclose(ours, ref, atol=2e-4), np.abs(ours - ref).max()


# --- structural completeness: full UNet ----------------------------------------


def _fill_unet_sd(flax_params):
    """Inverse-map a flax UNet tree into a synthetic torch state dict by
    reversing the converter's layout transforms; conversion must round-trip."""
    # This uses the converter's own mapping in reverse via name surgery:
    # we only check key-set/shape equality after conversion.
    raise NotImplementedError


def test_unet_conversion_structural_completeness():
    """Synthetic torch state dict (built from the documented SD naming walk)
    converts into exactly the tree flax init produces."""
    from mgldvsr_tpu.models.unet import InflatedUNetDualCond, UNetConfig

    cfg = UNetConfig(
        model_channels=32,
        num_head_channels=16,
        context_dim=32,
        semb_channels=32,
        channel_mult=(1, 2),
        attention_resolutions=(1, 2),
        num_frames=2,
    )
    mod = InflatedUNetDualCond(cfg)
    x = jnp.zeros((2, 8, 8, 4))
    t = jnp.zeros((2,), jnp.int32)
    ctx = jnp.zeros((2, 7, cfg.context_dim))
    s_cond = {"8": jnp.zeros((2, 8, 8, cfg.semb_channels)),
              "4": jnp.zeros((2, 4, 4, cfg.semb_channels))}
    ref_params = mod.init(jax.random.PRNGKey(0), x, t, ctx, s_cond)
    ref_flat = traverse_util.flatten_dict(ref_params, sep="/")

    # build synthetic torch sd with shapes inverse to the flax tree
    sd = {}

    def put(torch_key, flax_key):
        arr = np.asarray(ref_flat[flax_key])
        leaf = flax_key.rsplit("/", 1)[-1]
        if leaf == "kernel":
            if arr.ndim == 4:
                arr = arr.transpose(3, 2, 0, 1)
            elif arr.ndim == 5:
                arr = arr.transpose(4, 3, 0, 1, 2)
            elif arr.ndim == 2:
                arr = arr.transpose(1, 0)
            sd[f"{torch_key}.weight"] = torch.from_numpy(np.ascontiguousarray(arr))
        elif leaf == "scale":
            sd[f"{torch_key}.weight"] = torch.from_numpy(arr)
        elif leaf == "alpha":
            sd[torch_key] = torch.from_numpy(arr)
        else:
            sd[f"{torch_key}.{leaf}"] = torch.from_numpy(arr)

    def put_module(torch_prefix, flax_prefix, names):
        for tk, fk in names.items():
            for leaf in ("kernel", "bias", "scale", "alpha"):
                k = f"{flax_prefix}/{fk}/{leaf}" if fk else f"{flax_prefix}/{leaf}"
                if k in ref_flat:
                    put(f"{torch_prefix}.{tk}" if tk else torch_prefix, k)

    def res_names(p, fp, dual=True):
        put_module(p, fp, {
            "in_layers.0": "GroupNorm_0", "in_layers.2": "conv1",
            "emb_layers.1": "emb_proj", "out_layers.0": "GroupNorm_1",
            "out_layers.3": "conv2", "skip_connection": "skip",
        })
        if dual:
            put_module(f"{p}.spade", f"{fp}/spade", {
                "param_free_norm": "GroupNorm_0", "mlp_shared.0": "mlp_shared",
                "mlp_gamma": "mlp_gamma", "mlp_beta": "mlp_beta",
            })

    def tfm_names(p, fp):
        put_module(p, fp, {"norm": "GroupNorm_0", "proj_in": "proj_in",
                           "proj_out": "proj_out"})
        b = f"{p}.transformer_blocks.0"
        fb = f"{fp}/block_0"
        put_module(b, fb, {"norm1": "norm1", "norm2": "norm2", "norm3": "norm3"})
        for a in ("attn1", "attn2"):
            put_module(f"{b}.{a}", f"{fb}/{a}", {
                "to_q": "to_q", "to_k": "to_k", "to_v": "to_v",
                "to_out.0": "to_out",
            })
        put_module(f"{b}.ff.net", f"{fb}/ff", {"0.proj": "proj_in", "2": "proj_out"})

    def stconv_names(p, fp):
        put_module(p, fp, {"temporal_conv": "temporal_conv"})
        put(f"{p}.temporal_alpha", f"{fp}/alpha")

    def tattn_names(p, fp):
        put_module(p, fp, {"norm": "norm"})
        put_module(f"{p}.temporal_attn", fp, {
            "to_q": "to_q", "to_k": "to_k", "to_v": "to_v", "to_out.0": "to_out",
        })
        put(f"{p}.temporal_alpha", f"{fp}/alpha")

    pre = "model.diffusion_model"
    put_module(f"{pre}.time_embed", "params/time_embed", {"0": "fc1", "2": "fc2"})
    put_module(f"{pre}.input_blocks.0.0", "params/conv_in", {"": ""})
    put_module(f"{pre}.out.0", "params/GroupNorm_0", {"": ""})
    put_module(f"{pre}.out.2", "params/conv_out", {"": ""})

    idx, ds = 1, 1
    for level in range(len(cfg.channel_mult)):
        for nr in range(cfg.num_res_blocks):
            res_names(f"{pre}.input_blocks.{idx}.0", f"params/in_{level}_{nr}_res")
            if ds in cfg.attention_resolutions:
                tfm_names(f"{pre}.input_blocks.{idx}.1",
                          f"params/in_{level}_{nr}_attn")
            idx += 1
        if level != len(cfg.channel_mult) - 1:
            put_module(f"{pre}.input_blocks.{idx}.0", f"params/in_{level}_down",
                       {"op": "op"})
            idx += 1
            ds *= 2

    res_names(f"{pre}.middle_block.0", "params/mid_res1")
    stconv_names(f"{pre}.middle_block.1", "params/mid_stconv1")
    tfm_names(f"{pre}.middle_block.2", "params/mid_attn")
    tattn_names(f"{pre}.middle_block.3", "params/mid_tattn")
    res_names(f"{pre}.middle_block.4", "params/mid_res2")
    stconv_names(f"{pre}.middle_block.5", "params/mid_stconv2")

    idx = 0
    for level in reversed(range(len(cfg.channel_mult))):
        for i in range(cfg.num_res_blocks + 1):
            res_names(f"{pre}.output_blocks.{idx}.0", f"params/out_{level}_{i}_res")
            sub = 1
            if ds in cfg.attention_resolutions:
                tfm_names(f"{pre}.output_blocks.{idx}.{sub}",
                          f"params/out_{level}_{i}_attn")
                sub += 1
            if level and i == cfg.num_res_blocks:
                put_module(f"{pre}.output_blocks.{idx}.{sub}",
                           f"params/out_{level}_up", {"conv": "conv"})
                ds //= 2
            idx += 1

    used = set()
    converted = cc.convert_unet(
        sd,
        channel_mult=cfg.channel_mult,
        num_res_blocks=cfg.num_res_blocks,
        attention_resolutions=cfg.attention_resolutions,
        used=used,
    )
    conv_flat = traverse_util.flatten_dict(converted, sep="/")
    assert set(conv_flat) == set(ref_flat), (
        sorted(set(ref_flat) - set(conv_flat))[:5],
        sorted(set(conv_flat) - set(ref_flat))[:5],
    )
    for k in ref_flat:
        assert conv_flat[k].shape == ref_flat[k].shape, (
            k, conv_flat[k].shape, ref_flat[k].shape)
        # values must round-trip exactly
        assert np.allclose(conv_flat[k], np.asarray(ref_flat[k])), k
    # every synthetic torch key consumed
    assert used == set(sd), sorted(set(sd) - used)[:5]
