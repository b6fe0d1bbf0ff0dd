"""Shared neural building blocks (flax.linen, NHWC, fp32 params / bf16-able
compute).

Capability-parity notes (structure only; all code TPU-first, channels-last):
- GroupNorm/SiLU/conv stacks match the SD UNet & VAE conventions
  (/root/reference/ldm/modules/diffusionmodules/openaimodel.py,
  /root/reference/ldm/modules/diffusionmodules/model.py).
- ``zero_init`` convs reproduce the zero-initialised output projections that
  make residual branches identity at init.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class GroupNorm(nn.Module):
    """Bandwidth-lean GroupNorm for low-precision inference.

    flax's nn.GroupNorm upcasts x to fp32 and feeds it to two reduction
    consumers (mean and square), which makes XLA *materialize* the fp32
    tensor next to every conv output (profiled on v5e: the VAE decoder spent
    more time on these convert/copy chains than on its convolutions). Here
    the input stays in the compute dtype end-to-end: reductions accumulate
    in fp32 via the ``dtype=`` reduce argument (no fp32 materialization) and
    use the one-pass E[x^2]-E[x]^2 form. Param names/shapes and the auto
    scope name ("GroupNorm_N") match flax exactly, so checkpoints are
    interchangeable."""

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        import numpy as _np

        g = self.num_groups
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        dt = self.dtype
        x = x.astype(dt)
        n = x.shape[0]
        spatial = tuple(range(1, x.ndim - 1))
        count = float(_np.prod(x.shape[1:-1]) * (c // g))
        # NOTE: a fully-fused one-pass Pallas GN exists
        # (ops/pallas/groupnorm.fused_group_norm_vjp) but is NOT dispatched
        # here: at 64^2 extracting GN from XLA's conv+norm fusion graph made
        # the surrounding fusions slower overall (53.4 -> 54.9 ms/step
        # measured on v5e) even though the GN ops themselves got 10x
        # cheaper. XLA's fused chains win at small spatial sizes.
        # Channel-wise sums first (clean reduction, no relayout of x); the
        # group fold happens on the tiny [N, C] results only. On TPU a
        # one-pass Pallas kernel computes both sums without the fp32 copy
        # of x that XLA otherwise materializes for dual f32 reductions.
        # Only for large spatial extents: at >=128^2 the avoided fp32
        # materialization dominates; at 64^2 XLA's own fusion is better
        # (measured on v5e: decode 357->316 ms, denoise 53.6->56.7 ms).
        big = x.ndim == 4 and x.shape[1] * x.shape[2] >= 16384
        if big and jax.default_backend() == "tpu":
            from mgldvsr_tpu.ops.pallas.groupnorm import channel_sums

            s1, s2 = channel_sums(x)
        else:
            s1 = jnp.sum(x, axis=spatial, dtype=jnp.float32)      # [N, C]
            s2 = jnp.sum(x * x, axis=spatial, dtype=jnp.float32)  # [N, C]
        gs1 = s1.reshape(n, g, c // g).sum(-1, keepdims=True)
        gs2 = s2.reshape(n, g, c // g).sum(-1, keepdims=True)
        mean = gs1 / count
        var = jnp.maximum(gs2 / count - mean * mean, 0.0)
        inv = jax.lax.rsqrt(var + self.epsilon)
        # fold scale/shift: y = x*A + B, with A/B per (sample, channel)
        a = jnp.broadcast_to(inv, (n, g, c // g)).reshape(n, c) * scale
        b = bias - jnp.broadcast_to(mean * inv, (n, g, c // g)
                                    ).reshape(n, c) * scale
        shape = (n,) + (1,) * (x.ndim - 2) + (c,)
        return x * a.astype(dt).reshape(shape) + b.astype(dt).reshape(shape)


def group_norm(num_groups: int = 32, eps: float = 1e-5,
               dtype: Dtype = jnp.float32, name: Optional[str] = None):
    # fp32 compute: flax's exact two-pass GroupNorm (bit-stable goldens).
    # Low precision: the bandwidth-lean fast-variance version above — stats
    # still accumulate fp32, but nothing fp32 ever hits HBM.
    # MGLD_GN_FP32=1 forces the fp32 path everywhere: the quality A/B knob
    # for when real checkpoints arrive (ADVICE round-1: validate the bf16
    # GN numerics against LPIPS/E*warp before trusting the fast default).
    import os

    if os.environ.get("MGLD_GN_FP32") == "1":
        dtype = jnp.float32
    if dtype == jnp.float32:
        return nn.GroupNorm(num_groups=num_groups, epsilon=eps, dtype=dtype,
                            param_dtype=jnp.float32, name=name)
    return GroupNorm(num_groups=num_groups, epsilon=eps, dtype=dtype,
                     name=name)


class _GNParams(nn.Module):
    """GroupNorm affine params only (scale/bias), for the fused path. Pass
    ``name="GroupNorm_N"`` so the tree matches the unfused layout."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return scale, bias


def fused_gn_conv_enabled() -> bool:
    """MGLD_FUSED_GN_CONV: '1' force on, 'auto' on-TPU-only, else off."""
    import os

    flag = os.environ.get("MGLD_FUSED_GN_CONV", "0").lower()
    if flag in ("1", "true", "on"):
        return True
    if flag == "auto":
        return jax.default_backend() == "tpu"
    return False


def norm_silu_conv3x3(x, out_channels: int, dtype: Dtype, conv_name: str,
                      gn_name: str, *, zero_init: bool = False,
                      groups: int = 32, eps: float = 1e-5):
    """GN -> SiLU -> conv3x3 — as ONE Pallas megakernel when enabled
    (ops/pallas/gn_silu_conv.py), else the plain composition. Must be called
    inside a parent ``@nn.compact``; the param tree is identical either way
    (``{gn_name}/{scale,bias}`` + ``{conv_name}/{kernel,bias}``)."""
    c_in = x.shape[-1]
    if fused_gn_conv_enabled() and x.ndim == 4:
        from mgldvsr_tpu.ops.pallas.gn_silu_conv import gn_silu_conv3x3

        gscale, gbias = _GNParams(c_in, name=gn_name)()
        kernel, bias = _ConvParams(c_in, out_channels, zero_init=zero_init,
                                   name=conv_name)()
        return gn_silu_conv3x3(x.astype(dtype), gscale, gbias,
                               kernel.astype(dtype), bias,
                               groups=groups, eps=eps)
    h = group_norm(groups, eps, dtype, name=gn_name)(x)
    h = nn.silu(h)
    return conv3x3(out_channels, dtype, zero_init=zero_init,
                   name=conv_name)(h)


def int8_conv_enabled() -> bool:
    """MGLD_INT8_CONV=1: dynamic-quantized int8 3x3 convs (experiment;
    quality-gated until real weights exist to validate on LPIPS/E*warp)."""
    import os

    return os.environ.get("MGLD_INT8_CONV") == "1"


class Int8Conv3x3(nn.Module):
    """Drop-in conv3x3 with int8 MXU compute: per-tensor dynamic activation
    scale + per-output-channel weight scale, int8xint8->int32 accumulate,
    fp dequant + bias. Param tree identical to nn.Conv (kernel fp32), so
    converted checkpoints load unchanged. v5e int8 peak is 2x bf16; the
    extra costs are one max-reduction over x and the quantize round."""

    features: int
    zero_init: bool = False
    strides: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        init = (nn.initializers.zeros if self.zero_init
                else nn.initializers.lecun_normal())
        k = self.param("kernel", init, (3, 3, cin, self.features),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        sx = jnp.maximum(jnp.max(jnp.abs(x)).astype(jnp.float32),
                         1e-6) / 127.0
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                      -127, 127).astype(jnp.int8)
        sw = jnp.maximum(jnp.max(jnp.abs(k), axis=(0, 1, 2)),
                         1e-12) / 127.0
        kq = jnp.clip(jnp.round(k / sw), -127, 127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xq, kq, (self.strides, self.strides), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (sx * sw) + b
        return y.astype(self.dtype)


# A custom Pallas shifted-matmul 3x3 conv (MGLD_PALLAS_CONV) lived here
# through rounds 3-4. Retired after an honest hardware verdict (r04 queue,
# /tmp/bench_r04/pconv_micro3.log): the kernel finally COMPILED on v5e (the
# pre-shifted [3, N*(H+2), W, C] layout sidestepped Mosaic's tiled-dim
# slice alignment), but measured 0.65-0.82x vs XLA's conv on every decoder
# hot shape (XLA 44-91 TF/s vs Pallas 29-66 TF/s) and RESOURCE_EXHAUSTED at
# the 4-window batch shape — materializing the 3 row-shifted copies costs
# 3x input HBM traffic, which is exactly the bandwidth the kernel was
# supposed to save. XLA's fused conv remains the fastest available path;
# see NOTES.md "Retired experiments".
Conv = nn.Conv


def conv3x3(features: int, dtype: Dtype = jnp.float32, zero_init: bool = False,
            name: str | None = None, strides: int = 1):
    if int8_conv_enabled():
        return Int8Conv3x3(features, zero_init, strides, dtype, name=name)
    init = nn.initializers.zeros if zero_init else nn.initializers.lecun_normal()
    return Conv(features, (3, 3), strides=(strides, strides), padding=1,
                kernel_init=init, dtype=dtype, param_dtype=jnp.float32, name=name)


def conv1x1(features: int, dtype: Dtype = jnp.float32, zero_init: bool = False,
            name: str | None = None):
    init = nn.initializers.zeros if zero_init else nn.initializers.lecun_normal()
    return nn.Conv(features, (1, 1), kernel_init=init, dtype=dtype,
                   param_dtype=jnp.float32, name=name)


class _ConvParams(nn.Module):
    """3x3 conv weights with nn.Conv-compatible param names/shapes."""

    in_channels: int
    features: int
    zero_init: bool = False

    @nn.compact
    def __call__(self):
        init = (nn.initializers.zeros if self.zero_init
                else nn.initializers.lecun_normal())
        kernel = self.param("kernel", init,
                            (3, 3, self.in_channels, self.features),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return kernel, bias


# tap groups for the phase decomposition: fine row 2i+a with 3x3 kernel row
# ky reads coarse row i + floor((a-1+ky)/2) — a=0 folds ky {1,2} onto tap i,
# a=1 folds ky {0,1}.
_PHASE_GROUPS = ([[0], [1, 2]], [[0, 1], [2]])


class Upsample(nn.Module):
    """2x nearest upsample, optionally followed by a 3x3 conv.

    TPU: nearest-up + conv3x3 is algebraically a 2x2 conv per output phase
    on the COARSE grid (kernel taps that land on the same coarse pixel
    fold together), computed here as four 2x2 convs + pixel interleave —
    2.25x fewer MXU FLOPs and no upsampled intermediate in HBM. Exact
    (incl. zero-padding borders); params identical to the repeat+conv
    form."""

    channels: int
    use_conv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        if not self.use_conv:
            return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        kernel, bias = _ConvParams(c, self.channels, name="conv")()
        bias = bias.astype(self.dtype)
        x = x.astype(self.dtype)
        dn = ("NHWC", "HWIO", "NHWC")
        phases = []
        for a in (0, 1):
            ga = _PHASE_GROUPS[a]
            for b in (0, 1):
                gb = _PHASE_GROUPS[b]
                # fold taps in fp32, cast the folded 2x2 kernel after: the
                # repeat+conv form accumulates all 9 taps in fp32 on the MXU,
                # so summing in bf16 here would round more than necessary
                k2 = jnp.stack([
                    jnp.stack([
                        sum(kernel[ky, kx] for ky in ga[p] for kx in gb[q])
                        for q in (0, 1)], axis=0)
                    for p in (0, 1)], axis=0).astype(self.dtype)  # [2,2,C,Co]
                pad = ((1 - a, a), (1 - b, b))
                y = jax.lax.conv_general_dilated(
                    x, k2, window_strides=(1, 1), padding=pad,
                    dimension_numbers=dn) + bias
                phases.append(y)
        ph = jnp.stack(phases, axis=-2)  # [N, H, W, 4, Cout]
        ph = ph.reshape(n, h, w, 2, 2, self.channels)
        out = ph.transpose(0, 1, 3, 2, 4, 5)  # [N, H, 2, W, 2, C]
        return out.reshape(n, 2 * h, 2 * w, self.channels)


class Downsample(nn.Module):
    """2x downsample: stride-2 conv (symmetric padding, UNet flavor) or

    average pooling when ``use_conv=False``."""

    channels: int
    use_conv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.use_conv:
            return conv3x3(self.channels, self.dtype, name="op", strides=2)(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class VAEDownsample(nn.Module):
    """SD-VAE downsample: stride-2 conv with asymmetric (0,1) padding."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(self.channels, (3, 3), strides=(2, 2), padding="VALID",
                       dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)


class TimestepEmbedMLP(nn.Module):
    """linear -> SiLU -> linear over sinusoidal timestep features."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t_feat):
        h = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(t_feat)
        h = nn.silu(h)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(h)


class UNetResBlock(nn.Module):
    """OpenAI-UNet residual block with additive timestep conditioning.

    Structure parity: ResBlock at
    /root/reference/ldm/modules/diffusionmodules/openaimodel.py:233-360.
    """

    out_channels: int
    emb_channels: int
    dropout: float = 0.0
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, deterministic: bool = True):
        c_in = x.shape[-1]
        if not (self.up or self.down):
            h = norm_silu_conv3x3(x, self.out_channels, self.dtype,
                                  "conv1", "GroupNorm_0")
        else:
            h = group_norm(dtype=self.dtype, name="GroupNorm_0")(x)
            h = nn.silu(h)
            if self.up:
                h = _nearest2x(h)
                x = _nearest2x(x)
            else:
                h = nn.avg_pool(h, (2, 2), strides=(2, 2))
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            h = conv3x3(self.out_channels, self.dtype, name="conv1")(h)

        emb_out = nn.Dense(
            2 * self.out_channels if self.use_scale_shift_norm else self.out_channels,
            dtype=self.dtype, param_dtype=jnp.float32, name="emb_proj",
        )(nn.silu(emb))
        emb_out = emb_out[:, None, None, :]

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = group_norm(dtype=self.dtype, name="GroupNorm_1")(h) \
                * (1 + scale) + shift
            h = nn.silu(h)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            h = conv3x3(self.out_channels, self.dtype, zero_init=True,
                        name="conv2")(h)
        else:
            h = h + emb_out
            if self.dropout and not deterministic:
                h = group_norm(dtype=self.dtype, name="GroupNorm_1")(h)
                h = nn.silu(h)
                h = nn.Dropout(self.dropout)(h, deterministic=False)
                h = conv3x3(self.out_channels, self.dtype, zero_init=True,
                            name="conv2")(h)
            else:
                h = norm_silu_conv3x3(h, self.out_channels, self.dtype,
                                      "conv2", "GroupNorm_1", zero_init=True)

        if c_in != self.out_channels:
            x = conv1x1(self.out_channels, self.dtype, name="skip")(x)
        return x + h


def _nearest2x(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class VAEResnetBlock(nn.Module):
    """SD-VAE residual block (GroupNorm eps=1e-6, swish, 3x3 convs).

    Structure parity: ResnetBlock at
    /root/reference/ldm/modules/diffusionmodules/model.py.
    """

    out_channels: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        c_in = x.shape[-1]
        h = norm_silu_conv3x3(x, self.out_channels, self.dtype,
                              "conv1", "GroupNorm_0", eps=1e-6)
        if self.dropout and not deterministic:
            h = group_norm(eps=1e-6, dtype=self.dtype, name="GroupNorm_1")(h)
            h = nn.silu(h)
            h = nn.Dropout(self.dropout)(h, deterministic=False)
            h = conv3x3(self.out_channels, self.dtype, name="conv2")(h)
        else:
            h = norm_silu_conv3x3(h, self.out_channels, self.dtype,
                                  "conv2", "GroupNorm_1", eps=1e-6)
        if c_in != self.out_channels:
            x = conv1x1(self.out_channels, self.dtype, name="nin_shortcut")(x)
        return x + h


class VAEAttnBlock(nn.Module):
    """Single-head full self-attention over spatial positions (VAE mid)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from mgldvsr_tpu.ops.attention import attend

        n, h, w, c = x.shape
        y = group_norm(eps=1e-6, dtype=self.dtype)(x)
        q = conv1x1(c, self.dtype, name="q")(y).reshape(n, h * w, c)
        k = conv1x1(c, self.dtype, name="k")(y).reshape(n, h * w, c)
        v = conv1x1(c, self.dtype, name="v")(y).reshape(n, h * w, c)
        attn = attend(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :]
        ).reshape(n, h, w, c)
        out = conv1x1(c, self.dtype, name="proj_out")(attn)
        return x + out
