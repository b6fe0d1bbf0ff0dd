"""FID InceptionV3 (pool3 feature tower), TPU-native.

Capability parity with the reference's FID feature extractor
(/root/reference/basicsr/archs/inception.py — the pytorch-fid port of
TensorFlow's inception-2015-12-05 network): torchvision Inception-v3
topology with num_classes=1008, the FID patches applied —
count_include_pad=False average pools in the A/C/E branch pools and a MAX
pool in the final (Mixed_7c) E block — returning the 2048-dim final
average-pool features used by FID.

TPU-first: channels-last NHWC, frozen inference BatchNorm folded to one
multiply-add, all convs MXU-shaped, one jittable forward. Weights come from
``mgldvsr_tpu.io.ckpt_convert.convert_inception`` applied to the
pt_inception-2015-12-05 checkpoint.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from mgldvsr_tpu.ops.resize import resize2d

Dtype = Any


class _FrozenBN(nn.Module):
    """Inference BN: y = (x - mean) * scale / sqrt(var + eps) + bias."""

    features: int
    eps: float = 1e-3

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return x * inv + (bias - mean * inv)


class BasicConv(nn.Module):
    """Conv (no bias) + frozen BN(eps=1e-3) + relu (BasicConv2d)."""

    features: int
    kernel: Tuple[int, int] = (1, 1)
    stride: int = 1
    padding: Union[int, Tuple[int, int]] = 0

    @nn.compact
    def __call__(self, x):
        p = (self.padding if isinstance(self.padding, tuple)
             else (self.padding, self.padding))
        x = nn.Conv(self.features, self.kernel,
                    strides=(self.stride, self.stride),
                    padding=(p[0], p[1]), use_bias=False,
                    param_dtype=jnp.float32, name="conv")(x)
        x = _FrozenBN(self.features, name="bn")(x)
        return nn.relu(x)


def _avg3_nopad_count(x):
    """3x3 stride-1 avg pool, zero-pad 1, count_include_pad=False (the
    TensorFlow-style pool the FID patches introduce)."""
    return nn.avg_pool(x, (3, 3), strides=(1, 1),
                       padding=((1, 1), (1, 1)), count_include_pad=False)


def _max3s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2))


class FIDInceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(64, name="branch1x1")(x)
        b5 = BasicConv(48, name="branch5x5_1")(x)
        b5 = BasicConv(64, (5, 5), padding=2, name="branch5x5_2")(b5)
        bd = BasicConv(64, name="branch3x3dbl_1")(x)
        bd = BasicConv(96, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = BasicConv(96, (3, 3), padding=1, name="branch3x3dbl_3")(bd)
        bp = BasicConv(self.pool_features, name="branch_pool")(
            _avg3_nopad_count(x))
        return jnp.concatenate([b1, b5, bd, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv(64, name="branch3x3dbl_1")(x)
        bd = BasicConv(96, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = BasicConv(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _max3s2(x)], axis=-1)


class FIDInceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv(192, name="branch1x1")(x)
        b7 = BasicConv(c7, name="branch7x7_1")(x)
        b7 = BasicConv(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv(c7, name="branch7x7dbl_1")(x)
        bd = BasicConv(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = BasicConv(192, name="branch_pool")(_avg3_nopad_count(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(192, name="branch3x3_1")(x)
        b3 = BasicConv(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv(192, name="branch7x7x3_1")(x)
        b7 = BasicConv(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _max3s2(x)], axis=-1)


class FIDInceptionE(nn.Module):
    """InceptionE with the FID branch-pool patch. ``use_max_pool`` selects
    the Mixed_7c variant (FIDInceptionE_2: max instead of average pool)."""

    use_max_pool: bool = False

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(320, name="branch1x1")(x)
        b3 = BasicConv(384, name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3),
            BasicConv(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv(448, name="branch3x3dbl_1")(x)
        bd = BasicConv(384, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd),
            BasicConv(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        if self.use_max_pool:  # FIDInceptionE_2 (inception.py:283-305)
            bp = nn.max_pool(x, (3, 3), strides=(1, 1),
                             padding=((1, 1), (1, 1)))
        else:  # FIDInceptionE_1: TF-style average pool
            bp = _avg3_nopad_count(x)
        bp = BasicConv(192, name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3FID(nn.Module):
    """Pool3 (2048-dim) FID feature tower.

    Input: [N, H, W, 3]. ``resize_input`` bilinearly resizes to 299x299
    (align_corners=False, matching F.interpolate); ``normalize_input``
    rescales [0,1] -> [-1,1]. Matches
    basicsr.metrics.fid.load_patched_inception_v3 defaults with
    resize_input=True, normalize_input=False.
    """

    resize_input: bool = True
    normalize_input: bool = False

    @nn.compact
    def __call__(self, x):
        if self.resize_input:
            x = resize2d(x, (299, 299), method="bilinear")
        if self.normalize_input:
            x = 2.0 * x - 1.0
        x = BasicConv(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x)
        x = _max3s2(x)
        x = BasicConv(80, name="Conv2d_3b_1x1")(x)
        x = BasicConv(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max3s2(x)
        x = FIDInceptionA(32, name="Mixed_5b")(x)
        x = FIDInceptionA(64, name="Mixed_5c")(x)
        x = FIDInceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = FIDInceptionC(128, name="Mixed_6b")(x)
        x = FIDInceptionC(160, name="Mixed_6c")(x)
        x = FIDInceptionC(160, name="Mixed_6d")(x)
        x = FIDInceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = FIDInceptionE(name="Mixed_7b")(x)
        x = FIDInceptionE(use_max_pool=True, name="Mixed_7c")(x)
        # final adaptive average pool -> [N, 2048]
        return jnp.mean(x, axis=(1, 2))
