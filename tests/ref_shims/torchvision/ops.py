"""torchvision.ops shim: a correct (naive, vectorized) deform_conv2d.

Used both at import time by the reference archs
(`basicsr/archs/maskflownet_arch.py:9`, `arch_util.py:315`) and as a
numerical oracle for modulated deformable convolution (DCNv2).
Semantics follow torchvision's documented deform_conv2d: offset layout
[B, 2*offset_groups*kh*kw, Hout, Wout] as (dy, dx) pairs per kernel tap,
bilinear sampling with zero padding outside the input.
"""
import torch
from torch import nn


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def deform_conv2d(input, offset, weight, bias=None, stride=(1, 1),
                  padding=(0, 0), dilation=(1, 1), mask=None):
    B, Cin, H, W = input.shape
    Cout, Cin_g, kh, kw = weight.shape
    groups = Cin // Cin_g
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    Hout = (H + 2 * ph - (dh * (kh - 1) + 1)) // sh + 1
    Wout = (W + 2 * pw - (dw * (kw - 1) + 1)) // sw + 1
    K = kh * kw
    n_og = offset.shape[1] // (2 * K)

    offset = offset.reshape(B, n_og, K, 2, Hout, Wout)
    if mask is not None:
        mask = mask.reshape(B, n_og, K, Hout, Wout)

    dev, dt = input.device, input.dtype
    ys = torch.arange(Hout, device=dev, dtype=dt) * sh - ph
    xs = torch.arange(Wout, device=dev, dtype=dt) * sw - pw
    kyy = torch.arange(kh, device=dev, dtype=dt) * dh
    kxx = torch.arange(kw, device=dev, dtype=dt) * dw
    # base tap positions: [K, Hout, Wout]
    base_y = (ys.view(1, Hout, 1) + kyy.view(kh, 1, 1).repeat_interleave(kw, 0)
              .view(K, 1, 1))
    base_x = (xs.view(1, 1, Wout) + kxx.repeat(kh).view(K, 1, 1))
    # sampled positions: [B, n_og, K, Hout, Wout]
    py = base_y.unsqueeze(0).unsqueeze(0) + offset[:, :, :, 0]
    px = base_x.unsqueeze(0).unsqueeze(0) + offset[:, :, :, 1]

    y0 = torch.floor(py)
    x0 = torch.floor(px)
    wy = py - y0
    wx = px - x0

    cpg = Cin // n_og  # channels per offset group

    def gather(yi, xi):
        """Zero-padded gather: [B, n_og, K, Hout, Wout] -> [B, Cin, K, Hout, Wout]."""
        valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = yi.clamp(0, H - 1).long()
        xc = xi.clamp(0, W - 1).long()
        flat = (yc * W + xc).reshape(B, n_og, 1, K * Hout * Wout)
        flat = flat.expand(B, n_og, cpg, K * Hout * Wout)
        src = input.reshape(B, n_og, cpg, H * W)
        out = torch.gather(src, 3, flat).reshape(B, n_og, cpg, K, Hout, Wout)
        out = out * valid.unsqueeze(2)
        return out.reshape(B, Cin, K, Hout, Wout)

    v = (gather(y0, x0) * ((1 - wy) * (1 - wx)).repeat_interleave(cpg, 1)
         + gather(y0, x0 + 1) * ((1 - wy) * wx).repeat_interleave(cpg, 1)
         + gather(y0 + 1, x0) * (wy * (1 - wx)).repeat_interleave(cpg, 1)
         + gather(y0 + 1, x0 + 1) * (wy * wx).repeat_interleave(cpg, 1))
    if mask is not None:
        v = v * mask.repeat_interleave(cpg, 1)

    # grouped contraction with the conv weight
    v = v.reshape(B, groups, Cin_g, K, Hout, Wout)
    wmat = weight.reshape(groups, Cout // groups, Cin_g, K)
    out = torch.einsum("bgckhw,gock->bgohw", v, wmat)
    out = out.reshape(B, Cout, Hout, Wout)
    if bias is not None:
        out = out + bias.view(1, Cout, 1, 1)
    return out


class DeformConv2d(nn.Module):
    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, bias=True):
        super().__init__()
        kh, kw = _pair(kernel_size)
        self.stride = _pair(stride)
        self.padding = _pair(padding)
        self.dilation = _pair(dilation)
        self.weight = nn.Parameter(
            torch.randn(out_channels, in_channels // groups, kh, kw) * 0.05)
        self.bias = nn.Parameter(torch.zeros(out_channels)) if bias else None

    def forward(self, x, offset, mask=None):
        return deform_conv2d(x, offset, self.weight, self.bias, self.stride,
                             self.padding, self.dilation, mask=mask)
