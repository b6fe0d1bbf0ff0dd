"""mmcv.ops shim: a naive, correct Correlation (CUDA-free).

Semantics match mmcv's Correlation for the configuration the reference
uses (`basicsr/archs/maskflownet_arch.py:133`: kernel_size=1,
max_displacement=md, stride=1, padding=0): raw channel-sum dot products
over a (2*md+1)^2 displacement patch, zero padding outside, output
[N, ph, pw, H, W]. Doubles as the local-correlation oracle.
"""
import torch
import torch.nn.functional as F
from torch import nn


class Correlation(nn.Module):
    def __init__(self, kernel_size=1, max_displacement=0, stride=1,
                 padding=0, dilation=1, dilation_patch=1):
        super().__init__()
        if kernel_size != 1 or stride != 1 or padding != 0 or dilation != 1:
            raise NotImplementedError(
                "Correlation shim supports kernel_size=1, stride=1, "
                "padding=0, dilation=1 (the reference's configuration)")
        self.md = max_displacement
        self.dp = dilation_patch

    def forward(self, f1, f2):
        b, c, h, w = f1.shape
        md, dp = self.md, self.dp
        p = md * dp
        f2p = F.pad(f2, (p, p, p, p))
        n = 2 * md + 1
        out = f1.new_zeros(b, n, n, h, w)
        for i in range(n):
            for j in range(n):
                out[:, i, j] = (
                    f1 * f2p[:, :, i * dp:i * dp + h, j * dp:j * dp + w]
                ).sum(1)
        return out
