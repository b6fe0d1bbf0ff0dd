"""kornia shim: filters.sobel only.

CAVEAT: this re-implements kornia's documented sobel semantics (normalized
3x3 kernels summing |k|=8, replicate padding, magnitude sqrt(gx^2+gy^2+eps))
rather than wrapping the real library, so the sobel term of any oracle test
validates consistency with this interpretation, not with kornia's binaries.
"""
import torch
import torch.nn.functional as F


class filters:  # noqa: N801 - mimic kornia.filters namespace
    @staticmethod
    def sobel(x, normalized=True, eps=1e-6):
        kx = torch.tensor([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0],
                           [-1.0, 0.0, 1.0]], dtype=x.dtype, device=x.device)
        if normalized:
            kx = kx / 8.0
        ky = kx.t()
        c = x.shape[1]
        w = torch.stack([kx, ky]).unsqueeze(1)  # [2,1,3,3]
        w = w.repeat(c, 1, 1, 1)                # [2c,1,3,3]
        xp = F.pad(x, (1, 1, 1, 1), mode="replicate")
        g = F.conv2d(xp, w, groups=c)           # [n, 2c, h, w]
        g = g.view(x.shape[0], c, 2, x.shape[2], x.shape[3])
        return torch.sqrt(g[:, :, 0] ** 2 + g[:, :, 1] ** 2 + eps)
