"""torchvision.utils shim: a functional make_grid (grid-of-images)."""
import math

import torch


def make_grid(tensor, nrow=8, padding=2, normalize=False, value_range=None,
              scale_each=False, pad_value=0.0, **kwargs):
    if isinstance(tensor, (list, tuple)):
        tensor = torch.stack(tensor, dim=0)
    if tensor.dim() == 2:
        tensor = tensor.unsqueeze(0)
    if tensor.dim() == 3:
        tensor = tensor.unsqueeze(0)
    if normalize:
        tensor = tensor.clone()

        def norm_(t, low, high):
            t.clamp_(min=low, max=high).sub_(low).div_(max(high - low, 1e-5))

        if scale_each:
            for t in tensor:
                lo, hi = (value_range if value_range
                          else (float(t.min()), float(t.max())))
                norm_(t, lo, hi)
        else:
            lo, hi = (value_range if value_range
                      else (float(tensor.min()), float(tensor.max())))
            norm_(tensor, lo, hi)
    n, c, h, w = tensor.shape
    ncol = min(nrow, n)
    nr = int(math.ceil(n / ncol))
    grid = tensor.new_full(
        (c, h * nr + padding * (nr + 1), w * ncol + padding * (ncol + 1)),
        pad_value,
    )
    for idx in range(n):
        r, col = divmod(idx, ncol)
        y = padding + r * (h + padding)
        x = padding + col * (w + padding)
        grid[:, y:y + h, x:x + w] = tensor[idx]
    return grid
