"""torchvision.transforms.functional shim (import-time symbols)."""
import torch


def normalize(tensor, mean, std, inplace=False):
    if not inplace:
        tensor = tensor.clone()
    mean = torch.as_tensor(mean, dtype=tensor.dtype, device=tensor.device)
    std = torch.as_tensor(std, dtype=tensor.dtype, device=tensor.device)
    # channel-first (…,C,H,W): broadcast over the two trailing spatial dims
    tensor.sub_(mean.view(-1, 1, 1)).div_(std.view(-1, 1, 1))
    return tensor


def _unavailable(name):
    def fn(*args, **kwargs):
        raise RuntimeError(f"torchvision shim: {name} is not implemented")

    fn.__name__ = name
    return fn


adjust_brightness = _unavailable("adjust_brightness")
adjust_contrast = _unavailable("adjust_contrast")
adjust_hue = _unavailable("adjust_hue")
adjust_saturation = _unavailable("adjust_saturation")
