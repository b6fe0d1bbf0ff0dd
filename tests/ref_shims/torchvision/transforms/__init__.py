"""torchvision.transforms shim: import-time symbols for the reference's
data modules (none of which are exercised by the oracle tests)."""
from . import functional, functional_tensor  # noqa: F401


class ColorJitter:
    def __init__(self, brightness=0, contrast=0, saturation=0, hue=0):
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue

    def __call__(self, img):
        raise RuntimeError("torchvision shim: ColorJitter is not implemented")


class ToTensor:
    """Minimal functional equivalent (PIL/ndarray HWC [0,255] -> CHW [0,1])."""

    def __call__(self, pic):
        import numpy as np
        import torch

        arr = np.asarray(pic, dtype=np.float32) / 255.0
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return torch.from_numpy(arr.transpose(2, 0, 1).copy())


class ToPILImage:
    def __call__(self, tensor):
        import numpy as np
        from PIL import Image

        arr = tensor.detach().cpu().numpy().transpose(1, 2, 0)
        return Image.fromarray((arr * 255.0).round().clip(0, 255).astype("uint8"))
