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
