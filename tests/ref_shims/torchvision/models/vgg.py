"""torchvision.models.vgg shim.

Builds the standard VGG ``features`` stacks (torchvision's public layer
configs A/B/D/E) with RANDOM weights — `pretrained=True` is accepted and
ignored because this environment has no weight downloads. Oracle tests
compare randomly-initialized towers through weight converters, so only the
architecture (which is a published constant) matters.
"""
import torch.nn as nn

_CFGS = {
    "vgg11": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512,
              "M"],
    "vgg13": [64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M",
              512, 512, "M"],
    "vgg16": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512,
              512, "M", 512, 512, 512, "M"],
    "vgg19": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512,
              512, 512, 512, "M", 512, 512, 512, 512, "M"],
}


class VGG(nn.Module):
    def __init__(self, features):
        super().__init__()
        self.features = features


def _make_features(cfg, batch_norm=False):
    layers = []
    in_ch = 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(kernel_size=2, stride=2))
        else:
            layers.append(nn.Conv2d(in_ch, v, kernel_size=3, padding=1))
            if batch_norm:
                layers.append(nn.BatchNorm2d(v))
            layers.append(nn.ReLU(inplace=True))
            in_ch = v
    return nn.Sequential(*layers)


def _ctor(name, batch_norm=False):
    cfg = _CFGS[name]

    def fn(pretrained=False, **kwargs):
        return VGG(_make_features(cfg, batch_norm))

    fn.__name__ = name + ("_bn" if batch_norm else "")
    return fn


for _n in ("vgg11", "vgg13", "vgg16", "vgg19"):
    globals()[_n] = _ctor(_n)
    globals()[_n + "_bn"] = _ctor(_n, batch_norm=True)
