"""torchvision.models.vgg shim: import-time symbols only.

The reference's `basicsr/archs/vgg_arch.py` imports this module at package
scan time but only calls the constructors inside `VGGFeatureExtractor`,
which no oracle test instantiates.
"""


def _unavailable(name):
    def ctor(*args, **kwargs):
        raise RuntimeError(
            f"torchvision shim: {name} weights are not available in this "
            "environment"
        )

    ctor.__name__ = name
    return ctor


for _n in ("vgg11", "vgg13", "vgg16", "vgg19",
           "vgg11_bn", "vgg13_bn", "vgg16_bn", "vgg19_bn"):
    globals()[_n] = _unavailable(_n)
