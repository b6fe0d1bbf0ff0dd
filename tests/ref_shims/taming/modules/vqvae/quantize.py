from torch import nn


class VectorQuantizer2(nn.Module):
    """Unused by the KL autoencoder paths the oracle tests exercise."""

    def __init__(self, *args, **kwargs):
        super().__init__()

    def forward(self, *args, **kwargs):
        raise RuntimeError("taming shim: VectorQuantizer2 is not implemented")
