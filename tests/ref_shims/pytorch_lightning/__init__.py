"""pytorch_lightning shim: just enough surface for the reference's
LightningModule subclasses to be *instantiated* (training loops are never
driven — the oracle tests only call individual methods)."""
import torch.nn as nn

from . import utilities  # noqa: F401


class LightningModule(nn.Module):
    trainer = None
    global_rank = 0
    current_epoch = 0
    global_step = 0

    def save_hyperparameters(self, *args, **kwargs):
        pass

    def log(self, *args, **kwargs):
        pass

    def log_dict(self, *args, **kwargs):
        pass

    @property
    def device(self):
        for p in self.parameters():
            return p.device
        import torch
        return torch.device("cpu")


class Callback:
    pass


def seed_everything(seed=None, workers=False):
    import random

    import numpy as np
    import torch

    if seed is not None:
        random.seed(seed)
        np.random.seed(seed)
        torch.manual_seed(seed)
    return seed


__version__ = "0.0.0-shim"
