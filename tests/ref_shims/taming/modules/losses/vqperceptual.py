"""taming.modules.losses.vqperceptual shim.

Provides the star-imported symbols the reference's contperceptual.py uses:
NLayerDiscriminator / weights_init (the public pix2pix PatchGAN structure),
hinge_d_loss / vanilla_d_loss / adopt_weight, and an LPIPS whose weights are
unavailable in this environment (forward raises; oracle tests run with
perceptual_weight=0 — our own LPIPS tower is converter-oracle-tested
separately).
"""
import torch
import torch.nn.functional as F
from torch import nn

from taming.modules.discriminator.model import (  # noqa: F401
    NLayerDiscriminator,
    weights_init,
)


class LPIPS(nn.Module):
    def eval(self):
        return self

    def forward(self, x, y):
        raise RuntimeError(
            "taming shim: LPIPS weights are not available in this "
            "environment — construct losses with perceptual_weight=0")


def hinge_d_loss(logits_real, logits_fake):
    loss_real = torch.mean(F.relu(1.0 - logits_real))
    loss_fake = torch.mean(F.relu(1.0 + logits_fake))
    return 0.5 * (loss_real + loss_fake)


def vanilla_d_loss(logits_real, logits_fake):
    return 0.5 * (torch.mean(F.softplus(-logits_real))
                  + torch.mean(F.softplus(logits_fake)))


def adopt_weight(weight, global_step, threshold=0, value=0.0):
    if global_step < threshold:
        weight = value
    return weight
