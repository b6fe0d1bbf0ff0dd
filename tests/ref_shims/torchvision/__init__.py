"""Minimal torchvision stand-in so the REAL reference modules import.

The reference (`/root/reference`) only reaches torchvision through
`basicsr/utils/img_util.py:6` (`from torchvision.utils import make_grid`)
on the import chains the oracle tests exercise; nothing in the tested
forward paths calls it. Providing the symbol lets us import the actual
reference classes and use them as numerical oracles.
"""
from . import utils  # noqa: F401

__version__ = "0.0.0-shim"
