"""Minimal mmcv stand-in for importing the real reference modules."""
from . import ops  # noqa: F401

__version__ = "0.0.0-shim"
