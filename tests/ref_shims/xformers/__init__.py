"""xformers shim: exact (non-memory-efficient) attention in plain torch.

The reference calls ``xformers.ops.memory_efficient_attention``
unconditionally in its temporal attention and (when available) its
cross/self attention blocks. Mathematically it is standard softmax
attention; this shim computes it exactly so the real reference modules
can run as numerical oracles.
"""
from . import ops  # noqa: F401

__version__ = "0.0.0-shim"
