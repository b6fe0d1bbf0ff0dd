"""Training-pair shuffling queue.

Capability parity with ``_dequeue_and_enqueue``
(/root/reference/ldm/models/diffusion/ddpm.py:1860-1899): a fixed-size pool
of (lq, gt) pairs that newly synthesized batches are pushed into and
shuffled samples are drawn from, decorrelating the per-batch degradation
parameters from the samples the optimizer sees.

Host-side numpy (the queue is an input-pipeline feature, not device state).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


class TrainingPairQueue:
    def __init__(self, queue_size: int = 180, seed: int = 0):
        self.queue_size = queue_size
        self._rng = np.random.RandomState(seed)
        self._lq: Optional[np.ndarray] = None
        self._gt: Optional[np.ndarray] = None
        self._ptr = 0

    def __call__(self, lq: np.ndarray, gt: np.ndarray
                 ) -> Tuple[np.ndarray, np.ndarray]:
        """Push a batch, pop an equally-sized shuffled batch."""
        b = lq.shape[0]
        if self._lq is None:
            assert self.queue_size % b == 0, (
                "queue size must be divisible by batch size")
            self._lq = np.zeros((self.queue_size, *lq.shape[1:]), lq.dtype)
            self._gt = np.zeros((self.queue_size, *gt.shape[1:]), gt.dtype)
        if self._ptr == self.queue_size:
            idx = self._rng.permutation(self.queue_size)
            self._lq = self._lq[idx]
            self._gt = self._gt[idx]
            out_lq = self._lq[:b].copy()
            out_gt = self._gt[:b].copy()
            self._lq[:b] = lq
            self._gt[:b] = gt
            return out_lq, out_gt
        # warmup: enqueue and return the input as-is
        self._lq[self._ptr : self._ptr + b] = lq
        self._gt[self._ptr : self._ptr + b] = gt
        self._ptr += b
        return lq, gt
