"""Epoch-free random ray-batch sampler (reference train.py:44-56)."""

from __future__ import annotations

import numpy as np


class SimpleSampler:
    """Random-permutation batch sampler over a flat ray store."""

    def __init__(self, total: int, batch: int, seed: int = 20211202):
        self.total = total
        self.batch = batch
        self.curr = total
        self.ids = None
        self._rng = np.random.default_rng(seed)

    def nextids(self) -> np.ndarray:
        self.curr += self.batch
        if self.curr + self.batch > self.total:
            self.ids = self._rng.permutation(self.total)
            self.curr = 0
        return self.ids[self.curr : self.curr + self.batch]
