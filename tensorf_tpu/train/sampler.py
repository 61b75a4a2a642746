"""Epoch-free random ray-batch samplers (reference train.py:44-56).

``StratifiedSampler`` draws a fixed per-stratum quota each step from a
candidate-count-partitioned ray store (render/culling.py::stratify_rays);
with quotas proportional to stratum sizes every ray keeps the same
per-step inclusion probability as uniform sampling (up to quota rounding),
so the gradient estimator is unchanged while each sub-batch can render at
its own static sample budget.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

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


def allocate_quotas(
    sizes: Sequence[int], batch: int, round_to: int = 8
) -> List[int]:
    """Per-stratum batch quotas: proportional to stratum size, each a
    positive multiple of ``round_to`` (device-mesh shard alignment), summing
    to ``batch`` (largest-remainder rounding, residual to the largest
    stratum)."""
    assert batch % round_to == 0, (batch, round_to)
    assert len(sizes) * round_to <= batch, (sizes, batch, round_to)
    total = float(sum(sizes))
    raw = [batch * s / total for s in sizes]
    quotas = [max(round_to, int(round(r / round_to)) * round_to) for r in raw]
    # force the sum to `batch` by adjusting the largest stratum
    diff = batch - sum(quotas)
    order = sorted(range(len(sizes)), key=lambda i: -sizes[i])
    for i in order:
        take = max(diff, round_to - quotas[i])
        quotas[i] += take
        diff -= take
        if diff == 0:
            break
    assert diff == 0 and all(q >= round_to for q in quotas), (quotas, batch)
    return quotas


class StratifiedSampler:
    """Fixed per-stratum quota sampler over a partitioned ray store.

    ``strata``: per-stratum arrays of ray-store indices; ``quotas``: rays
    drawn per stratum each step (see allocate_quotas).  Returns a tuple of
    global-store index arrays, one per stratum, each drawn by an
    independent epoch-permutation SimpleSampler within its stratum.
    """

    def __init__(
        self,
        strata: Sequence[np.ndarray],
        quotas: Sequence[int],
        seed: int = 20211202,
    ):
        assert len(strata) == len(quotas)
        self.strata = [np.asarray(s, np.int64) for s in strata]
        self.quotas = list(quotas)
        self.samplers = [
            SimpleSampler(len(s), q, seed + 7919 * i)
            for i, (s, q) in enumerate(zip(self.strata, quotas))
        ]

    def nextids(self) -> Tuple[np.ndarray, ...]:
        return tuple(
            s[smp.nextids()] for s, smp in zip(self.strata, self.samplers)
        )
