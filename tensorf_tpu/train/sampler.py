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
    """Random-permutation batch sampler over a flat ray store.

    ``pool`` (optional): draw from this array of store ids instead of
    ``range(total)`` — the multi-host layout keeps the store identical on
    every host and gives each host a disjoint id pool
    (parallel/mesh.py::host_ray_pool), so draws stay host-disjoint without
    physically slicing the store.
    """

    def __init__(self, total: int, batch: int, seed: int = 20211202,
                 pool=None):
        if pool is not None:
            pool = np.asarray(pool, np.int64)
            total = pool.size
        if total <= 0:
            # an empty store/stratum cannot produce ids; fail loudly here
            # (a ZeroDivisionError later — or a hang at the next collective
            # on the other hosts — is much harder to diagnose)
            raise ValueError(
                f"SimpleSampler: empty ray store (total={total}); on a "
                "multi-host run this means this host's id pool is empty"
            )
        self.total = total
        self.batch = batch
        self.curr = total
        self.ids = None
        self.pool = pool
        self._rng = np.random.default_rng(seed)

    def nextids(self) -> np.ndarray:
        out = self._next_positions()
        return out if self.pool is None else self.pool[out]

    def get_state(self):
        """(json-able meta, permutation array | None) — everything needed
        to continue this sampler's draw stream bit-exactly after a resume
        (the reference has no resume at all; SURVEY §5)."""
        meta = {
            "total": int(self.total),
            "batch": int(self.batch),
            "curr": int(self.curr),
            "rng": self._rng.bit_generator.state,
            "has_ids": self.ids is not None,
        }
        return meta, (None if self.ids is None else np.asarray(self.ids))

    def set_state(self, meta, ids) -> None:
        if int(meta["total"]) != self.total or int(meta["batch"]) != self.batch:
            raise ValueError(
                f"sampler state mismatch: saved total/batch "
                f"{meta['total']}/{meta['batch']} vs {self.total}/{self.batch}"
            )
        self.curr = int(meta["curr"])
        self._rng.bit_generator.state = meta["rng"]
        self.ids = None if not meta.get("has_ids") else np.asarray(ids, np.int64)

    def _next_positions(self) -> np.ndarray:
        if self.batch > self.total:
            # oversampled tiny store (e.g. a stratum smaller than its
            # quota): tile fresh permutations up to the batch size so the
            # output shape stays fixed (no truncation -> no retrace)
            reps = -(-self.batch // self.total)
            ids = np.concatenate(
                [self._rng.permutation(self.total) for _ in range(reps)]
            )
            return ids[: self.batch]
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
    to ``batch`` (largest-remainder rounding).  Each quota is additionally
    capped at its stratum's size (a quota beyond the stratum would make
    SimpleSampler return a short id array and change the compiled sub-batch
    shape); the residual is redistributed to strata with headroom."""
    assert batch % round_to == 0, (batch, round_to)
    assert len(sizes) * round_to <= batch, (sizes, batch, round_to)
    total = float(sum(sizes))

    def cap(i: int) -> int:
        # max quota stratum i can absorb: its size rounded down to round_to
        # (but at least round_to — a stratum smaller than round_to keeps a
        # round_to quota and oversamples; SimpleSampler tiles permutations
        # so the output shape stays fixed).
        return max(round_to, sizes[i] // round_to * round_to)

    raw = [batch * s / total for s in sizes]
    quotas = [
        min(cap(i), max(round_to, int(round(r / round_to)) * round_to))
        for i, r in enumerate(raw)
    ]
    # force the sum to `batch`: distribute the residual over strata in
    # descending size order, respecting each stratum's cap / floor
    diff = batch - sum(quotas)
    order = sorted(range(len(sizes)), key=lambda i: -sizes[i])
    for i in order:
        if diff == 0:
            break
        if diff > 0:
            take = min(diff, cap(i) - quotas[i])
        else:
            take = max(diff, round_to - quotas[i])
        quotas[i] += take
        diff -= take
    if diff > 0:
        # batch exceeds the total clamped capacity (tiny store): the
        # largest stratum absorbs the rest and oversamples — SimpleSampler
        # tiles permutations, so the sub-batch shape stays fixed
        quotas[order[0]] += diff
        diff = 0
    assert diff == 0 and all(q >= round_to for q in quotas), (
        quotas, sizes, batch
    )
    return quotas


def localize_strata(
    strata: Sequence[np.ndarray],
    counts: np.ndarray,
    pool: np.ndarray,
    fallback_max: int,
) -> List[np.ndarray]:
    """Per-host slice of a GLOBAL stratum plan (multi-host layout).

    Every host computes the same ``strata`` over the identical full store;
    host p then draws only from ``pool`` (its disjoint id subset).  A
    stratum whose pool slice is empty borrows lower-count pool rays (they
    fit the stratum budget exactly); the whole pool only as a last resort.
    """
    in_pool = np.zeros(counts.size, bool)
    in_pool[pool] = True
    out = []
    for sel in strata:
        loc = sel[in_pool[sel]]
        if loc.size == 0:
            bound = int(counts[sel].max()) if sel.size else int(fallback_max)
            cand = pool[counts[pool] <= bound]
            loc = cand if cand.size else pool
        out.append(loc)
    return out


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

    def get_state(self):
        """(json-able meta, strata id arrays, per-stratum permutation
        arrays) for bit-exact resume; rebuild with ``StratifiedSampler``
        on the saved strata/quotas and apply ``set_state``."""
        metas, idss = [], []
        for smp in self.samplers:
            m, ids = smp.get_state()
            metas.append(m)
            idss.append(ids)
        return (
            {"quotas": [int(q) for q in self.quotas], "samplers": metas},
            list(self.strata),
            idss,
        )

    def set_state(self, meta, idss) -> None:
        if len(meta["samplers"]) != len(self.samplers):
            raise ValueError("stratum count mismatch in sampler state")
        for smp, m, ids in zip(self.samplers, meta["samplers"], idss):
            smp.set_state(m, ids)
