"""Pallas TPU kernel: banked VMEM-accumulator row scatter-add.

``out[idx[m]] += g[m]`` is the backward of the footprint plane gather — the
single most expensive op in the train step (XLA's variadic scatter-add runs
at ~0.06G rows/s on v5e; reference equivalent: torch's grid_sampler_2d
backward, models/tensoRF.py:216-257 call sites).

Design (v2 — replaces the serial single-accumulator kernel):
  * the accumulator lives in VMEM for the whole call (v5e has ~128MB VMEM;
    a 300^2x64 fp32 plane-gradient block is 23MB);
  * NB independent accumulator *banks*: sample j goes to bank j % NB, so
    the read-modify-write chains of different banks have no memory
    dependence and Mosaic can pipeline them (a single chain is
    latency-bound at ~17 cycles/row — the round-1 result);
  * grid = (channel_blocks, sample_blocks); grad rows stream through VMEM
    blocks, indices ride in SMEM; banks are summed into the output block
    on each channel's last sample step.

The caller picks (CHAN_BLOCK, NB) so that NB * n_rows * CHAN_BLOCK * 4B
fits the VMEM budget; `pick_layout` automates that.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

TILE_M = 2048
_VMEM_BUDGET = 100 * 1024 * 1024  # accumulators + streaming blocks


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def pick_layout(n_rows: int, n_chan: int, max_banks: int = 8):
    """Choose (chan_block, n_banks) under the VMEM budget.

    Prefers fewer channel passes (wider blocks) as long as at least 2
    banks fit; falls back to narrower blocks to buy banks.
    """
    best = None
    cb = min(n_chan, 512)
    while cb >= 64:
        if n_chan % cb == 0:
            banks = min(max_banks, _VMEM_BUDGET // (n_rows * cb * 4))
            if banks >= 1:
                passes = n_chan // cb
                # score: total RMW row-accesses per bank-chain, i.e.
                # passes * M / banks — lower is better (M constant).
                score = passes / max(banks, 1)
                if best is None or score < best[0]:
                    best = (score, cb, banks)
        cb //= 2
    if best is None:
        # No wide block fit (n_chan < 64, or gigantic row count): stream
        # through the widest block that actually divides n_chan, 1 bank.
        cb = max(d for d in range(1, min(n_chan, 64) + 1) if n_chan % d == 0)
        return cb, 1
    return best[1], best[2]


def _kernel(nb, idx_ref, g_ref, out_ref, acc):
    s = pl.program_id(1)
    n_s = pl.num_programs(1)

    @pl.when(s == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    tile = g_ref.shape[0]

    def body(j, _):
        base = j * nb
        for u in range(nb):
            m = base + u
            i = idx_ref[m // 128, m % 128]
            acc[u, pl.ds(i, 1), :] += g_ref[pl.ds(m, 1), :]
        return 0

    jax.lax.fori_loop(0, tile // nb, body, 0, unroll=False)

    @pl.when(s == n_s - 1)
    def _():
        total = acc[0, :, :]
        for u in range(1, nb):
            total = total + acc[u, :, :]
        out_ref[...] = total


def scatter_add_banked(
    idx: jax.Array,
    g: jax.Array,
    n_rows: int,
    *,
    chan_block: int | None = None,
    n_banks: int | None = None,
) -> jax.Array:
    """out[idx[m]] += g[m]; idx (M,) int32, g (M, C) -> (n_rows, C) fp32.

    Out-of-range indices must be pre-clipped; pad rows should carry zero
    grads (they land on row 0).
    """
    M, C = g.shape
    if chan_block is None or n_banks is None:
        cb, nb = pick_layout(n_rows, C)
        chan_block = chan_block or cb
        n_banks = n_banks or nb
    assert C % chan_block == 0, (C, chan_block)

    pad = (-M) % TILE_M
    if pad:
        idx = jnp.pad(idx, (0, pad))
        g = jnp.pad(g, ((0, pad), (0, 0)))
    Mp = idx.shape[0]
    idx2 = idx.astype(jnp.int32).reshape(Mp // 128, 128)

    kwargs = {}
    if pltpu is not None and not _interpret():
        idx_spec = pl.BlockSpec(
            (TILE_M // 128, 128), lambda c, s: (s, 0),
            memory_space=pltpu.SMEM,
        )
        g_spec = pl.BlockSpec(
            (TILE_M, chan_block), lambda c, s: (s, c),
            memory_space=pltpu.VMEM,
        )
        out_spec = pl.BlockSpec(
            (n_rows, chan_block), lambda c, s: (0, c),
            memory_space=pltpu.VMEM,
        )
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024
        )
        kwargs["scratch_shapes"] = [
            pltpu.VMEM((n_banks, n_rows, chan_block), jnp.float32)
        ]
    else:
        idx_spec = pl.BlockSpec((TILE_M // 128, 128), lambda c, s: (s, 0))
        g_spec = pl.BlockSpec((TILE_M, chan_block), lambda c, s: (s, c))
        out_spec = pl.BlockSpec((n_rows, chan_block), lambda c, s: (0, c))
        kwargs["scratch_shapes"] = [
            pltpu.VMEM((n_banks, n_rows, chan_block), jnp.float32)
            if pltpu is not None
            else None
        ]

    return pl.pallas_call(
        functools.partial(_kernel, n_banks),
        grid=(C // chan_block, Mp // TILE_M),
        in_specs=[idx_spec, g_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, C), jnp.float32),
        interpret=_interpret(),
        **kwargs,
    )(idx2, g.astype(jnp.float32))
