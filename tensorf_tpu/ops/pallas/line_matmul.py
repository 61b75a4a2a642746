"""Pallas TPU kernel: fused lerp-matrix line sampling.

Line-factor sampling as a matmul (see ops/grid_sample.line_sample_matmul)
needs the (M, L) one-hot-lerp matrix A.  The jnp formulation materializes
A in HBM (~1GB at M=1.8M, L=128, fp32, both directions); this kernel
builds each (TILE_M, L) block of A in VMEM from the coordinates and feeds
the MXU directly — A never touches HBM.

  forward : out[m] = (1-w_m)·line[i_m] + w_m·line[i_m+1]      (A_tile @ line)
  backward: dline  = Σ_tiles A_tileᵀ @ g_tile                  (accumulated
            across sequential grid steps into the same output block)

Coordinates are non-differentiable (the reference detaches grid coords,
tensoRF.py:212).  Runs in interpreter mode off-TPU so the CPU test suite
exercises the same code path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU builds; interpret mode needs no params
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

TILE_M = 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _block_spec(shape, index_map):
    if _VMEM is None:
        return pl.BlockSpec(shape, index_map)
    return pl.BlockSpec(shape, index_map, memory_space=_VMEM)


def _lerp_matrix(coord_blk: jax.Array, L: int) -> jax.Array:
    """(TILE_M, 1) clamped coords -> (TILE_M, L) one-hot-lerp matrix."""
    pos = (coord_blk + 1.0) * 0.5 * (L - 1)  # (TILE_M, 1)
    i0 = jnp.floor(pos)
    w1 = pos - i0
    cols = jax.lax.broadcasted_iota(
        jnp.int32, (coord_blk.shape[0], L), 1
    ).astype(jnp.float32)
    return jnp.where(cols == i0, 1.0 - w1, 0.0) + jnp.where(
        cols == i0 + 1.0, w1, 0.0
    )


def _fwd_kernel(coord_ref, line_ref, out_ref):
    a = _lerp_matrix(coord_ref[...], line_ref.shape[0])
    out_ref[...] = jnp.dot(
        a, line_ref[...], preferred_element_type=jnp.float32
    )


def _bwd_kernel(coord_ref, g_ref, dline_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        dline_ref[...] = jnp.zeros_like(dline_ref)

    a = _lerp_matrix(coord_ref[...], dline_ref.shape[0])
    dline_ref[...] += jnp.dot(
        a.T, g_ref[...], preferred_element_type=jnp.float32
    )


def _pad_m(x, tile):
    m = x.shape[0]
    pad = (-m) % tile
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x, m


@partial(jax.custom_vjp, nondiff_argnums=())
def line_sample_pallas(line: jax.Array, coord: jax.Array) -> jax.Array:
    """line (L, C), coord (M,) in [-1, 1] -> (M, C)."""
    return _fwd(line, coord)[0]


def _fwd(line, coord):
    L, C = line.shape
    coord2, M = _pad_m(
        jax.lax.stop_gradient(jnp.clip(coord, -1.0, 1.0))[:, None], TILE_M
    )
    grid = coord2.shape[0] // TILE_M
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(grid,),
        in_specs=[
            _block_spec((TILE_M, 1), lambda i: (i, 0)),
            _block_spec((L, C), lambda i: (0, 0)),
        ],
        out_specs=_block_spec((TILE_M, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((coord2.shape[0], C), jnp.float32),
        interpret=_interpret(),
    )(coord2, line.astype(jnp.float32))
    return out[:M], (line.shape, coord2, M)


def _bwd(res, g):
    (L, C), coord2, _ = res
    g2, _ = _pad_m(g.astype(jnp.float32), TILE_M)
    grid = coord2.shape[0] // TILE_M
    dline = pl.pallas_call(
        _bwd_kernel,
        grid=(grid,),
        in_specs=[
            _block_spec((TILE_M, 1), lambda i: (i, 0)),
            _block_spec((TILE_M, C), lambda i: (i, 0)),
        ],
        out_specs=_block_spec((L, C), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((L, C), jnp.float32),
        interpret=_interpret(),
    )(coord2, g2)
    return dline, None


line_sample_pallas.defvjp(_fwd, _bwd)
