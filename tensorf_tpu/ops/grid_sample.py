"""Bilinear / trilinear grid sampling, TPU-native.

Replaces the reference's hottest op — ``F.grid_sample(align_corners=True,
padding_mode='zeros')`` over factor planes/lines (reference:
models/tensoRF.py:216-218, 240-257, 363-410) and the 3-D alpha-mask lookup
(reference: models/tensorBase.py:43).

TPU design choices (not a port):
  * channels-last layout — planes are ``(H, W, R)`` and lines ``(L, R)`` so
    each gathered tap reads a contiguous rank-vector (the lane dimension),
    instead of torch's ``(1, R, H, W)`` NCHW strided gathers.
  * a single fused gather per sample batch: the four bilinear taps are
    gathered with one ``jnp.take`` of shape ``(M, 4)`` flat indices, then
    contracted with the tap weights on the VPU. XLA lowers this to one
    gather HLO; its transpose (the backward) is one scatter-add.
  * out-of-range taps are handled with zero *weights* on clipped indices —
    exactly torch's zeros padding semantics, but branch-free.

All functions are differentiable (gather's VJP is scatter-add, which is what
the reference relies on torch's grid_sampler backward for).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _tap_lerp(w: jax.Array, taps: jax.Array) -> jax.Array:
    """Contract (M, T) tap weights with (M, T, C) gathered taps -> (M, C).

    Deliberately an unrolled elementwise sum, NOT an einsum: a batched
    ``dot_general`` here puts a degenerate K=T contraction on the MXU, and
    its backward materializes (M, C, T) outer products plus a full
    transpose back to the (M, T, C) tap layout — ~2x the tap bytes in pure
    layout traffic (measured ~60 ms/step in the phase-A train step, HLO
    attribution in scripts/ablate_step.py --attrib).  The unrolled form
    fuses into the gather consumer forward and into the scatter update
    backward; the left-to-right add chain matches dot_general's sequential
    accumulation, so results are bit-identical.
    """
    out = w[:, 0, None] * taps[:, 0]
    for t in range(1, taps.shape[1]):
        out = out + w[:, t, None] * taps[:, t]
    return out


def _tap_1d(coord: jax.Array, size: int):
    """align_corners=True unnormalization + floor taps for one axis.

    coord: (...,) in [-1, 1].  Returns (i0, i1, w1, inb0, inb1) where
    ``i0/i1`` are clipped integer taps, ``w1`` the lerp weight of the upper
    tap, and ``inb*`` in-bounds indicators implementing zeros padding.
    """
    x = (coord + 1.0) * 0.5 * (size - 1)
    x0f = jnp.floor(x)
    w1 = x - x0f
    i0 = x0f.astype(jnp.int32)
    i1 = i0 + 1
    inb0 = ((i0 >= 0) & (i0 < size)).astype(coord.dtype)
    inb1 = ((i1 >= 0) & (i1 < size)).astype(coord.dtype)
    i0 = jnp.clip(i0, 0, size - 1)
    i1 = jnp.clip(i1, 0, size - 1)
    return i0, i1, w1, inb0, inb1


def grid_sample_2d(plane: jax.Array, coords: jax.Array) -> jax.Array:
    """Bilinear sample of a channels-last plane.

    Args:
      plane: (H, W, C) feature plane.
      coords: (..., 2) normalized coordinates in [-1, 1]; ``coords[..., 0]``
        indexes the W axis and ``coords[..., 1]`` the H axis (torch
        grid_sample convention, align_corners=True, zeros padding).

    Returns:
      (..., C) sampled features.
    """
    H, W, C = plane.shape
    shape = coords.shape[:-1]
    coords = coords.reshape(-1, 2)

    x0, x1, wx, bx0, bx1 = _tap_1d(coords[:, 0], W)
    y0, y1, wy, by0, by1 = _tap_1d(coords[:, 1], H)

    # Four taps as one fused gather: flat (M, 4) indices into (H*W, C).
    idx = jnp.stack(
        [y0 * W + x0, y0 * W + x1, y1 * W + x0, y1 * W + x1], axis=-1
    )
    w = jnp.stack(
        [
            (1 - wy) * (1 - wx) * by0 * bx0,
            (1 - wy) * wx * by0 * bx1,
            wy * (1 - wx) * by1 * bx0,
            wy * wx * by1 * bx1,
        ],
        axis=-1,
    )
    taps = jnp.take(plane.reshape(H * W, C), idx, axis=0)  # (M, 4, C)
    out = _tap_lerp(w, taps)
    return out.reshape(*shape, C)


def grid_sample_1d(line: jax.Array, coord: jax.Array) -> jax.Array:
    """Linear sample of a channels-last line factor.

    Args:
      line: (L, C) feature line.
      coord: (...,) normalized coordinate in [-1, 1] over the L axis.

    Returns:
      (..., C) sampled features.

    Matches the reference's degenerate-W 2-D grid_sample over ``(1, R, L, 1)``
    lines with grid x fixed at 0 (reference: models/tensoRF.py:211-219) —
    with W == 1 and align_corners, the x lerp is exactly a no-op, so this is
    a pure 1-D lerp.
    """
    L, C = line.shape
    shape = coord.shape
    coord = coord.reshape(-1)
    i0, i1, w1, b0, b1 = _tap_1d(coord, L)
    idx = jnp.stack([i0, i1], axis=-1)  # (M, 2)
    w = jnp.stack([(1 - w1) * b0, w1 * b1], axis=-1)
    taps = jnp.take(line, idx, axis=0)  # (M, 2, C)
    out = _tap_lerp(w, taps)
    return out.reshape(*shape, C)


# ---------------------------------------------------------------------------
# Footprint-packed sampling: the TPU-fast path.
#
# TPU gathers are ROW-RATE bound (~0.2-0.4G rows/s on v5e regardless of row
# width, vs ~750GB/s streaming).  A naive bilinear sample costs 4 gathered
# rows per plane; a VMSplit sample batch costs 36 rows/sample across its
# density+appearance planes and lines.  Packing the 2x2 texel neighborhood
# into one row of a precomputed footprint table — F[y, x] = concat(P[y, x],
# P[y, x+1], P[y+1, x], P[y+1, x+1]) — turns each bilinear sample into ONE
# row gather; packing density+appearance channels into the same table
# halves rows again (6 rows/sample total).  The footprint build is a cheap
# streaming op (shifted concats) recomputed inside jit, and its AD
# transpose folds tap gradients back onto the plane as a stencil — no
# custom VJP needed.
# ---------------------------------------------------------------------------


def make_footprint_2d(plane: jax.Array) -> jax.Array:
    """(H, W, C) -> (H, W, 4C) with each row holding its 2x2 neighborhood.

    Rows at y=H-1 / x=W-1 zero-pad the out-of-range taps; align_corners
    in-range coordinates give those taps zero lerp weight, so results are
    exact.
    """
    H, W, C = plane.shape
    p = jnp.pad(plane, ((0, 1), (0, 1), (0, 0)))
    return jnp.concatenate(
        [p[:H, :W], p[:H, 1 : W + 1], p[1 : H + 1, :W], p[1 : H + 1, 1 : W + 1]],
        axis=-1,
    )


def make_footprint_1d(line: jax.Array) -> jax.Array:
    """(L, C) -> (L, 2C) with each row holding texels (l, l+1)."""
    L, C = line.shape
    p = jnp.pad(line, ((0, 1), (0, 0)))
    return jnp.concatenate([p[:L], p[1 : L + 1]], axis=-1)


def footprint_sample_2d(
    fp: jax.Array, H: int, W: int, coords: jax.Array
) -> jax.Array:
    """Bilinear sample from a footprint table; one gathered row per point.

    fp: (H, W, 4C) from make_footprint_2d.  coords (..., 2) as in
    grid_sample_2d.  Returns (..., C); exactly equal to
    grid_sample_2d(plane, coords) for coords in [-1, 1].  Out-of-range
    coords clamp to the edge (instead of torch's zeros padding) — callers
    mask those samples out downstream, which is the renderer's contract
    for invalid samples.
    """
    C4 = fp.shape[-1]
    C = C4 // 4
    shape = coords.shape[:-1]
    coords = jnp.clip(coords.reshape(-1, 2), -1.0, 1.0)

    x = (coords[:, 0] + 1.0) * 0.5 * (W - 1)
    y = (coords[:, 1] + 1.0) * 0.5 * (H - 1)
    x0f, y0f = jnp.floor(x), jnp.floor(y)
    wx, wy = x - x0f, y - y0f
    idx = y0f.astype(jnp.int32) * W + x0f.astype(jnp.int32)
    taps = jnp.take(fp.reshape(H * W, C4), idx, axis=0)  # (M, 4C)
    taps = taps.reshape(-1, 4, C)
    w = jnp.stack(
        [(1 - wy) * (1 - wx), (1 - wy) * wx, wy * (1 - wx), wy * wx],
        axis=-1,
    )
    out = _tap_lerp(w, taps)
    return out.reshape(*shape, C)


def footprint_sample_1d(
    fp: jax.Array, L: int, coord: jax.Array
) -> jax.Array:
    """Linear sample from a 1-D footprint table; one row per point.

    Same edge-clamp contract as footprint_sample_2d.
    """
    C2 = fp.shape[-1]
    C = C2 // 2
    shape = coord.shape
    coord = jnp.clip(coord.reshape(-1), -1.0, 1.0)
    pos = (coord + 1.0) * 0.5 * (L - 1)
    i0f = jnp.floor(pos)
    w1 = pos - i0f
    taps = jnp.take(fp, i0f.astype(jnp.int32), axis=0).reshape(-1, 2, C)
    w = jnp.stack([1 - w1, w1], axis=-1)
    out = _tap_lerp(w, taps)
    return out.reshape(*shape, C)


def line_sample_matmul(
    line: jax.Array, coord: jax.Array, a_dtype=None
) -> jax.Array:
    """Linear line sampling as a dense one-hot-lerp matmul (MXU path).

    For small tables (line factors are <= a few hundred rows) a gather is
    row-rate bound on TPU while a (M, L) x (L, C) matmul runs on the MXU at
    full rate — and its AD transpose is another matmul instead of a serial
    scatter-add, which is the single most expensive op in the naive
    backward.  Same edge-clamp contract as footprint_sample_1d; coords are
    non-differentiable (the reference detaches them, tensoRF.py:212).

    ``a_dtype`` sets the one-hot matrix dtype: the (M, L) lerp-weight
    matrix dominates HBM traffic of this op, and bfloat16 halves it at a
    ~0.4% quantization of the interpolation weights (the table values and
    the accumulation stay in ``line.dtype``/float32).
    """
    L, C = line.shape
    shape = coord.shape
    coord = jax.lax.stop_gradient(
        jnp.clip(coord.reshape(-1), -1.0, 1.0)
    )
    pos = (coord + 1.0) * 0.5 * (L - 1)
    i0 = jnp.floor(pos)
    w1 = pos - i0
    cols = jnp.arange(L, dtype=pos.dtype)[None, :]
    a = jnp.where(cols == i0[:, None], 1.0 - w1[:, None], 0.0) + jnp.where(
        cols == i0[:, None] + 1.0, w1[:, None], 0.0
    )
    if a_dtype is not None:
        a = a.astype(a_dtype)
        out = jnp.einsum(
            "ml,lc->mc", a, line.astype(a_dtype),
            preferred_element_type=jnp.float32,
        )
    else:
        out = a @ line
    return out.reshape(*shape, C)


def grid_sample_3d(volume: jax.Array, coords: jax.Array) -> jax.Array:
    """Trilinear sample of a (D, H, W) volume (single channel).

    coords: (..., 3) with ``coords[..., 0]`` indexing W, ``[..., 1]`` H and
    ``[..., 2]`` D — the torch 5-D grid_sample convention used by the alpha
    mask (reference: models/tensorBase.py:43).
    """
    D, H, W = volume.shape
    shape = coords.shape[:-1]
    coords = coords.reshape(-1, 3)

    x0, x1, wx, bx0, bx1 = _tap_1d(coords[:, 0], W)
    y0, y1, wy, by0, by1 = _tap_1d(coords[:, 1], H)
    z0, z1, wz, bz0, bz1 = _tap_1d(coords[:, 2], D)

    flat = volume.reshape(-1)

    def tap(zi, yi, xi, wzt, wyt, wxt):
        v = flat[zi * (H * W) + yi * W + xi]
        return v * (wzt * wyt * wxt)

    out = (
        tap(z0, y0, x0, (1 - wz) * bz0, (1 - wy) * by0, (1 - wx) * bx0)
        + tap(z0, y0, x1, (1 - wz) * bz0, (1 - wy) * by0, wx * bx1)
        + tap(z0, y1, x0, (1 - wz) * bz0, wy * by1, (1 - wx) * bx0)
        + tap(z0, y1, x1, (1 - wz) * bz0, wy * by1, wx * bx1)
        + tap(z1, y0, x0, wz * bz1, (1 - wy) * by0, (1 - wx) * bx0)
        + tap(z1, y0, x1, wz * bz1, (1 - wy) * by0, wx * bx1)
        + tap(z1, y1, x0, wz * bz1, wy * by1, (1 - wx) * bx0)
        + tap(z1, y1, x1, wz * bz1, wy * by1, wx * bx1)
    )
    return out.reshape(shape)
