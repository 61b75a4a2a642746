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
    out = jnp.einsum("mt,mtc->mc", w, taps)
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
    out = jnp.einsum("mt,mtc->mc", w, taps)
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
