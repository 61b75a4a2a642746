"""align_corners bilinear resizing for coarse-to-fine factor upsampling.

Replaces ``F.interpolate(mode='bilinear', align_corners=True)`` used at the
voxel-upsampling events (reference models/tensoRF.py:267-280, 418-428).
``jax.image.resize`` has no align_corners mode, so this maps output index i
to source coordinate i*(S-1)/(T-1) and lerps — exact torch parity.

These run on host once per schedule segment (shape-changing), so they are
deliberately simple gather-based code, not kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _axis_resize(x: jax.Array, axis: int, target: int) -> jax.Array:
    src = x.shape[axis]
    if src == target:
        return x
    if src == 1:
        reps = [1] * x.ndim
        reps[axis] = target
        return jnp.tile(x, reps)
    pos = jnp.arange(target, dtype=jnp.float32) * ((src - 1) / (target - 1))
    i0 = jnp.floor(pos).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, src - 1)
    w = (pos - i0.astype(jnp.float32)).astype(x.dtype)
    lo = jnp.take(x, i0, axis=axis)
    hi = jnp.take(x, i1, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = target
    w = w.reshape(shape)
    return lo * (1 - w) + hi * w


def resize_bilinear_align_corners(
    plane: jax.Array, target_h: int, target_w: int
) -> jax.Array:
    """(H, W, C) -> (target_h, target_w, C), separable align_corners lerp."""
    return _axis_resize(_axis_resize(plane, 0, target_h), 1, target_w)


def resize_linear_align_corners(line: jax.Array, target_l: int) -> jax.Array:
    """(L, C) -> (target_l, C)."""
    return _axis_resize(line, 0, target_l)
