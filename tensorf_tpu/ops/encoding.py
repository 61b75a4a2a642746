"""Sinusoidal positional encoding.

Parity with the reference encoder (models/tensorBase.py:13-19 /
models/mlp.py:8-13): frequencies 2^k, k=0..F-1, dim-major layout
``[x*f0, x*f1, ..., y*f0, ...]`` then ``concat(sin, cos)``.  FreeNeRF
frequency masks are vectors over this 2*D*F channel layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def positional_encoding(positions: jax.Array, freqs: int) -> jax.Array:
    """positions (..., D) -> (..., 2*D*freqs)."""
    freq_bands = 2.0 ** jnp.arange(freqs, dtype=positions.dtype)  # (F,)
    pts = positions[..., None] * freq_bands  # (..., D, F)
    pts = pts.reshape(*positions.shape[:-1], positions.shape[-1] * freqs)
    return jnp.concatenate([jnp.sin(pts), jnp.cos(pts)], axis=-1)
