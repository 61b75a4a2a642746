"""Binary occupancy grid ("alpha mask") for sample culling.

Counterpart of the reference AlphaGridMask (models/tensorBase.py:30-48).
The volume is a (Z, Y, X) float array trilinearly sampled with its own
aabb normalization; in the fixed-shape TPU renderer the mask acts as a
multiplicative *gate* on sample validity rather than a boolean-compaction
index (SURVEY.md §7 design stance).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.grid_sample import grid_sample_3d


class AlphaGridMask(NamedTuple):
    aabb: jax.Array  # (2, 3)
    volume: jax.Array  # (Z, Y, X) float {0, 1}

    @property
    def grid_size(self):
        # (X, Y, Z), matching reference tensorBase.py:39.
        return self.volume.shape[::-1]


def sample_alpha(mask: AlphaGridMask, xyz: jax.Array) -> jax.Array:
    """xyz (..., 3) world coords -> (...,) trilinear mask values."""
    inv_size = 2.0 / (mask.aabb[1] - mask.aabb[0])
    norm = (xyz - mask.aabb[0]) * inv_size - 1.0
    return grid_sample_3d(mask.volume, norm)


def max_pool_3d_same(volume: jax.Array, ks: int = 3) -> jax.Array:
    """ks-window max dilation with same padding (F.max_pool3d equivalent,
    reference tensorBase.py:241) via lax.reduce_window."""
    pad = ks // 2
    return jax.lax.reduce_window(
        volume,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(ks, ks, ks),
        window_strides=(1, 1, 1),
        padding=((pad, pad), (pad, pad), (pad, pad)),
    )


def pack_mask(mask: AlphaGridMask):
    """Bit-pack for self-describing checkpoints (tensorBase.py:160-168)."""
    vol = np.asarray(mask.volume) > 0.5
    return {
        "alphaMask.shape": np.asarray(vol.shape, dtype=np.int64),
        "alphaMask.mask": np.packbits(vol.reshape(-1)),
        "alphaMask.aabb": np.asarray(mask.aabb, dtype=np.float32),
    }


def unpack_mask(entries) -> AlphaGridMask:
    shape = tuple(int(s) for s in entries["alphaMask.shape"])
    length = int(np.prod(shape))
    bits = np.unpackbits(entries["alphaMask.mask"])[:length].reshape(shape)
    return AlphaGridMask(
        aabb=jnp.asarray(entries["alphaMask.aabb"], jnp.float32).reshape(2, 3),
        volume=jnp.asarray(bits, jnp.float32),
    )
