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
    # 1-voxel dilation of `volume`, used by the fast nearest-neighbor gate.
    # None is accepted (rebuilt lazily); checkpoints store only `volume`.
    dilated: jax.Array = None
    # Extra-dilated copy for the strided coarse pre-gate (see
    # sample_alpha_gate_coarse); covers COARSE_STRIDE samples per lookup.
    coarse: jax.Array = None

    @property
    def grid_size(self):
        # (X, Y, Z), matching reference tensorBase.py:39.
        return self.volume.shape[::-1]


# Ray samples tested per coarse-gate lookup.  The probe sits at the
# MIDDLE sample of each stride window, so with step_ratio 0.5 any window
# sample is within (COARSE_STRIDE/2)*0.5 = 1 voxel of the probe (grids
# are exactly isotropic: n_to_reso uses cubic voxels); adding +-0.5
# nearest-rounding at both points bounds the index offset by 2, so a
# 2-voxel extra dilation (ks=5) keeps the coarse gate a conservative
# superset of the exact gate — and candidate shells 2 voxels thinner than
# a ks=7 dilation, which is what sizes the sample budget.
COARSE_STRIDE = 4


def group_padded_count(cand: jax.Array) -> jax.Array:
    """(B, N) bool -> (B,) int: COARSE_STRIDE * (#stride windows with any
    set sample).

    The single definition of the statistic the window-granular budget
    compaction pays (render/volume.py::_compact_grouped selects whole
    stride windows): budget hints and serving tiers derived from it cover
    every kept sample by construction.  Exceeds the raw count by at most
    2*(COARSE_STRIDE-1) per ray — candidate runs are window-aligned
    because the coarse gate is window-constant (sample_alpha_gate_coarse
    repeats one probe per window), except where ray validity clips the
    two chord-end windows.  Kept next to COARSE_STRIDE so the renderer's
    paid statistic and the budget-sizing statistic cannot diverge.
    """
    B, N = cand.shape
    S = COARSE_STRIDE
    G = -(-N // S)
    pad = G * S - N
    if pad:
        cand = jnp.pad(cand, ((0, 0), (0, pad)))
    gk = cand.reshape(B, G, S).any(axis=-1)
    return S * jnp.sum(gk.astype(jnp.int32), axis=-1)


def with_dilation(mask: AlphaGridMask) -> AlphaGridMask:
    if mask.dilated is not None and mask.coarse is not None:
        return mask
    dilated = (
        mask.dilated
        if mask.dilated is not None
        else max_pool_3d_same(mask.volume, ks=3)
    )
    coarse = (
        mask.coarse
        if mask.coarse is not None
        else max_pool_3d_same(dilated, ks=5)
    )
    return mask._replace(dilated=dilated, coarse=coarse)


def sample_alpha(mask: AlphaGridMask, xyz: jax.Array) -> jax.Array:
    """xyz (..., 3) world coords -> (...,) trilinear mask values
    (reference AlphaGridMask.sample_alpha, tensorBase.py:41-45)."""
    inv_size = 2.0 / (mask.aabb[1] - mask.aabb[0])
    norm = (xyz - mask.aabb[0]) * inv_size - 1.0
    return grid_sample_3d(mask.volume, norm)


def sample_alpha_gate(mask: AlphaGridMask, xyz: jax.Array) -> jax.Array:
    """Fast conservative occupancy gate: nearest lookup on the pre-dilated
    volume — 1 gathered row per sample instead of trilinear's 8 (TPU
    gathers are row-rate bound).

    The reference culls where trilinear(volume) == 0 (support = the 1-voxel
    corner neighborhood); nearest(max_pool3(volume)) covers a superset of
    that support, so this gate never culls a sample the reference would
    keep — it only keeps slightly more (harmless: their density still
    composites exactly).
    """
    vol = mask.dilated if mask.dilated is not None else max_pool_3d_same(
        mask.volume, ks=3
    )
    D, H, W = vol.shape
    inv_size = 2.0 / (mask.aabb[1] - mask.aabb[0])
    norm = jnp.clip((xyz - mask.aabb[0]) * inv_size - 1.0, -1.0, 1.0)
    sizes = jnp.asarray([W, H, D], dtype=norm.dtype)
    ijk = jnp.round((norm + 1.0) * 0.5 * (sizes - 1)).astype(jnp.int32)
    flat = ijk[..., 2] * (H * W) + ijk[..., 1] * W + ijk[..., 0]
    out_of_box = jnp.any(
        (xyz < mask.aabb[0]) | (xyz > mask.aabb[1]), axis=-1
    )
    return jnp.where(out_of_box, 0.0, vol.reshape(-1)[flat])


def coarse_probe_hits(mask: AlphaGridMask, probe: jax.Array) -> jax.Array:
    """Nearest lookup of the extra-dilated coarse volume at probe points
    (..., 3) -> (...,) bool.  The shared primitive of the strided coarse
    pre-gate: sample_alpha_gate_coarse probes the middle sample of each
    stride window through this, and the probe-only count pass
    (culling.py) calls it on directly-computed probe positions."""
    vol = mask.coarse
    if vol is None:
        vol = max_pool_3d_same(
            mask.dilated
            if mask.dilated is not None
            else max_pool_3d_same(mask.volume, ks=3),
            ks=5,
        )
    D, H, W = vol.shape
    inv_size = 2.0 / (mask.aabb[1] - mask.aabb[0])
    norm = jnp.clip((probe - mask.aabb[0]) * inv_size - 1.0, -1.0, 1.0)
    sizes = jnp.asarray([W, H, D], dtype=norm.dtype)
    ijk = jnp.round((norm + 1.0) * 0.5 * (sizes - 1)).astype(jnp.int32)
    flat = ijk[..., 2] * (H * W) + ijk[..., 1] * W + ijk[..., 0]
    return vol.reshape(-1)[flat] > 0


def coarse_probe_indices(n_samples: int) -> np.ndarray:
    """Lattice indices the coarse gate probes: the MIDDLE sample of each
    COARSE_STRIDE window (clipped at the lattice end)."""
    n_probe = -(-n_samples // COARSE_STRIDE)
    return np.minimum(
        np.arange(n_probe) * COARSE_STRIDE + COARSE_STRIDE // 2,
        n_samples - 1,
    )


def sample_alpha_gate_coarse(mask: AlphaGridMask, xyz: jax.Array) -> jax.Array:
    """Strided occupancy pre-gate: one lookup per COARSE_STRIDE samples.

    ``xyz`` (B, N, 3) are the full lattice sample positions; returns a
    (B, N) candidate gate that is a conservative superset of
    sample_alpha_gate at every sample (TPU gathers are row-rate bound, so
    the full-lattice gate costs B*N rows — this costs B*N/COARSE_STRIDE).
    Used only to pre-select budget candidates; the exact gate still runs on
    the kept samples, so final sigma gating is unchanged.
    """
    B, N, _ = xyz.shape
    probe = xyz[:, coarse_probe_indices(N), :]  # (B, n_probe, 3)
    hit = coarse_probe_hits(mask, probe)  # (B, n_probe)
    return jnp.repeat(hit, COARSE_STRIDE, axis=1)[:, :N]


def coarse_gate_valid(mask, step_size: float, ndc_ray: bool) -> bool:
    """Host-side check of the coarse pre-gate's conservative-superset
    precondition (ADVICE r2).

    The stride-window coverage argument (see COARSE_STRIDE) requires
    (COARSE_STRIDE/2) * step_size <= 1 mask voxel, so that with the +-0.5
    nearest-rounding slack the ks=5 (2-voxel) extra dilation still covers
    every window sample; NDC rays have non-uniform world-space spacing and
    break it outright.  Callers pass the result as the static
    ``use_coarse_gate`` flag of render_rays / count_ray_candidates; when
    False those fall back to the exact gate (correct, ~4x more gate rows).
    """
    if mask is None:
        return True  # no gate in play
    if ndc_ray:
        return False
    aabb = np.asarray(mask.aabb, np.float64).reshape(2, 3)
    shape = np.asarray(mask.volume.shape[::-1], np.float64)  # (X, Y, Z)
    voxel = (aabb[1] - aabb[0]) / np.maximum(shape - 1.0, 1.0)
    return (COARSE_STRIDE / 2) * float(step_size) <= float(voxel.min()) * (
        1.0 + 1e-6
    )


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
    return with_dilation(
        AlphaGridMask(
            aabb=jnp.asarray(entries["alphaMask.aabb"], jnp.float32).reshape(
                2, 3
            ),
            volume=jnp.asarray(bits, jnp.float32),
        )
    )
