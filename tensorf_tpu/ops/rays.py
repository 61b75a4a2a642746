"""Ray generation, NDC projection, AABB tests and ray sampling.

JAX counterparts of the reference geometry layer
(dataLoader/ray_utils.py:24-126) and the model-side samplers
(models/tensorBase.py:178-208).  Everything here is fixed-shape and
jittable; the per-ray stratified jitter is driven by an explicit PRNG key
instead of torch global RNG.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Pixel-grid ray directions (host-side, numpy — computed once per dataset).
# ---------------------------------------------------------------------------

def _pixel_grid(H: int, W: int) -> Tuple[np.ndarray, np.ndarray]:
    """Pixel-center grid (i over width, j over height), +0.5 centering.

    Equivalent to kornia's create_meshgrid(normalized=False) + 0.5 used at
    dataLoader/ray_utils.py:34.
    """
    j, i = np.meshgrid(
        np.arange(H, dtype=np.float32) + 0.5,
        np.arange(W, dtype=np.float32) + 0.5,
        indexing="ij",
    )
    return i, j


def get_ray_directions(H, W, focal, center=None) -> np.ndarray:
    """OpenCV-convention camera-space directions (H, W, 3): +z forward."""
    i, j = _pixel_grid(H, W)
    cent = center if center is not None else [W / 2, H / 2]
    return np.stack(
        [(i - cent[0]) / focal[0], (j - cent[1]) / focal[1], np.ones_like(i)],
        axis=-1,
    )


def get_ray_directions_blender(H, W, focal, center=None) -> np.ndarray:
    """Blender/OpenGL convention (H, W, 3): y up, -z forward."""
    i, j = _pixel_grid(H, W)
    cent = center if center is not None else [W / 2, H / 2]
    return np.stack(
        [(i - cent[0]) / focal[0], -(j - cent[1]) / focal[1], -np.ones_like(i)],
        axis=-1,
    )


def get_rays(directions, c2w) -> Tuple[np.ndarray, np.ndarray]:
    """Camera-space dirs (H, W, 3) + pose (3/4, 4) -> world rays (H*W, 3) x2.

    Directions are intentionally NOT normalized (reference keeps the
    un-normalized rotation product; dataLoader/ray_utils.py:80).
    """
    directions = np.asarray(directions)
    c2w = np.asarray(c2w)
    rays_d = directions @ c2w[:3, :3].T
    rays_o = np.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o.reshape(-1, 3).copy(), rays_d.reshape(-1, 3)


# ---------------------------------------------------------------------------
# NDC projection (LLFF forward-facing scenes).
# ---------------------------------------------------------------------------

def ndc_rays_blender(H, W, focal, near, rays_o, rays_d):
    """Blender-convention NDC projection (dataLoader/ray_utils.py:90-107)."""
    xp = jnp if isinstance(rays_o, jax.Array) else np
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (W / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (H / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -1.0 / (W / (2.0 * focal)) * (
        rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2]
    )
    d1 = -1.0 / (H / (2.0 * focal)) * (
        rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2]
    )
    d2 = -2.0 * near / rays_o[..., 2]

    return xp.stack([o0, o1, o2], -1), xp.stack([d0, d1, d2], -1)


def ndc_rays(H, W, focal, near, rays_o, rays_d):
    """OpenCV-convention NDC projection (dataLoader/ray_utils.py:109-126)."""
    xp = jnp if isinstance(rays_o, jax.Array) else np
    t = (near - rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = 1.0 / (W / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = 1.0 / (H / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 - 2.0 * near / rays_o[..., 2]

    d0 = 1.0 / (W / (2.0 * focal)) * (
        rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2]
    )
    d1 = 1.0 / (H / (2.0 * focal)) * (
        rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2]
    )
    d2 = 2.0 * near / rays_o[..., 2]

    return xp.stack([o0, o1, o2], -1), xp.stack([d0, d1, d2], -1)


# ---------------------------------------------------------------------------
# Generic sampling helpers (public surface parity with
# dataLoader/ray_utils.py — some are vestigial in the trainer but part of
# the reference's API: sample_pdf :129, dda :174, ray_marcher :184,
# depth2dist :9, ndc2dist :18, ndc_bbox :269).
# ---------------------------------------------------------------------------

def depth2dist(z_vals, cos_angle):
    """Per-sample distances from depths, scaled by ray angle cosine."""
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1
    )
    return dists * cos_angle[..., None]


def ndc2dist(ndc_pts, cos_angle):
    dists = jnp.linalg.norm(ndc_pts[:, 1:] - ndc_pts[:, :-1], axis=-1)
    return jnp.concatenate([dists, 1e10 * cos_angle[..., None]], axis=-1)


def sample_pdf(bins, weights, n_samples: int, det: bool = False, key=None):
    """Inverse-CDF hierarchical sampling (dataLoader/ray_utils.py:129-171)."""
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)

    if det or key is None:
        u = jnp.linspace(0.0, 1.0, n_samples)
        u = jnp.broadcast_to(u, (*cdf.shape[:-1], n_samples))
    else:
        u = jax.random.uniform(key, (*cdf.shape[:-1], n_samples))

    inds = jax.vmap(lambda c, q: jnp.searchsorted(c, q, side="right"))(
        cdf, u
    )
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)

    cdf_b = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_a = jnp.take_along_axis(cdf, above, axis=-1)
    bins_b = jnp.take_along_axis(bins, jnp.minimum(below, bins.shape[-1] - 1), axis=-1)
    bins_a = jnp.take_along_axis(bins, jnp.minimum(above, bins.shape[-1] - 1), axis=-1)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b)


def dda(rays_o, rays_d, bbox_3d):
    """Slab entry/exit with the reference's epsilon convention
    (ray_utils.py:174-181)."""
    inv = 1.0 / (rays_d + 1e-6)
    t0 = (bbox_3d[:1] - rays_o) * inv
    t1 = (bbox_3d[1:] - rays_o) * inv
    t_min = jnp.max(jnp.minimum(t0, t1), axis=-1, keepdims=True)
    t_max = jnp.min(jnp.maximum(t0, t1), axis=-1, keepdims=True)
    return t_min, t_max


def ray_marcher(
    rays,
    n_samples: int = 64,
    lindisp: bool = False,
    perturb: float = 0.0,
    bbox_3d=None,
    key=None,
):
    """Generic stratified sampler over (o, d, near, far) ray packets
    (ray_utils.py:184-228)."""
    rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
    near, far = rays[:, 6:7], rays[:, 7:8]
    if bbox_3d is not None:
        near, far = dda(rays_o, rays_d, bbox_3d)

    z_steps = jnp.linspace(0, 1, n_samples)
    if not lindisp:
        z_vals = near * (1 - z_steps) + far * z_steps
    else:
        z_vals = 1.0 / (1.0 / near * (1 - z_steps) + 1.0 / far * z_steps)
    z_vals = jnp.broadcast_to(z_vals, (rays.shape[0], n_samples))

    if perturb > 0 and key is not None:
        mids = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
        upper = jnp.concatenate([mids, z_vals[:, -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[:, :1], mids], axis=-1)
        u = perturb * jax.random.uniform(key, z_vals.shape)
        z_vals = lower + (upper - lower) * u

    xyz = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    return xyz, rays_o, rays_d, z_vals


def ndc_bbox(all_rays) -> np.ndarray:
    """Tight bbox over NDC ray extents (ray_utils.py:269-275)."""
    rays = np.asarray(all_rays).reshape(-1, all_rays.shape[-1])
    near = rays[:, :3]
    far = rays[:, :3] + rays[:, 3:6]
    lo = np.minimum(near.min(0), far.min(0))
    hi = np.maximum(near.max(0), far.max(0))
    print(f"===> ndc bbox near/far extents: {lo} {hi}")
    return np.stack([lo, hi])


# ---------------------------------------------------------------------------
# AABB slab tests + fixed-count stratified sampling (jittable).
# ---------------------------------------------------------------------------

def aabb_entry_exit(
    rays_o: jax.Array, rays_d: jax.Array, aabb: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Slab-method entry/exit distances (t_min, t_max), each (B,).

    Matches the bbox ray filter (models/tensorBase.py:271-277): zero
    direction components are replaced by 1e-6.
    """
    vec = jnp.where(rays_d == 0, jnp.full_like(rays_d, 1e-6), rays_d)
    rate_a = (aabb[1] - rays_o) / vec
    rate_b = (aabb[0] - rays_o) / vec
    t_min = jnp.max(jnp.minimum(rate_a, rate_b), axis=-1)
    t_max = jnp.min(jnp.maximum(rate_a, rate_b), axis=-1)
    return t_min, t_max


def aabb_intersect(rays_o, rays_d, aabb) -> jax.Array:
    """Boolean (B,) — does the ray's infinite line segment hit the box."""
    t_min, t_max = aabb_entry_exit(rays_o, rays_d, aabb)
    return t_max > t_min


def sample_lattice(
    rays_o: jax.Array,
    rays_d: jax.Array,
    aabb: jax.Array,
    near: float,
    far: float,
    key: Optional[jax.Array],
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Per-ray sample-lattice parameters (t_min (B,), jitter u (B, 1)|None).

    The non-NDC lattice is affine in the sample index — z(i) = t_min +
    (i + u) * step — so any subset of it can be re-materialized from
    indices alone (see lattice_z).  Deterministic in `key`: callers may
    re-derive the identical lattice instead of carrying (B, N) arrays
    through compaction.
    """
    t_min, _ = aabb_entry_exit(rays_o, rays_d, aabb)
    t_min = jnp.clip(t_min, near, far)
    u = None
    if key is not None:
        u = jax.random.uniform(
            key, (rays_o.shape[0], 1), dtype=rays_o.dtype
        )
    return t_min, u


def lattice_z(
    t_min: jax.Array,
    u: Optional[jax.Array],
    idx: jax.Array,
    step_size: float,
) -> jax.Array:
    """Sample depths at (float) lattice indices idx (B, K) -> z (B, K).

    Bit-identical to sample_along_rays' z_vals at the same integer
    indices: the expression t_min + (idx + u) * step matches op-for-op
    (int indices < 2^24 are exact in f32)."""
    rng = idx if u is None else idx + u
    return t_min[:, None] + rng * step_size


def sample_along_rays(
    rays_o: jax.Array,
    rays_d: jax.Array,
    aabb: jax.Array,
    near: float,
    far: float,
    step_size: float,
    n_samples: int,
    key: Optional[jax.Array],
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fixed-count stratified samples from the bbox entry point.

    Reference semantics (models/tensorBase.py:189-208): t_min from the slab
    test clamped to [near, far]; sample depths t_min + step*(arange + u)
    with one uniform u per ray at train time (key != None); per-sample
    validity = point inside the aabb.

    Returns (xyz (B, N, 3), z_vals (B, N), ray_valid (B, N) bool).
    """
    B = rays_o.shape[0]
    t_min, u = sample_lattice(rays_o, rays_d, aabb, near, far, key)
    idx = jnp.broadcast_to(
        jnp.arange(n_samples, dtype=rays_o.dtype)[None, :], (1, n_samples)
    )
    z_vals = lattice_z(t_min, u, idx, step_size)  # (B, N)

    xyz = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    outside = jnp.any((xyz < aabb[0]) | (xyz > aabb[1]), axis=-1)
    return xyz, jnp.broadcast_to(z_vals, (B, n_samples)), ~outside


def sample_along_rays_ndc(
    rays_o: jax.Array,
    rays_d: jax.Array,
    aabb: jax.Array,
    near: float,
    far: float,
    n_samples: int,
    key: Optional[jax.Array],
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """linspace(near, far) samples with train-time per-sample jitter.

    Reference: models/tensorBase.py:178-187.
    """
    B = rays_o.shape[0]
    interpx = jnp.linspace(near, far, n_samples, dtype=rays_o.dtype)[None, :]
    if key is not None:
        interpx = interpx + jax.random.uniform(
            key, (B, n_samples), dtype=rays_o.dtype
        ) * ((far - near) / n_samples)
    xyz = rays_o[:, None, :] + rays_d[:, None, :] * interpx[..., None]
    outside = jnp.any((xyz < aabb[0]) | (xyz > aabb[1]), axis=-1)
    return xyz, jnp.broadcast_to(interpx, (B, n_samples)), ~outside
