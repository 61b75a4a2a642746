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
    t_min, _ = aabb_entry_exit(rays_o, rays_d, aabb)
    t_min = jnp.clip(t_min, near, far)

    rng = jnp.arange(n_samples, dtype=rays_o.dtype)[None, :]  # (1, N)
    if key is not None:
        rng = rng + jax.random.uniform(key, (B, 1), dtype=rays_o.dtype)
    z_vals = t_min[:, None] + rng * step_size  # (B, N)

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
