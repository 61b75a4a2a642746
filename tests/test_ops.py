"""Unit tests for core math ops: SH, PE, raw2alpha, rays, freq masks, resize."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from tensorf_tpu.ops import (
    eval_sh_bases,
    positional_encoding,
    raw2alpha,
    get_ray_directions,
    get_ray_directions_blender,
    get_rays,
    ndc_rays_blender,
    aabb_intersect,
    sample_along_rays,
    freq_reg_mask,
    free_masks,
    resize_bilinear_align_corners,
    resize_linear_align_corners,
)


# --- SH -------------------------------------------------------------------

def _torch_sh_bases(deg, dirs):
    import sys

    sys.path.insert(0, "/root/reference")
    from models.sh import eval_sh_bases as ref_sh

    return ref_sh(deg, torch.from_numpy(dirs)).numpy()


def test_sh_bases_match_reference_formulas(rng):
    dirs = rng.normal(size=(64, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    for deg in range(5):
        ours = np.asarray(eval_sh_bases(deg, jnp.asarray(dirs)))
        ref = _torch_sh_bases(deg, dirs)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


# --- positional encoding ---------------------------------------------------

def test_positional_encoding_layout(rng):
    x = rng.normal(size=(7, 3)).astype(np.float32)
    freqs = 4
    enc = np.asarray(positional_encoding(jnp.asarray(x), freqs))
    assert enc.shape == (7, 2 * 3 * freqs)
    # dim-major layout: first channel is sin(x * 2^0)
    np.testing.assert_allclose(enc[:, 0], np.sin(x[:, 0]), rtol=1e-6)
    np.testing.assert_allclose(enc[:, 1], np.sin(2 * x[:, 0]), rtol=1e-6)
    np.testing.assert_allclose(enc[:, freqs], np.sin(x[:, 1]), rtol=1e-6)
    np.testing.assert_allclose(
        enc[:, 3 * freqs], np.cos(x[:, 0]), rtol=1e-6, atol=1e-6
    )


# --- raw2alpha --------------------------------------------------------------

def test_raw2alpha_matches_reference(rng):
    sigma = np.abs(rng.normal(size=(5, 33))).astype(np.float32)
    dist = np.full_like(sigma, 0.01)

    alpha, weights, bg = raw2alpha(jnp.asarray(sigma), jnp.asarray(dist))

    t_sigma, t_dist = torch.from_numpy(sigma), torch.from_numpy(dist)
    ref_alpha = 1.0 - torch.exp(-t_sigma * t_dist)
    T = torch.cumprod(
        torch.cat([torch.ones(5, 1), 1.0 - ref_alpha + 1e-10], -1), -1
    )
    ref_w = ref_alpha * T[:, :-1]

    np.testing.assert_allclose(
        np.asarray(alpha), ref_alpha.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(weights), ref_w.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(bg), T[:, -1:].numpy(), rtol=1e-4, atol=1e-5
    )


# --- rays -------------------------------------------------------------------

def test_ray_directions_conventions():
    d = get_ray_directions(4, 6, [100.0, 100.0])
    assert d.shape == (4, 6, 3)
    assert np.all(d[..., 2] == 1.0)
    db = get_ray_directions_blender(4, 6, [100.0, 100.0])
    assert np.all(db[..., 2] == -1.0)
    np.testing.assert_allclose(db[..., 0], d[..., 0])
    np.testing.assert_allclose(db[..., 1], -d[..., 1])


def test_get_rays_rotation():
    dirs = get_ray_directions_blender(2, 2, [50.0, 50.0])
    c2w = np.eye(4, dtype=np.float32)[:3]
    c2w[:, 3] = [1.0, 2.0, 3.0]
    rays_o, rays_d = get_rays(dirs, c2w)
    assert rays_o.shape == (4, 3) and rays_d.shape == (4, 3)
    np.testing.assert_allclose(rays_o[0], [1, 2, 3])
    np.testing.assert_allclose(rays_d, dirs.reshape(-1, 3), rtol=1e-6)


def test_aabb_intersect_and_sampling():
    aabb = jnp.asarray([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]])
    rays_o = jnp.asarray([[0.0, 0.0, -4.0], [5.0, 5.0, -4.0]])
    rays_d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    hit = aabb_intersect(rays_o, rays_d, aabb)
    assert bool(hit[0]) and not bool(hit[1])

    xyz, z, valid = sample_along_rays(
        rays_o, rays_d, aabb, 2.0, 6.0, 0.05, 100, None
    )
    assert xyz.shape == (2, 100, 3)
    # first ray enters the box at z=2.5 -> t_min clamped to 2.5
    assert np.isclose(float(z[0, 0]), 2.5)
    assert bool(valid[0, 0])
    # all samples of the missing ray are invalid
    assert not bool(valid[1].any())


def test_ndc_rays_projective_invariant(rng):
    """Analytic correctness: for the blender NDC mapping, the projected ray
    traced at t' = t*dz/(oz+t*dz) must land exactly on the perspective
    projection of the world point o + t*d (o already on the near plane).
    This pins the full formula without importing reference code."""
    H, W, focal, near = 8.0, 8.0, 10.0, 1.0
    rays_o = rng.normal(size=(16, 3)).astype(np.float64)
    rays_o[:, 2] = -np.abs(rays_o[:, 2]) - 1.0
    rays_d = rng.normal(size=(16, 3)).astype(np.float64)
    rays_d[:, 2] = -np.abs(rays_d[:, 2]) - 0.5

    o, d = ndc_rays_blender(H, W, focal, near, rays_o, rays_d)
    o, d = np.asarray(o), np.asarray(d)

    # world origin shifted to the near plane (what the function does first)
    t0 = -(near + rays_o[:, 2]) / rays_d[:, 2]
    o_shift = rays_o + t0[:, None] * rays_d

    def ndc_project(p):
        return np.stack(
            [
                -(2 * focal / W) * p[:, 0] / p[:, 2],
                -(2 * focal / H) * p[:, 1] / p[:, 2],
                1.0 + 2.0 * near / p[:, 2],
            ],
            axis=-1,
        )

    for t in (0.0, 0.7, 3.0, 50.0):
        world = o_shift + t * rays_d
        t_prime = t * rays_d[:, 2] / (o_shift[:, 2] + t * rays_d[:, 2])
        np.testing.assert_allclose(
            o + t_prime[:, None] * d, ndc_project(world), rtol=1e-9, atol=1e-9
        )
    # t=0 maps to the projected near-plane point, t→inf approaches o2→1
    far_pt = o + 1.0 * d
    assert np.allclose(far_pt[:, 2], 1.0)


# --- FreeNeRF masks ---------------------------------------------------------

def test_freq_reg_mask_curriculum():
    L, total = 16, 100
    m0 = np.asarray(freq_reg_mask(L, 0, total, ratio=1.0))
    # at step 0 the first dv=4 channels are visible
    assert np.allclose(m0[:4], 1 - 1e-8)
    assert np.allclose(m0[4:8], 0, atol=1e-6)  # fractional band is 0 at t=0
    m_half = np.asarray(freq_reg_mask(L, 50, total, ratio=1.0))
    assert m_half[: 4 * 2].min() > 0.9  # more visible
    m_done = np.asarray(freq_reg_mask(L, 100, total, ratio=1.0))
    np.testing.assert_allclose(m_done, np.ones(L))
    # monotone non-decreasing visibility over steps
    prev = m0
    for s in (25, 50, 75, 99):
        cur = np.asarray(freq_reg_mask(L, s, total))
        assert np.all(cur >= prev - 1e-6)
        prev = cur


def test_freq_reg_mask_ratio_limits_spectrum():
    L, total = 16, 100
    m = np.asarray(freq_reg_mask(L, 99, total, ratio=0.5))
    # only the first L*0.5 = 8 channels ever become visible
    assert m[:8].min() > 0.5
    assert m[9:].max() < 1e-6


def test_freq_reg_mask_jits_with_traced_step():
    f = jax.jit(lambda s: freq_reg_mask(16, s, 100))
    out = f(jnp.asarray(10))
    assert out.shape == (16,)


def test_free_masks_structure():
    m = free_masks(12, 12, 108, (16, 16, 16), (48, 48, 48), 5, 100, 0.8, True)
    assert m.pos.shape == (12,)
    assert m.fea.shape == (108,)
    assert len(m.den) == 3 and m.den[0].shape == (16,)
    assert len(m.app) == 3 and m.app[0].shape == (48,)


# --- align_corners resize ----------------------------------------------------

def test_resize_bilinear_matches_torch(rng):
    src = rng.normal(size=(9, 7, 5)).astype(np.float32)
    ours = np.asarray(
        resize_bilinear_align_corners(jnp.asarray(src), 17, 13)
    )
    t = torch.from_numpy(src).permute(2, 0, 1)[None]
    ref = F.interpolate(t, size=(17, 13), mode="bilinear", align_corners=True)
    ref = ref[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_resize_linear_matches_torch(rng):
    src = rng.normal(size=(9, 4)).astype(np.float32)
    ours = np.asarray(resize_linear_align_corners(jnp.asarray(src), 21))
    t = torch.from_numpy(src).T[None, :, :, None]  # (1,C,L,1)
    ref = F.interpolate(t, size=(21, 1), mode="bilinear", align_corners=True)
    ref = ref[0, :, :, 0].T.numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)
