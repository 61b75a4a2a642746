"""Parity of the TPU grid samplers vs torch F.grid_sample (CPU reference).

The reference's hottest op is F.grid_sample(align_corners=True) over factor
planes/lines (models/tensoRF.py:216-218) and 3-D volumes
(models/tensorBase.py:43); these tests pin bit-level semantics including
zeros padding for out-of-range coordinates.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from tensorf_tpu.ops import grid_sample_1d, grid_sample_2d, grid_sample_3d


def test_grid_sample_2d_matches_torch(rng):
    H, W, C, M = 17, 23, 5, 301
    plane = rng.normal(size=(H, W, C)).astype(np.float32)
    # include out-of-range coords to exercise zeros padding
    coords = rng.uniform(-1.3, 1.3, size=(M, 2)).astype(np.float32)

    ours = grid_sample_2d(jnp.asarray(plane), jnp.asarray(coords))

    t_plane = torch.from_numpy(plane).permute(2, 0, 1)[None]  # (1,C,H,W)
    t_grid = torch.from_numpy(coords).view(1, M, 1, 2)
    ref = F.grid_sample(t_plane, t_grid, align_corners=True)  # (1,C,M,1)
    ref = ref[0, :, :, 0].T.numpy()  # (M, C)

    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-5)


def test_grid_sample_1d_matches_torch_line(rng):
    L, C, M = 31, 4, 257
    line = rng.normal(size=(L, C)).astype(np.float32)
    coord = rng.uniform(-1.2, 1.2, size=(M,)).astype(np.float32)

    ours = grid_sample_1d(jnp.asarray(line), jnp.asarray(coord))

    # Reference treats lines as (1, C, L, 1) sampled at grid (0, y)
    # (models/tensoRF.py:211-219).
    t_line = torch.from_numpy(line).T[None, :, :, None]  # (1,C,L,1)
    grid = torch.stack(
        [torch.zeros(M), torch.from_numpy(coord)], dim=-1
    ).view(1, M, 1, 2)
    ref = F.grid_sample(t_line, grid, align_corners=True)[0, :, :, 0].T.numpy()

    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-5)


def test_grid_sample_3d_matches_torch(rng):
    D, H, W, M = 9, 11, 13, 199
    vol = rng.uniform(size=(D, H, W)).astype(np.float32)
    coords = rng.uniform(-1.2, 1.2, size=(M, 3)).astype(np.float32)

    ours = grid_sample_3d(jnp.asarray(vol), jnp.asarray(coords))

    t_vol = torch.from_numpy(vol)[None, None]  # (1,1,D,H,W)
    grid = torch.from_numpy(coords).view(1, M, 1, 1, 3)
    ref = F.grid_sample(t_vol, grid, align_corners=True).view(-1).numpy()

    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-5)


def test_grid_sample_2d_gradients_flow(rng):
    H, W, C, M = 8, 8, 3, 64
    plane = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-1, 1, size=(M, 2)).astype(np.float32))

    def loss(p):
        return jnp.sum(grid_sample_2d(p, coords) ** 2)

    g = jax.grad(loss)(plane)
    assert g.shape == plane.shape
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_grid_sample_2d_grad_matches_torch(rng):
    """Backward (scatter-add into the plane) parity vs torch autograd."""
    H, W, C, M = 12, 10, 4, 150
    plane = rng.normal(size=(H, W, C)).astype(np.float32)
    coords = rng.uniform(-1.1, 1.1, size=(M, 2)).astype(np.float32)
    cotangent = rng.normal(size=(M, C)).astype(np.float32)

    def ours_loss(p):
        return jnp.sum(grid_sample_2d(p, jnp.asarray(coords)) * cotangent)

    g_ours = np.asarray(jax.grad(ours_loss)(jnp.asarray(plane)))

    t_plane = torch.from_numpy(plane).permute(2, 0, 1)[None].requires_grad_()
    t_grid = torch.from_numpy(coords).view(1, M, 1, 2)
    out = F.grid_sample(t_plane, t_grid, align_corners=True)[0, :, :, 0].T
    (out * torch.from_numpy(cotangent)).sum().backward()
    g_ref = t_plane.grad[0].permute(1, 2, 0).numpy()

    np.testing.assert_allclose(g_ours, g_ref, rtol=1e-4, atol=1e-4)


def test_banked_scatter_add_kernel_interpret_mode():
    """ops/pallas/scatter_add2 (measured experiment; not in the hot path)
    must stay correct: out[idx[m]] += g[m] with banked accumulators."""
    from tensorf_tpu.ops.pallas.scatter_add2 import scatter_add_banked

    rng = np.random.default_rng(0)
    M, R, C = 2048, 256, 128
    idx = jnp.asarray(rng.integers(0, R, size=M).astype(np.int32))
    g = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32))
    want = np.zeros((R, C), np.float32)
    np.add.at(want, np.asarray(idx), np.asarray(g))
    for nb in (1, 2):
        got = np.asarray(
            scatter_add_banked(idx, g, R, chan_block=128, n_banks=nb)
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
