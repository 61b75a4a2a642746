"""Fused (footprint-packed) gather path: exact parity with the reference
semantics, and the sample-budget compaction exactness contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorf_tpu.models import FIELD_MODELS, ModelConfig
from tensorf_tpu.ops import (
    footprint_sample_1d,
    footprint_sample_2d,
    grid_sample_1d,
    grid_sample_2d,
    make_footprint_1d,
    make_footprint_2d,
)
from tensorf_tpu.ops.freq_mask import FreeMasks
from tensorf_tpu.render import render_rays

CFG_VM = ModelConfig(
    model_name="TensorVMSplit",
    density_n_comp=(4, 4, 4),
    app_n_comp=(6, 6, 6),
    app_dim=9,
    shading_mode="MLP_Fea",
    pos_pe=2,
    view_pe=2,
    fea_pe=2,
    feature_c=32,
    density_shift=-3.0,
)
CFG_CP = CFG_VM.replace(
    model_name="TensorCP", density_n_comp=(8,), app_n_comp=(12,)
)
GRID = (10, 12, 14)
AABB = jnp.asarray([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]])


def test_footprint_sample_2d_matches_grid_sample(rng):
    H, W, C = 13, 17, 5
    plane = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-1, 1, size=(301, 2)).astype(np.float32))
    ref = grid_sample_2d(plane, coords)
    fp = make_footprint_2d(plane)
    out = footprint_sample_2d(fp, H, W, coords)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)
    # boundary coords exactly at +-1
    edges = jnp.asarray(
        [[-1, -1], [1, 1], [-1, 1], [1, -1], [0, 1], [1, 0]], jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(footprint_sample_2d(fp, H, W, edges)),
        np.asarray(grid_sample_2d(plane, edges)),
        rtol=1e-5,
        atol=1e-6,
    )


def test_footprint_sample_1d_matches_grid_sample(rng):
    L, C = 19, 4
    line = jnp.asarray(rng.normal(size=(L, C)).astype(np.float32))
    coord = jnp.asarray(rng.uniform(-1, 1, size=(257,)).astype(np.float32))
    ref = grid_sample_1d(line, coord)
    out = footprint_sample_1d(make_footprint_1d(line), L, coord)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize(
    "cfg", [CFG_VM, CFG_CP, CFG_VM.replace(
        model_name="TensorVM", density_n_comp=(4,), app_n_comp=(6,))],
    ids=["VMSplit", "CP", "VM"],
)
def test_fused_features_match_separate(cfg, rng):
    model = FIELD_MODELS[cfg.model_name]
    grid = (10, 10, 10) if cfg.model_name == "TensorVM" else GRID
    params = model.init(jax.random.PRNGKey(0), cfg, grid)
    xyz = jnp.asarray(rng.uniform(-1, 1, size=(123, 3)).astype(np.float32))
    den_ref = model.density_feature(cfg, params, xyz, None)
    app_ref = model.app_feature(cfg, params, xyz, None)
    den, app = model.fused_features(cfg, params, xyz, None, None)
    np.testing.assert_allclose(np.asarray(den), np.asarray(den_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(app), np.asarray(app_ref), rtol=1e-4, atol=1e-5)


def test_fused_features_with_rank_masks(rng):
    cfg = CFG_VM
    model = FIELD_MODELS[cfg.model_name]
    params = model.init(jax.random.PRNGKey(1), cfg, GRID)
    xyz = jnp.asarray(rng.uniform(-0.9, 0.9, size=(41, 3)).astype(np.float32))
    den_mask = tuple(
        jnp.asarray(rng.uniform(size=(r,)).astype(np.float32))
        for r in cfg.density_n_comp
    )
    app_mask = tuple(
        jnp.asarray(rng.uniform(size=(r,)).astype(np.float32))
        for r in cfg.app_n_comp
    )
    den_ref = model.density_feature(cfg, params, xyz, den_mask)
    app_ref = model.app_feature(cfg, params, xyz, app_mask)
    den, app = model.fused_features(cfg, params, xyz, den_mask, app_mask)
    np.testing.assert_allclose(np.asarray(den), np.asarray(den_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(app), np.asarray(app_ref), rtol=1e-4, atol=1e-5)


def _rays(rng, n):
    o = rng.normal(size=(n, 3))
    o = 4.0 * o / np.linalg.norm(o, axis=-1, keepdims=True)
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    return jnp.asarray(np.concatenate([o, d], -1).astype(np.float32))


def test_fused_render_matches_unfused(rng):
    model = FIELD_MODELS[CFG_VM.model_name]
    params = model.init(jax.random.PRNGKey(2), CFG_VM, GRID)
    rays = _rays(rng, 32)
    kw = dict(
        aabb=AABB, step_size=0.06, n_samples=80,
        is_train=False, white_bg=True, ndc_ray=False,
    )
    a = render_rays(model, CFG_VM, params, None, rays, None, FreeMasks(),
                    fused=False, **kw)
    b = render_rays(model, CFG_VM, params, None, rays, None, FreeMasks(),
                    fused=True, **kw)
    np.testing.assert_allclose(np.asarray(a.rgb), np.asarray(b.rgb), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.depth), np.asarray(b.depth), rtol=1e-4, atol=1e-4)


def test_sample_budget_exact_when_budget_covers_alive(rng):
    """Rays from radius 4 into a +-1.5 box: <= ~52 in-box samples at
    step 0.06/n=100 — a budget of 80 must reproduce the full render."""
    model = FIELD_MODELS[CFG_VM.model_name]
    params = model.init(jax.random.PRNGKey(3), CFG_VM, GRID)
    rays = _rays(rng, 32)
    kw = dict(
        aabb=AABB, step_size=0.06, n_samples=100,
        is_train=False, white_bg=True, ndc_ray=False,
    )
    full = render_rays(model, CFG_VM, params, None, rays, None, FreeMasks(), **kw)
    alive = int(np.asarray(full.sigma > 0).sum(-1).max())
    assert alive <= 80, alive
    capped = render_rays(model, CFG_VM, params, None, rays, None, FreeMasks(),
                         sample_budget=80, **kw)
    np.testing.assert_allclose(
        np.asarray(full.rgb), np.asarray(capped.rgb), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(full.depth), np.asarray(capped.depth), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(full.acc), np.asarray(capped.acc), rtol=1e-4, atol=1e-5
    )


def test_fused_render_gradients(rng):
    model = FIELD_MODELS[CFG_VM.model_name]
    params = model.init(jax.random.PRNGKey(4), CFG_VM, GRID)
    rays = _rays(rng, 16)
    target = jnp.full((16, 3), 0.4)

    def loss(p, fused):
        out = render_rays(
            model, CFG_VM, p, None, rays, jax.random.PRNGKey(0), FreeMasks(),
            aabb=AABB, step_size=0.06, n_samples=64,
            is_train=True, white_bg=True, ndc_ray=False, fused=fused,
        )
        return jnp.mean((out.rgb - target) ** 2)

    g_fused = jax.grad(lambda p: loss(p, True))(params)
    g_ref = jax.grad(lambda p: loss(p, False))(params)
    for a, b in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5
        )


def test_sample_budget_overflow_is_reported_and_error_bounded(rng):
    """Over-budget regime: budget_overflow_frac must be nonzero and the
    render must degrade gracefully (nearest samples kept; only the far
    tail is dropped, so rgb error stays bounded by the dropped weight)."""
    model = FIELD_MODELS[CFG_VM.model_name]
    params = model.init(jax.random.PRNGKey(3), CFG_VM, GRID)
    rays = _rays(rng, 32)
    kw = dict(
        aabb=AABB, step_size=0.06, n_samples=100,
        is_train=False, white_bg=True, ndc_ray=False,
    )
    full = render_rays(model, CFG_VM, params, None, rays, None, FreeMasks(), **kw)
    assert float(full.budget_overflow_frac) == 0.0  # no budget -> no overflow
    # deliberately too-small budget: every ray has >16 in-box samples
    capped = render_rays(model, CFG_VM, params, None, rays, None, FreeMasks(),
                         sample_budget=16, **kw)
    assert float(capped.budget_overflow_frac) > 0.5
    # kept samples are the nearest 16 -> dropped mass is the transmittance
    # remaining after them; rgb error is bounded by that dropped weight
    # (plus the white-bg fill of the same mass).
    kept_w = np.asarray(capped.weights).sum(-1)
    full_w = np.asarray(full.weights).sum(-1)
    dropped = np.clip(full_w - kept_w, 0.0, 1.0)
    err = np.abs(np.asarray(capped.rgb) - np.asarray(full.rgb)).max(-1)
    assert np.all(err <= dropped + 1e-4), (err.max(), dropped.max())


def test_budget_with_alpha_mask_uses_conservative_coarse_gate(rng):
    """With an alpha mask + budget, candidate selection runs on the strided
    coarse gate; the result must still match the unbudgeted masked render
    whenever the budget covers every candidate."""
    from tensorf_tpu.models.alpha_mask import (
        AlphaGridMask, sample_alpha_gate, sample_alpha_gate_coarse,
        with_dilation,
    )

    model = FIELD_MODELS[CFG_VM.model_name]
    params = model.init(jax.random.PRNGKey(5), CFG_VM, GRID)
    rays = _rays(rng, 32)
    vol = (rng.uniform(size=(16, 16, 16)) < 0.2).astype(np.float32)
    mask = with_dilation(AlphaGridMask(aabb=AABB, volume=jnp.asarray(vol)))

    # conservativeness: coarse gate >= exact gate at every lattice sample
    from tensorf_tpu.ops.rays import sample_along_rays
    xyz, _, valid = sample_along_rays(
        rays[:, :3], rays[:, 3:6], AABB, 2.0, 6.0, 0.06, 100, None
    )
    exact = np.asarray(sample_alpha_gate(mask, xyz)) > 0
    coarse = np.asarray(sample_alpha_gate_coarse(mask, xyz))
    inb = np.asarray(valid)
    assert not np.any(exact & inb & ~coarse), "coarse gate culled an exact-alive sample"

    kw = dict(
        aabb=AABB, step_size=0.06, n_samples=100,
        is_train=False, white_bg=True, ndc_ray=False,
    )
    full = render_rays(model, CFG_VM, params, mask, rays, None, FreeMasks(), **kw)
    capped = render_rays(model, CFG_VM, params, mask, rays, None, FreeMasks(),
                         sample_budget=90, **kw)
    if float(capped.budget_overflow_frac) == 0.0:
        np.testing.assert_allclose(
            np.asarray(full.rgb), np.asarray(capped.rgb), rtol=1e-4, atol=1e-5
        )
