"""Field-model tests: feature parity vs reference formulas, upsample/shrink,
regularizers, shading heads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tensorf_tpu.models import FIELD_MODELS, ModelConfig
from tensorf_tpu.models.shading import apply_shading, init_shading, mlp_in_dim
from tensorf_tpu.ops.freq_mask import FreeMasks

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
)
CFG_CP = CFG_VM.replace(
    model_name="TensorCP", density_n_comp=(8,), app_n_comp=(12,)
)
GRID = (10, 12, 14)


@pytest.mark.parametrize("cfg", [CFG_VM, CFG_CP], ids=["VMSplit", "CP"])
def test_init_shapes_and_features(cfg, rng):
    model = FIELD_MODELS[cfg.model_name]
    params = model.init(jax.random.PRNGKey(0), cfg, GRID)
    assert model.grid_size_of(params) == GRID

    xyz = jnp.asarray(rng.uniform(-1, 1, size=(33, 3)).astype(np.float32))
    den = model.density_feature(cfg, params, xyz, None)
    assert den.shape == (33,)
    app = model.app_feature(cfg, params, xyz, None)
    assert app.shape == (33, cfg.app_dim)
    assert np.isfinite(np.asarray(den)).all()
    assert np.isfinite(np.asarray(app)).all()


def test_vmsplit_density_matches_reference_contraction(rng):
    """Σ_axes Σ_r plane·line with the exact plane/line axis conventions."""
    cfg = CFG_VM
    model = FIELD_MODELS["TensorVMSplit"]
    params = model.init(jax.random.PRNGKey(1), cfg, GRID)

    # evaluate at grid nodes where bilinear = exact lookup
    gx, gy, gz = GRID
    ii = np.array([[2, 3, 5], [0, 0, 0], [9, 11, 13]], dtype=np.int64)
    xyz = (
        2.0 * ii / (np.array([gx, gy, gz]) - 1.0) - 1.0
    ).astype(np.float32)

    den = np.asarray(
        model.density_feature(cfg, params, jnp.asarray(xyz), None)
    )

    expected = np.zeros(3, dtype=np.float64)
    mat_mode = [(0, 1), (0, 2), (1, 2)]
    vec_mode = [2, 1, 0]
    for k in range(3):
        for i, (m0, m1) in enumerate(mat_mode):
            p = np.asarray(params["density_plane"][i])[ii[k, m1], ii[k, m0]]
            l = np.asarray(params["density_line"][i])[ii[k, vec_mode[i]]]
            expected[k] += np.sum(p * l)
    np.testing.assert_allclose(den, expected, rtol=1e-4, atol=1e-5)


def test_cp_density_is_line_product(rng):
    cfg = CFG_CP
    model = FIELD_MODELS["TensorCP"]
    params = model.init(jax.random.PRNGKey(2), cfg, GRID)
    gx, gy, gz = GRID
    ii = np.array([[4, 7, 3]], dtype=np.int64)
    xyz = (2.0 * ii / (np.array([gx, gy, gz]) - 1.0) - 1.0).astype(np.float32)
    den = np.asarray(model.density_feature(cfg, params, jnp.asarray(xyz), None))
    vec_mode = [2, 1, 0]
    prod = np.ones(cfg.density_n_comp[0])
    for i in range(3):
        prod = prod * np.asarray(params["density_line"][i])[ii[0, vec_mode[i]]]
    np.testing.assert_allclose(den[0], prod.sum(), rtol=1e-4, atol=1e-5)


def test_rank_masks_scale_features(rng):
    cfg = CFG_VM
    model = FIELD_MODELS["TensorVMSplit"]
    params = model.init(jax.random.PRNGKey(3), cfg, GRID)
    xyz = jnp.asarray(rng.uniform(-0.9, 0.9, size=(5, 3)).astype(np.float32))
    ones = tuple(jnp.ones(r) for r in cfg.density_n_comp)
    zeros = tuple(jnp.zeros(r) for r in cfg.density_n_comp)
    d_none = model.density_feature(cfg, params, xyz, None)
    d_ones = model.density_feature(cfg, params, xyz, ones)
    d_zero = model.density_feature(cfg, params, xyz, zeros)
    np.testing.assert_allclose(np.asarray(d_none), np.asarray(d_ones), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(d_zero), 0.0, atol=1e-7)
    # half-mask applies squared to density (both plane and line scaled)
    halves = tuple(0.5 * jnp.ones(r) for r in cfg.density_n_comp)
    d_half = model.density_feature(cfg, params, xyz, halves)
    np.testing.assert_allclose(
        np.asarray(d_half), 0.25 * np.asarray(d_none), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("cfg", [CFG_VM, CFG_CP], ids=["VMSplit", "CP"])
def test_upsample_preserves_function_at_nodes(cfg, rng):
    """align_corners upsample keeps values at original grid nodes."""
    model = FIELD_MODELS[cfg.model_name]
    params = model.init(jax.random.PRNGKey(4), cfg, GRID)
    new_grid = tuple(2 * g - 1 for g in GRID)  # node-preserving refinement
    up = model.upsample(cfg, params, new_grid)
    assert model.grid_size_of(up) == new_grid

    xyz = jnp.asarray(rng.uniform(-1, 1, size=(17, 3)).astype(np.float32))
    # snap to original grid nodes so both evaluate exactly
    g = np.asarray(GRID, np.float32)
    snapped = (
        np.round((np.asarray(xyz) + 1) / 2 * (g - 1)) / (g - 1) * 2 - 1
    ).astype(np.float32)
    d0 = model.density_feature(cfg, params, jnp.asarray(snapped), None)
    d1 = model.density_feature(cfg, up, jnp.asarray(snapped), None)
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=1e-3, atol=1e-4)


def test_shrink_crops_factors():
    cfg = CFG_VM
    model = FIELD_MODELS["TensorVMSplit"]
    params = model.init(jax.random.PRNGKey(5), cfg, GRID)
    t_l, b_r = (1, 2, 3), (8, 10, 12)
    sh = model.shrink(cfg, params, t_l, b_r)
    assert model.grid_size_of(sh) == (7, 8, 9)
    # plane 0 covers axes (0,1): rows = axis1 crop, cols = axis0 crop
    assert sh["density_plane"][0].shape == (8, 7, cfg.density_n_comp[0])
    np.testing.assert_array_equal(
        np.asarray(sh["density_plane"][0]),
        np.asarray(params["density_plane"][0])[2:10, 1:8],
    )


def test_legacy_tensorvm_shrink_and_upsample(rng):
    """Legacy TensorVM (shared factors): the per-axis tuple layout makes
    shrink expressible — the reference's own stacked-cubic TensorVM.shrink
    is broken (tensoRF.py:137); this pins the intended per-axis-crop
    semantics plus non-cubic init/upsample/grid_size_of consistency."""
    cfg = CFG_VM.replace(
        model_name="TensorVM", density_n_comp=(4,), app_n_comp=(6,)
    )
    model = FIELD_MODELS["TensorVM"]
    params = model.init(jax.random.PRNGKey(7), cfg, GRID)
    assert model.grid_size_of(params) == GRID

    t_l, b_r = (1, 2, 3), (8, 10, 12)
    sh = model.shrink(cfg, params, t_l, b_r)
    assert model.grid_size_of(sh) == (7, 8, 9)
    # plane 0 covers axes (0,1): rows = axis1 crop, cols = axis0 crop
    r_total = cfg.density_n_comp[0] + cfg.app_n_comp[0]
    assert sh["plane"][0].shape == (8, 7, r_total)
    np.testing.assert_array_equal(
        np.asarray(sh["plane"][0]), np.asarray(params["plane"][0])[2:10, 1:8]
    )
    np.testing.assert_array_equal(
        np.asarray(sh["line"][0]), np.asarray(params["line"][0])[3:12]
    )

    # node-preserving upsample keeps features at original grid nodes
    new_grid = tuple(2 * g - 1 for g in GRID)
    up = model.upsample(cfg, params, new_grid)
    assert model.grid_size_of(up) == new_grid
    g = np.asarray(GRID, np.float32)
    xyz = rng.uniform(-1, 1, size=(17, 3)).astype(np.float32)
    snapped = (
        np.round((xyz + 1) / 2 * (g - 1)) / (g - 1) * 2 - 1
    ).astype(np.float32)
    d0 = model.density_feature(cfg, params, jnp.asarray(snapped), None)
    d1 = model.density_feature(cfg, up, jnp.asarray(snapped), None)
    np.testing.assert_allclose(
        np.asarray(d0), np.asarray(d1), rtol=1e-3, atol=1e-4
    )


def test_regularizers_match_reference_semantics(rng):
    cfg = CFG_VM
    model = FIELD_MODELS["TensorVMSplit"]
    params = model.init(jax.random.PRNGKey(6), cfg, GRID)

    # L1 = Σ mean|plane| + mean|line| over density factors
    expect = sum(
        np.abs(np.asarray(params["density_plane"][i])).mean()
        + np.abs(np.asarray(params["density_line"][i])).mean()
        for i in range(3)
    )
    np.testing.assert_allclose(
        float(model.density_l1(params)), expect, rtol=1e-5
    )

    # TV parity vs the reference TVLoss formula (loss.py:120-141) evaluated
    # independently in torch: 2*(h_tv/count_h + w_tv/count_w), counts over
    # channel+spatial dims, on a (1, C, H, W) tensor.
    ref_total = 0.0
    for i in range(3):
        p = torch.from_numpy(
            np.asarray(params["density_plane"][i])
        ).permute(2, 0, 1)[None].double()
        _, C, H, W = p.shape
        h_tv = ((p[:, :, 1:, :] - p[:, :, :-1, :]) ** 2).sum()
        w_tv = ((p[:, :, :, 1:] - p[:, :, :, :-1]) ** 2).sum()
        ref_total += float(
            2 * (h_tv / (C * (H - 1) * W) + w_tv / (C * H * (W - 1)))
        ) * 1e-2
    np.testing.assert_allclose(
        float(model.tv_density(params)), ref_total, rtol=1e-4
    )

    # ortho: mean |off-diagonal gram| over density+app lines
    def off_diag(a):  # a: (L, R)
        g = a.T @ a
        r = g.shape[0]
        return (np.abs(g).sum() - np.abs(np.diag(g)).sum()) / (r * r - r)

    expect = sum(
        off_diag(np.asarray(l))
        for l in params["density_line"] + params["app_line"]
    )
    np.testing.assert_allclose(float(model.ortho_reg(params)), expect, rtol=1e-3)


# --- shading ----------------------------------------------------------------

@pytest.mark.parametrize("mode", ["MLP_Fea", "MLP_PE", "MLP", "SH", "RGB"])
def test_shading_modes(mode, rng):
    app_dim = 27 if mode == "SH" else (3 if mode == "RGB" else 9)
    cfg = CFG_VM.replace(shading_mode=mode, app_dim=app_dim)
    params = init_shading(jax.random.PRNGKey(7), cfg)
    M = 19
    pts = jnp.asarray(rng.uniform(-1, 1, (M, 3)).astype(np.float32))
    dirs = rng.normal(size=(M, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    feats = jnp.asarray(rng.normal(size=(M, app_dim)).astype(np.float32))
    rgb = apply_shading(cfg, params, pts, jnp.asarray(dirs), feats, FreeMasks())
    assert rgb.shape == (M, 3)
    assert np.isfinite(np.asarray(rgb)).all()
    if mode.startswith("MLP"):
        assert (np.asarray(rgb) >= 0).all() and (np.asarray(rgb) <= 1).all()


def test_mlp_matches_torch_reference(rng):
    """Load identical weights into the reference MLPRender_Fea and compare."""
    import sys

    sys.path.insert(0, "/root/reference")
    from models.mlp import MLPRender_Fea

    cfg = CFG_VM.replace(shading_mode="MLP_Fea")
    params = init_shading(jax.random.PRNGKey(8), cfg)

    ref = MLPRender_Fea(cfg.app_dim, cfg.view_pe, cfg.fea_pe, cfg.feature_c)
    with torch.no_grad():
        for t_layer, ours in zip((ref.mlp[0], ref.mlp[2], ref.mlp[4]),
                                 ("l1", "l2", "l3")):
            t_layer.weight.copy_(
                torch.from_numpy(np.asarray(params[ours]["w"]).T)
            )
            t_layer.bias.copy_(torch.from_numpy(np.asarray(params[ours]["b"])))

    M = 23
    pts = rng.uniform(-1, 1, (M, 3)).astype(np.float32)
    dirs = rng.normal(size=(M, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    feats = rng.normal(size=(M, cfg.app_dim)).astype(np.float32)

    ours = apply_shading(
        cfg, params, jnp.asarray(pts), jnp.asarray(dirs), jnp.asarray(feats),
        FreeMasks(),
    )
    with torch.no_grad():
        ref_rgb = ref(
            torch.from_numpy(pts),
            torch.from_numpy(dirs),
            torch.from_numpy(feats),
            mask={"pos": None, "view": None, "fea": None},
        )
    # fp32 matmul reassociation differs between XLA:CPU and torch; 5e-4 abs
    # on sigmoid outputs is numerical noise, not a semantic difference.
    np.testing.assert_allclose(
        np.asarray(ours), ref_rgb.numpy(), rtol=1e-3, atol=5e-4
    )
