"""Renderer tests: shape stability, masking semantics, top-K equivalence,
alpha-mask gating, chunked eval."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorf_tpu.models import FIELD_MODELS, ModelConfig
from tensorf_tpu.models.alpha_mask import AlphaGridMask
from tensorf_tpu.ops.freq_mask import FreeMasks
from tensorf_tpu.render import (
    make_render_fn,
    render_chunked,
    render_rays,
)

CFG = ModelConfig(
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
GRID = (12, 12, 12)
AABB = jnp.asarray([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]])


def _rays(rng, n):
    """Inward-looking rays from a sphere of radius 4."""
    o = rng.normal(size=(n, 3))
    o = 4.0 * o / np.linalg.norm(o, axis=-1, keepdims=True)
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    return jnp.asarray(np.concatenate([o, d], -1).astype(np.float32))


@pytest.fixture(scope="module")
def setup():
    model = FIELD_MODELS[CFG.model_name]
    params = model.init(jax.random.PRNGKey(0), CFG, GRID)
    return model, params


def test_render_shapes_and_ranges(setup, rng):
    model, params = setup
    rays = _rays(rng, 64)
    out = render_rays(
        model, CFG, params, None, rays, jax.random.PRNGKey(1), FreeMasks(),
        aabb=AABB, step_size=0.05, n_samples=100,
        is_train=True, white_bg=True, ndc_ray=False,
    )
    assert out.rgb.shape == (64, 3)
    assert out.depth.shape == (64,)
    assert out.weights.shape == (64, 100)
    r = np.asarray(out.rgb)
    assert (r >= 0).all() and (r <= 1).all()
    assert np.isfinite(np.asarray(out.depth)).all()


def test_white_bg_on_empty_scene(setup, rng):
    """With ~zero density, white background dominates."""
    model, params = setup
    # density_shift=-3 softplus gives small but nonzero sigma; use rays that
    # miss the box -> all samples invalid -> sigma exactly 0 -> pure white.
    o = np.tile(np.asarray([[5.0, 5.0, -4.0]]), (8, 1))
    d = np.tile(np.asarray([[0.0, 0.0, 1.0]]), (8, 1))
    rays = jnp.asarray(np.concatenate([o, d], -1).astype(np.float32))
    out = render_rays(
        model, CFG, params, None, rays, None, FreeMasks(),
        aabb=AABB, step_size=0.05, n_samples=64,
        is_train=False, white_bg=True, ndc_ray=False,
    )
    np.testing.assert_allclose(np.asarray(out.rgb), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.acc), 0.0, atol=1e-6)


def test_alpha_mask_gates_density(setup, rng):
    model, params = setup
    rays = _rays(rng, 32)
    zero_mask = AlphaGridMask(
        aabb=AABB, volume=jnp.zeros((8, 8, 8), jnp.float32)
    )
    out = render_rays(
        model, CFG, params, zero_mask, rays, None, FreeMasks(),
        aabb=AABB, step_size=0.05, n_samples=64,
        is_train=False, white_bg=True, ndc_ray=False,
    )
    np.testing.assert_allclose(np.asarray(out.acc), 0.0, atol=1e-6)

    ones_mask = AlphaGridMask(
        aabb=AABB, volume=jnp.ones((8, 8, 8), jnp.float32)
    )
    out_open = render_rays(
        model, CFG, params, ones_mask, rays, None, FreeMasks(),
        aabb=AABB, step_size=0.05, n_samples=64,
        is_train=False, white_bg=True, ndc_ray=False,
    )
    out_none = render_rays(
        model, CFG, params, None, rays, None, FreeMasks(),
        aabb=AABB, step_size=0.05, n_samples=64,
        is_train=False, white_bg=True, ndc_ray=False,
    )
    np.testing.assert_allclose(
        np.asarray(out_open.rgb), np.asarray(out_none.rgb), atol=1e-6
    )


def test_top_k_shading_matches_full(setup, rng):
    """With K large enough to cover all above-threshold weights, the top-K
    compaction is exact."""
    model, params = setup
    rays = _rays(rng, 32)
    kw = dict(
        aabb=AABB, step_size=0.05, n_samples=96,
        is_train=False, white_bg=True, ndc_ray=False,
    )
    full = render_rays(
        model, CFG, params, None, rays, None, FreeMasks(), **kw
    )
    topk = render_rays(
        model, CFG, params, None, rays, None, FreeMasks(),
        shade_top_k=95, **kw
    )
    n_above = int(
        (np.asarray(full.weights) > CFG.ray_march_weight_thres).sum(-1).max()
    )
    assert n_above <= 95
    np.testing.assert_allclose(
        np.asarray(full.rgb), np.asarray(topk.rgb), rtol=1e-5, atol=1e-5
    )


def test_render_chunked_pads_tail(setup, rng):
    model, params = setup
    rays = np.asarray(_rays(rng, 100))
    fn = make_render_fn(
        model, CFG, step_size=0.05, n_samples=64,
        white_bg=True, ndc_ray=False,
    )
    rgb, depth, nv, _ = render_chunked(
        fn, params, None, rays, AABB, chunk=32
    )
    assert rgb.shape == (100, 3)
    assert depth.shape == (100,)

    # chunked result == single-shot result
    fn_big = make_render_fn(
        model, CFG, step_size=0.05, n_samples=64,
        white_bg=True, ndc_ray=False,
    )
    rgb2, _, _, _ = render_chunked(
        fn_big, params, None, rays, AABB, chunk=128
    )
    np.testing.assert_allclose(rgb, rgb2, rtol=1e-5, atol=1e-5)


def test_render_grad_through_everything(setup, rng):
    model, params = setup
    rays = _rays(rng, 16)
    target = jnp.ones((16, 3)) * 0.5

    def loss(p):
        out = render_rays(
            model, CFG, p, None, rays, jax.random.PRNGKey(0), FreeMasks(),
            aabb=AABB, step_size=0.05, n_samples=64,
            is_train=True, white_bg=True, ndc_ray=False,
        )
        return jnp.mean((out.rgb - target) ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # grids and MLP all receive gradient
    assert float(jnp.abs(grads["density_plane"][0]).sum()) > 0
    assert float(jnp.abs(grads["app_plane"][0]).sum()) > 0
    assert float(jnp.abs(grads["render"]["l1"]["w"]).sum()) > 0
    assert float(jnp.abs(grads["basis"]).sum()) > 0


def test_render_frame_single_dispatch_matches_chunked(rng):
    """Whole-frame lax.map renderer == host-chunked renderer."""
    from tensorf_tpu.models import FIELD_MODELS, ModelConfig
    from tensorf_tpu.render.chunked import (
        make_render_fn,
        render_chunked,
        render_frame,
    )

    cfg = ModelConfig(
        model_name="TensorVMSplit", density_n_comp=(4, 4, 4),
        app_n_comp=(6, 6, 6), app_dim=9, shading_mode="MLP_Fea",
        pos_pe=2, view_pe=2, fea_pe=2, feature_c=32, density_shift=-3.0,
    )
    model = FIELD_MODELS[cfg.model_name]
    params = model.init(jax.random.PRNGKey(0), cfg, (10, 10, 10))
    aabb = jnp.asarray([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]])
    o = rng.normal(size=(70, 3))
    o = 4.0 * o / np.linalg.norm(o, axis=-1, keepdims=True)
    rays = np.concatenate(
        [o, -o / np.linalg.norm(o, axis=-1, keepdims=True)], -1
    ).astype(np.float32)

    static = dict(
        model=model, cfg=cfg, step_size=0.06, n_samples=64,
        white_bg=True, ndc_ray=False, shade_top_k=None, fused=True,
        sample_budget=None,
    )
    fn = make_render_fn(
        model, cfg, step_size=0.06, n_samples=64, white_bg=True,
        ndc_ray=False,
    )
    rgb_c, depth_c, _, _ = render_chunked(fn, params, None, rays, aabb, chunk=32)
    rgb_f, depth_f = render_frame(static, params, None, rays, aabb, tile=32)
    np.testing.assert_allclose(rgb_f, rgb_c, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(depth_f, depth_c, rtol=1e-5, atol=1e-5)


def test_grid_dtype_bf16_renders_close_to_fp32(rng):
    """grid_dtype=bfloat16 (reduced-precision factor sampling) must stay
    within quantization distance of the fp32 render."""
    from tensorf_tpu.models import FIELD_MODELS, ModelConfig
    from tensorf_tpu.ops.freq_mask import FreeMasks
    from tensorf_tpu.render import render_rays

    base = ModelConfig(
        model_name="TensorVMSplit", density_n_comp=(4, 4, 4),
        app_n_comp=(6, 6, 6), app_dim=9, shading_mode="MLP_Fea",
        pos_pe=2, view_pe=2, fea_pe=2, feature_c=32, density_shift=-3.0,
    )
    model = FIELD_MODELS[base.model_name]
    params = model.init(jax.random.PRNGKey(1), base, (10, 12, 14))
    o = rng.normal(size=(32, 3))
    o = 4.0 * o / np.linalg.norm(o, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate(
        [o, -o / np.linalg.norm(o, axis=-1, keepdims=True)], -1
    ).astype(np.float32))
    kw = dict(
        aabb=jnp.asarray([[-1.5] * 3, [1.5] * 3]), step_size=0.06,
        n_samples=64, is_train=False, white_bg=True, ndc_ray=False,
    )
    a = render_rays(model, base, params, None, rays, None, FreeMasks(), **kw)
    b = render_rays(
        model, base.replace(grid_dtype="bfloat16"), params, None, rays,
        None, FreeMasks(), **kw
    )
    err = float(jnp.abs(a.rgb - b.rgb).max())
    assert err < 0.03, err  # bf16 factor quantization, not divergence


@pytest.mark.parametrize(
    "model_name", ["TensorVMSplit", "TensorCP", "TensorVM"]
)
def test_line_dtype_bf16_renders_close_to_fp32(rng, model_name):
    """line_dtype=bfloat16 quantizes ONLY the one-hot-lerp line matrices
    (plane tables stay fp32) — interpolation weights lose ~2^-9 relative
    precision, so the render must stay within quantization distance."""
    from tensorf_tpu.models import FIELD_MODELS, ModelConfig
    from tensorf_tpu.ops.freq_mask import FreeMasks
    from tensorf_tpu.render import render_rays

    base = ModelConfig(
        model_name=model_name, density_n_comp=(4, 4, 4),
        app_n_comp=(6, 6, 6), app_dim=9, shading_mode="MLP_Fea",
        pos_pe=2, view_pe=2, fea_pe=2, feature_c=32, density_shift=-3.0,
    )
    model = FIELD_MODELS[base.model_name]
    params = model.init(jax.random.PRNGKey(1), base, (10, 12, 14))
    o = rng.normal(size=(32, 3))
    o = 4.0 * o / np.linalg.norm(o, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate(
        [o, -o / np.linalg.norm(o, axis=-1, keepdims=True)], -1
    ).astype(np.float32))
    kw = dict(
        aabb=jnp.asarray([[-1.5] * 3, [1.5] * 3]), step_size=0.06,
        n_samples=64, is_train=False, white_bg=True, ndc_ray=False,
    )
    a = render_rays(model, base, params, None, rays, None, FreeMasks(), **kw)
    b = render_rays(
        model, base.replace(line_dtype="bfloat16"), params, None, rays,
        None, FreeMasks(), **kw
    )
    err = float(jnp.abs(a.rgb - b.rgb).max())
    assert err < 0.02, err  # only lerp weights quantized; tighter than grid bf16
