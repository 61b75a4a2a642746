"""Round-5 device-resident serving: the window-bits path.

Contracts under test:
  * the count pass's packed window-hit bits are a conservative SUPERSET
    of the in-render per-sample candidate windows (render/volume.py
    window-bits docstring) and never exceed the tier the padded count
    sizes — so bucket renders stay exact by construction;
  * the resident driver (rays/bits on device, int32 index uploads)
    reproduces the uniform chunked render exactly, including when the
    rays arrive as a device array from rays_from_pose;
  * rays_from_pose matches the host get_rays (ops/rays.py:57-67).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorf_tpu.models import FIELD_MODELS, ModelConfig
from tensorf_tpu.models.alpha_mask import (
    COARSE_STRIDE,
    AlphaGridMask,
    sample_alpha_gate_coarse,
    with_dilation,
)
from tensorf_tpu.ops.rays import get_rays, sample_along_rays
from tensorf_tpu.render.chunked import (
    make_render_fn,
    rays_from_pose,
    render_chunked,
    render_chunked_stratified,
)
from tensorf_tpu.render.culling import count_ray_candidates_chord_bits

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
STEP = 0.05
NS = 128


def _rays(rng, n):
    o = rng.normal(size=(n, 3))
    o = 4.0 * o / np.linalg.norm(o, axis=-1, keepdims=True)
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    return np.concatenate([o, d], -1).astype(np.float32)


@pytest.fixture(scope="module")
def setup():
    model = FIELD_MODELS[CFG.model_name]
    params = model.init(jax.random.PRNGKey(0), CFG, GRID)
    rng = np.random.default_rng(7)
    vol = (rng.uniform(size=(10, 10, 10)) < 0.35).astype(np.float32)
    mask = with_dilation(AlphaGridMask(aabb=AABB, volume=jnp.asarray(vol)))
    return model, params, mask


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def test_count_bits_superset_of_render_windows(setup, rng):
    """Unpacked count-pass bits, masked by the closed-form chord, must
    cover every window the in-render per-sample coarse gate would select
    — and the padded count (which sizes the tier) must cover the bits'
    own window count, so the bits path can never overflow its budget."""
    _, _, mask = setup
    rays = np.concatenate([_rays(rng, 200), _rays(rng, 40)], axis=0)
    counts, chords, bits_dev, rays_dev = count_ray_candidates_chord_bits(
        rays, mask, np.asarray(AABB), STEP, (2.0, 6.0),
        n_samples=NS, tile=64,
    )
    M = rays.shape[0]
    bits = np.asarray(bits_dev)[:M]
    ghits = np.unpackbits(bits, axis=-1, bitorder="little").astype(bool)
    S = COARSE_STRIDE
    G = -(-NS // S)
    starts = np.arange(ghits.shape[1]) * S
    gkeep_bits = ghits & (starts[None, :] < chords[:, None]) \
        & (starts[None, :] < NS)

    # the in-render candidate windows (legacy path semantics)
    xyz, _, valid = sample_along_rays(
        jnp.asarray(rays[:, :3]), jnp.asarray(rays[:, 3:6]), AABB,
        2.0, 6.0, STEP, NS, None,
    )
    cand = np.asarray(valid & sample_alpha_gate_coarse(mask, xyz))
    pad = G * S - NS
    cand_p = np.pad(cand, ((0, 0), (0, pad)))
    gkeep_render = cand_p.reshape(M, G, S).any(axis=-1)

    # superset: every render-selected window is in the bits selection
    missing = gkeep_render & ~gkeep_bits[:, :G]
    assert not missing.any(), f"{missing.sum()} windows dropped"
    # tier cover: padded count >= the bits' own (padded) window count
    assert (S * gkeep_bits.sum(axis=-1) <= np.maximum(counts, 0)).all()
    # zero-skip exactness: count==0 implies no render-selected window
    assert not gkeep_render[counts == 0].any()


def test_resident_driver_accepts_device_rays(setup, rng):
    """The stratified driver must render identically from a host array
    and from a device-resident ray store (the rays_from_pose path)."""
    model, params, mask = setup
    rays = np.concatenate([_rays(rng, 220), _rays(rng, 30)], axis=0)
    common = dict(
        step_size=STEP, n_samples=NS, white_bg=True, ndc_ray=False,
        chunk=128,
    )
    rgb_h, depth_h, _, of_h = render_chunked_stratified(
        model, CFG, params, mask, rays, AABB, **common
    )
    rgb_d, depth_d, _, of_d = render_chunked_stratified(
        model, CFG, params, mask, jnp.asarray(rays), AABB, **common
    )
    assert of_h == of_d == 0.0
    np.testing.assert_array_equal(rgb_h, rgb_d)
    np.testing.assert_array_equal(depth_h, depth_d)
    # and both equal the uniform chunked render
    fn = make_render_fn(
        model, CFG, step_size=STEP, n_samples=NS, white_bg=True,
        ndc_ray=False,
    )
    rgb_u, depth_u, _, _ = render_chunked(
        fn, params, mask, rays, AABB, chunk=128
    )
    np.testing.assert_allclose(rgb_h, rgb_u, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(depth_h, depth_u, rtol=1e-4, atol=1e-4)


def test_rays_from_pose_matches_get_rays(rng):
    directions = rng.normal(size=(64, 3)).astype(np.float32)
    c2w = np.eye(4, dtype=np.float32)[:3]
    c2w[:3, :3] = np.linalg.qr(rng.normal(size=(3, 3)))[0].astype(
        np.float32
    )
    c2w[:3, 3] = [0.3, -0.2, 4.0]
    o, d = get_rays(directions.reshape(8, 8, 3), c2w)
    dev = np.asarray(
        rays_from_pose(jnp.asarray(directions), jnp.asarray(c2w))
    )
    np.testing.assert_allclose(dev[:, :3], o, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(dev[:, 3:], d, rtol=1e-6, atol=1e-6)
