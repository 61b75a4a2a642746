"""Reference-checkpoint import: a .th trained by the reference loads as a
native checkpoint with numerically identical fields.

Builds the REFERENCE's own torch models (/root/reference/models/tensoRF.py),
saves via the reference's TensorBase.save (tensorBase.py:160-168), converts
with utils/import_torch.py, and pins feature/shading parity on non-cubic
grids (axis-order mistakes cannot hide)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tensorf_tpu.models import FIELD_MODELS
from tensorf_tpu.models.shading import apply_shading
from tensorf_tpu.ops.freq_mask import FreeMasks
from tensorf_tpu.utils.ckpt import load_checkpoint, load_opt_leaves
from tensorf_tpu.utils.import_torch import convert

sys.path.insert(0, "/root/reference")

GRID = [8, 10, 12]
AABB = [[-1.5, -1.2, -1.0], [1.5, 1.2, 1.0]]

REF_ARGS = dict(
    step_ratio=0.5,
    fea2denseAct="softplus",
    density_n_comp=[2, 3, 4],
    app_n_comp=[3, 4, 5],
    app_dim=6,
    density_shift=-10.0,
    distance_scale=25.0,
    alphaMask_thres=1e-4,
    shadingMode="MLP_Fea",
    pos_pe=2,
    view_pe=2,
    fea_pe=2,
    featureC=16,
)


def _ref_model(model_name: str, seed: int = 3):
    from models.tensoRF import TensorCP, TensorVM, TensorVMSplit

    torch.manual_seed(seed)
    aabb = torch.tensor(np.asarray(AABB, np.float32))
    if model_name == "TensorVMSplit":
        return TensorVMSplit(REF_ARGS, aabb, list(GRID), near_far=[2.0, 6.0],
                             device="cpu")
    if model_name == "TensorCP":
        args = dict(REF_ARGS, density_n_comp=[4, 4, 4], app_n_comp=[5, 5, 5])
        # Reference bug (SURVEY §2.11-13): TensorCP.__init__ forwards its
        # positional `device` into TensorBase's near_far slot
        # (tensoRF.py:331-332), so passing near_far= at all raises
        # TypeError — the reference's own keyword construction
        # (train.py:227-247) cannot build a TensorCP.  Construct the only
        # way that works; the saved ckpt then carries near_far='cpu',
        # exactly what a real migrating user's CP checkpoint holds (the
        # importer must fall back, see test below).
        return TensorCP(args, aabb, list(GRID), "cpu")
    # legacy TensorVM: int ranks, cubic grid (init_svd_volume takes one res)
    args = dict(REF_ARGS, density_n_comp=3, app_n_comp=4)
    return TensorVM(args, aabb, [8, 8, 8], [2.0, 6.0], "cpu")


def _attach_alpha_mask(model):
    from models.tensorBase import AlphaGridMask

    torch.manual_seed(11)
    vol = (torch.rand(5, 6, 7) > 0.5).float()
    model.alphaMask = AlphaGridMask(
        "cpu", torch.tensor(np.asarray(AABB, np.float32)), vol
    )
    return vol.numpy()


def _convert_roundtrip(tmp_path, model_name, with_mask=True):
    ref = _ref_model(model_name)
    vol = _attach_alpha_mask(ref) if with_mask else None
    th_path = str(tmp_path / f"{model_name}.th")
    ref.save(th_path)
    npz_path = convert(th_path, str(tmp_path / f"{model_name}.npz"))
    return ref, vol, th_path, npz_path


@pytest.mark.parametrize("model_name", ["TensorVMSplit", "TensorCP"])
def test_import_feature_parity(tmp_path, rng, model_name):
    """Converted params produce the reference model's exact density and
    appearance features (reference tensoRF.py:207-263 / :358-415)."""
    ref, vol, th_path, npz_path = _convert_roundtrip(tmp_path, model_name)
    cfg, params, aabb, grid_size, alpha_mask, _ = load_checkpoint(npz_path)

    assert cfg.model_name == model_name
    assert tuple(grid_size) == tuple(GRID)
    np.testing.assert_array_equal(aabb, np.asarray(AABB, np.float32))
    # VMSplit: genuine near_far round-trips; CP: the authentic ckpt carries
    # near_far='cpu' (device-into-near_far ctor bug) and the importer falls
    # back — see test_near_far_fallback for the distinguishing unit test
    assert cfg.near_far == (2.0, 6.0)

    xyz = rng.uniform(-1, 1, size=(57, 3)).astype(np.float32)
    model = FIELD_MODELS[model_name]
    den = np.asarray(model.density_feature(cfg, params, jnp.asarray(xyz), None))
    app = np.asarray(model.app_feature(cfg, params, jnp.asarray(xyz), None))
    with torch.no_grad():
        t_xyz = torch.from_numpy(xyz)
        ref_den = ref.compute_densityfeature(t_xyz, None).numpy()
        ref_app = ref.compute_appfeature(t_xyz, None).numpy()
    np.testing.assert_allclose(den, ref_den, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(app, ref_app, rtol=1e-4, atol=1e-5)

    # shading MLP weights: same rgb from the same features/dirs
    dirs = rng.normal(size=(57, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    rgb = np.asarray(
        apply_shading(cfg, params["render"], jnp.asarray(xyz),
                      jnp.asarray(dirs), jnp.asarray(ref_app), FreeMasks())
    )
    with torch.no_grad():
        ref_rgb = ref.renderModule(
            t_xyz, torch.from_numpy(dirs), torch.from_numpy(ref_app),
            mask={"pos": None, "view": None, "fea": None},
        ).numpy()
    np.testing.assert_allclose(rgb, ref_rgb, rtol=1e-3, atol=5e-4)

    # alpha mask: identical bits, (Z, Y, X) layout, reference aabb
    assert alpha_mask is not None
    np.testing.assert_array_equal(
        np.asarray(alpha_mask.volume), vol.astype(np.float32)
    )
    np.testing.assert_array_equal(
        np.asarray(alpha_mask.aabb), np.asarray(AABB, np.float32)
    )


def test_import_legacy_tensorvm(tmp_path, rng):
    """Legacy TensorVM stacked plane/line coefs map onto our per-axis
    tuples (reference tensoRF.py:6-30)."""
    ref, _, th_path, npz_path = _convert_roundtrip(
        tmp_path, "TensorVM", with_mask=False
    )
    cfg, params, aabb, grid_size, alpha_mask, _ = load_checkpoint(npz_path)
    assert cfg.model_name == "TensorVM"
    assert tuple(grid_size) == (8, 8, 8)
    assert alpha_mask is None

    xyz = rng.uniform(-1, 1, size=(41, 3)).astype(np.float32)
    model = FIELD_MODELS["TensorVM"]
    den = np.asarray(model.density_feature(cfg, params, jnp.asarray(xyz), None))
    app = np.asarray(model.app_feature(cfg, params, jnp.asarray(xyz), None))
    with torch.no_grad():
        t_xyz = torch.from_numpy(xyz)
        ref_den = ref.compute_densityfeature(t_xyz).numpy()
        ref_app = ref.compute_appfeature(t_xyz).numpy()
    np.testing.assert_allclose(den, ref_den, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(app, ref_app, rtol=1e-4, atol=1e-5)


def test_near_far_fallback():
    """Non-numeric near_far (the TensorCP device-into-near_far bug) falls
    back to (2, 6); numeric values round-trip exactly."""
    from tensorf_tpu.utils.import_torch import _near_far

    assert _near_far({"near_far": "cpu"}) == (2.0, 6.0)
    assert _near_far({"near_far": "cuda"}) == (2.0, 6.0)
    assert _near_far({"near_far": [0.5, 7.5]}) == (0.5, 7.5)
    assert _near_far({"near_far": torch.tensor([1.0, 3.0])}) == (1.0, 3.0)


def test_th_loads_directly_everywhere(tmp_path, rng):
    """.th paths work without offline conversion: load_checkpoint dispatches
    (utils/ckpt.py), load_opt_leaves reports no optimizer state."""
    ref, vol, th_path, npz_path = _convert_roundtrip(tmp_path, "TensorVMSplit")
    direct = load_checkpoint(th_path)
    via_npz = load_checkpoint(npz_path)
    assert direct[0] == via_npz[0]  # identical ModelConfig
    for a, b in zip(
        jax.tree_util.tree_leaves(direct[1]),
        jax.tree_util.tree_leaves(via_npz[1]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert load_opt_leaves(th_path) is None
