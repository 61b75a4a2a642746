"""Checkpoint roundtrip, mesh export, config frontends, misc utils."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorf_tpu.config.frontends import load_config, parse_txt_config
from tensorf_tpu.config.schema import TrainConfig, model_config_from
from tensorf_tpu.models import FIELD_MODELS, ModelConfig
from tensorf_tpu.models.alpha_mask import AlphaGridMask
from tensorf_tpu.models.config import (
    GridGeometry,
    cal_n_samples,
    n_to_reso,
    n_voxel_schedule,
)
from tensorf_tpu.utils.ckpt import load_checkpoint, save_checkpoint


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
)


def test_checkpoint_roundtrip(tmp_path, rng):
    model = FIELD_MODELS[CFG.model_name]
    params = model.init(jax.random.PRNGKey(0), CFG, (10, 12, 14))
    mask = AlphaGridMask(
        aabb=jnp.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]]),
        volume=jnp.asarray(
            (rng.uniform(size=(6, 7, 8)) > 0.5).astype(np.float32)
        ),
    )
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(
        path, CFG, jax.device_get(params),
        np.array([[-1.5] * 3, [1.5] * 3]), (10, 12, 14), mask,
    )
    cfg2, params2, aabb2, grid2, mask2, _ = load_checkpoint(path)
    assert cfg2 == CFG
    assert grid2 == (10, 12, 14)
    np.testing.assert_allclose(aabb2, [[-1.5] * 3, [1.5] * 3])
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(mask.volume) > 0.5, np.asarray(mask2.volume) > 0.5
    )
    np.testing.assert_allclose(np.asarray(mask2.aabb), np.asarray(mask.aabb))


def test_mesh_export_sphere(tmp_path):
    from tensorf_tpu.eval.mesh import (
        convert_alpha_samples_to_ply,
        marching_iso_surface,
    )

    n = 24
    g = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    vol = 1.0 - np.sqrt(X**2 + Y**2 + Z**2)
    verts, tris = marching_iso_surface(vol, 0.5)
    assert len(verts) > 100 and len(tris) > 100
    radii = np.linalg.norm(verts / (n - 1) * 2 - 1, axis=-1)
    np.testing.assert_allclose(radii.mean(), 0.5, atol=0.01)

    out = str(tmp_path / "sphere.ply")
    convert_alpha_samples_to_ply(
        vol, out, np.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]]), level=0.5
    )
    assert os.path.exists(out)
    with open(out, "rb") as f:
        head = f.read(64)
    assert head.startswith(b"ply")


def test_txt_config_parses_reference_format(tmp_path):
    txt = tmp_path / "cfg.txt"
    txt.write_text(
        """
# comment
dataset_name = blender
n_iters = 3000   # inline comment
batch_size = 1024
step_ratio = 0.5
upsamp_list = [2000,3000,4000,5500,7000]
n_lamb_sigma = [16]
free_reg = True
model_name = TensorCP
L1_weight_inital = 8e-5
overwrt = True
"""
    )
    cfg = load_config(str(txt))
    assert cfg.dataset_name == "blender"
    assert cfg.n_iters == 3000
    assert cfg.upsamp_list == [2000, 3000, 4000, 5500, 7000]
    assert cfg.n_lamb_sigma == [16]
    assert cfg.free_reg is True
    assert cfg.model_name == "TensorCP"
    assert abs(cfg.L1_weight_inital - 8e-5) < 1e-12
    assert cfg.overwrt is True


def test_reference_lego_txt_parses():
    vals = parse_txt_config("/root/reference/configs/lego.txt")
    assert vals["model_name"] == "TensorCP"
    assert vals["N_voxel_init"] == 2097156
    assert vals["train_idxs"] == [0, 6, 12, 18, 24, 30, 36, 42]
    cfg = load_config("/root/reference/configs/lego.txt")
    assert cfg.N_train_imgs == 8
    assert cfg.resolved_train_images() == [0, 6, 12, 18, 24, 30, 36, 42]


def test_yaml_config_parses_reference_yaml():
    cfg = load_config("/root/reference/configs/config.yaml")
    assert cfg.model_name == "TensorVMSplit"
    assert cfg.n_iters == 3000
    assert cfg.batch_size == 1024
    assert cfg.free_reg is True
    assert cfg.upsamp_list == [2000, 3000, 4000, 5500, 7000]
    assert cfg.train_images == [0, 6, 12, 18, 24, 30, 36, 42]
    mc = model_config_from(cfg)
    assert mc.density_n_comp == (16, 16, 16)
    assert mc.shading_mode == "MLP"
    assert mc.alpha_mask_thres == 0.001  # alphaMask_thres wins over default


def test_grid_geometry_matches_reference_derivation():
    geo = GridGeometry.create(
        [[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]], (128, 128, 128), 0.5
    )
    # units = 3/127; step = mean(units)*0.5; nSamples = diag/step + 1
    assert abs(geo.step_size - (3 / 127) * 0.5) < 1e-6
    expected_n = int(np.sqrt(27) / geo.step_size) + 1
    assert geo.n_samples == expected_n

    assert n_to_reso(128**3, [[-1.5] * 3, [1.5] * 3]) == (128, 128, 128)
    assert cal_n_samples((128, 128, 128), 0.5) == int(
        np.linalg.norm([128, 128, 128]) / 0.5
    )
    sched = n_voxel_schedule(128**3, 300**3, 5)
    assert len(sched) == 5
    assert sched[-1] == 300**3
    assert all(sched[i] < sched[i + 1] for i in range(4))
