"""End-to-end: full pipeline on a procedurally generated blender scene.

Exercises the loader, bbox ray filtering, the jitted train step with the
intended schedule (alpha-mask update + shrink + upsample + optimizer reset),
mid-train eval, checkpointing, render_test outputs and mesh export — the
whole reconstruction() surface on a tiny scene, on CPU.
"""

import os

import numpy as np
import pytest

from tensorf_tpu.config.schema import TrainConfig
from tensorf_tpu.data.synthetic import make_synthetic_blender_scene


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scene"))
    make_synthetic_blender_scene(root, n_train=10, n_test=2, wh=(40, 40))
    return root


def test_blender_loader_reads_synthetic_scene(scene):
    from tensorf_tpu.data.blender import BlenderDataset

    ds = BlenderDataset(scene, split="train", wh=(40, 40))
    assert ds.all_rays.shape == (10 * 40 * 40, 6)
    assert ds.all_rgbs.shape == (10 * 40 * 40, 3)
    assert ds.white_bg
    # ray directions are normalized, origins at radius 4
    d = ds.all_rays[:, 3:6]
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(
        np.linalg.norm(ds.all_rays[:, :3], axis=-1), 4.0, atol=1e-4
    )
    # center pixel of each image should hit the sphere (alpha=1)
    stacked = BlenderDataset(scene, split="train", is_stack=True, wh=(40, 40))
    assert stacked.all_rgbs.shape == (10, 40, 40, 3)
    center = stacked.all_masks[:, 20, 20]
    assert (center > 0.5).all()


def test_few_shot_selection(scene):
    from tensorf_tpu.data.blender import BlenderDataset

    ds = BlenderDataset(scene, split="train", num_images=[0, 3, 5], wh=(40, 40))
    assert ds.all_rays.shape[0] == 3 * 40 * 40
    ds_int = BlenderDataset(scene, split="train", num_images=4, wh=(40, 40))
    assert ds_int.all_rays.shape[0] == 4 * 40 * 40


@pytest.mark.slow
def test_stratified_equals_uniform_psnr(scene, tmp_path):
    """Stratified batching is a scheduling optimization: a full short run
    with stratify=1 must land within noise of stratify=0 at the same
    settings (VERDICT r2 #1 done-criterion).  Draws differ (different
    sampler), so equivalence is statistical: ~1 dB at 300 iters."""
    from tensorf_tpu.train.loop import reconstruction

    def run(stratify, name):
        cfg = TrainConfig(
            expname=name,
            basedir=str(tmp_path / name),
            datadir=scene,
            dataset_name="blender",
            model_name="TensorVMSplit",
            shadingMode="MLP_Fea",
            n_iters=300,
            batch_size=512,
            N_voxel_init=24**3,
            N_voxel_final=40**3,
            upsamp_list=[150],
            update_AlphaMask_list=[200, 260],
            n_lamb_sigma=[4, 4, 4],
            n_lamb_sh=[8, 8, 8],
            data_dim_color=9,
            featureC=32,
            pos_pe=2,
            view_pe=2,
            fea_pe=2,
            lr_init=0.05,
            lr_basis=2e-3,
            density_shift=-3.0,
            L1_weight_inital=8e-5,
            TV_weight_density=0.01,
            TV_weight_app=0.01,
            Ortho_weight=0.01,
            stratify=stratify,
            stratify_render=stratify,
            vis_every=0,
            train_vis_every=0,
            render_test=1,
            progress_refresh_rate=100,
            n_devices=1,
        )
        from functools import partial

        from tensorf_tpu.data import dataset_dict

        orig = dataset_dict["blender"]
        dataset_dict["blender"] = partial(orig, wh=(40, 40))
        try:
            ckpt = reconstruction(cfg)
        finally:
            dataset_dict["blender"] = orig
        mean = np.loadtxt(
            f"{os.path.dirname(ckpt)}/imgs_test_all/mean.txt"
        ).reshape(-1)
        return float(mean[0])

    psnr_strat = run(1, "strat")
    psnr_unif = run(0, "unif")
    assert psnr_strat > 18.0 and psnr_unif > 18.0, (psnr_strat, psnr_unif)
    assert abs(psnr_strat - psnr_unif) < 1.0, (psnr_strat, psnr_unif)


@pytest.mark.slow
def test_full_reconstruction_pipeline(scene, tmp_path):
    """Short full run with every schedule event; PSNR must beat the
    white-image baseline by a clear margin and artifacts must exist."""
    from tensorf_tpu.train.loop import export_mesh, reconstruction

    cfg = TrainConfig(
        expname="e2e",
        basedir=str(tmp_path / "log"),
        datadir=scene,
        dataset_name="blender",
        model_name="TensorVMSplit",
        shadingMode="MLP_Fea",
        n_iters=300,
        batch_size=512,
        N_voxel_init=24**3,
        N_voxel_final=40**3,
        upsamp_list=[150],
        update_AlphaMask_list=[200, 260],
        n_lamb_sigma=[4, 4, 4],
        n_lamb_sh=[8, 8, 8],
        data_dim_color=9,
        featureC=32,
        pos_pe=2,
        view_pe=2,
        fea_pe=2,
        lr_init=0.05,
        lr_basis=2e-3,
        density_shift=-3.0,  # faster density warm-up for a 300-step test
        L1_weight_inital=8e-5,
        L1_weight_rest=4e-5,
        TV_weight_density=0.01,
        TV_weight_app=0.01,
        Ortho_weight=0.01,
        free_reg=True,
        free_decomp=True,
        freq_reg_ratio=0.8,
        occ_reg_loss_mult=0.01,
        occ_reg_range=8,
        vis_every=250,
        train_vis_every=250,
        save_ckpt_every=[100],
        render_test=1,
        render_train=0,
        progress_refresh_rate=20,
        n_devices=1,
    )
    # the synthetic images are 40x40; tell the loader
    from tensorf_tpu.data import dataset_dict
    from functools import partial

    orig = dataset_dict["blender"]
    dataset_dict["blender"] = partial(orig, wh=(40, 40))
    try:
        ckpt_path = reconstruction(cfg)
    finally:
        dataset_dict["blender"] = orig

    assert os.path.exists(ckpt_path)
    logdir = os.path.dirname(ckpt_path)
    assert os.path.exists(f"{logdir}/training_time.txt")
    assert os.path.exists(f"{logdir}/history.npz")
    # periodic checkpoint
    assert os.path.exists(f"{logdir}/0k_e2e.npz")
    # render_test artifacts
    assert os.path.isdir(f"{logdir}/imgs_test_all/prediction")
    mean_txt = f"{logdir}/imgs_test_all/mean.txt"
    assert os.path.exists(mean_txt)
    # reference 4-line format (renderer.py:218-222): psnr, ssim,
    # lpips-alex, lpips-vgg — LPIPS lines are NaN without vendored weights
    # rather than silently omitted.
    mean_vals = np.loadtxt(mean_txt).reshape(-1)
    assert mean_vals.shape[0] == 4, mean_vals
    assert np.isfinite(mean_vals[:2]).all()
    psnr = float(mean_vals[0])
    # all-white prediction scores ~11.5 dB on this scene; the learned model
    # reaches ~26 dB in 300 tiny steps — require a wide margin over white
    assert psnr > 18.0, psnr

    # mesh export from the final checkpoint
    ply = export_mesh(cfg, ckpt_path)
    assert os.path.exists(ply)
    assert os.path.getsize(ply) > 200
