"""Loader tests for llff / nsvf / tankstemple on synthetic on-disk layouts."""

import os

import numpy as np
import pytest
from PIL import Image


def _save_rgba(path, h, w, rng):
    img = (rng.uniform(size=(h, w, 4)) * 255).astype(np.uint8)
    Image.fromarray(img).save(path)


@pytest.fixture
def llff_scene(tmp_path, rng):
    """Minimal LLFF layout: poses_bounds.npy + images_4/."""
    n, H, W, focal = 10, 40, 60, 50.0
    img_dir = tmp_path / "images_4"
    img_dir.mkdir()
    poses = []
    for i in range(n):
        theta = 0.2 * (i - n / 2)
        # forward-facing-ish cameras: "down right back" convention rows
        c2w = np.eye(4)[:3]
        c2w[:, 3] = [np.sin(theta), 0.05 * i, 4.0 + 0.1 * np.cos(theta)]
        # poses_bounds stores [down right back] basis + hwf column
        m = np.concatenate(
            [-c2w[:, 1:2], c2w[:, 0:1], c2w[:, 2:4]], axis=1
        )
        hwf = np.array([[H * 4], [W * 4], [focal * 4]])
        poses.append(np.concatenate([m, hwf], axis=1).reshape(-1))
        _save_rgba(img_dir / f"im_{i:03d}.png", H, W, rng)
    bounds = np.stack([np.full(n, 2.0), np.full(n, 8.0)], -1)
    arr = np.concatenate([np.stack(poses), bounds], axis=1)
    np.save(tmp_path / "poses_bounds.npy", arr)
    return str(tmp_path)


def test_llff_loader(llff_scene):
    from tensorf_tpu.data.llff import LLFFDataset

    train = LLFFDataset(llff_scene, split="train", downsample=4)
    test = LLFFDataset(llff_scene, split="test", downsample=4, is_stack=True)

    # hold_every=8 on 10 images -> test gets indices {0, 8}, train the rest
    assert test.all_rgbs.shape[0] == 2
    assert train.all_rays.shape == (8 * 40 * 60, 6)
    assert train.near_far == [0.0, 1.0]
    assert not train.white_bg
    # NDC rays: origins near the z=-1..1 projective cube
    assert np.abs(train.all_rays[:, 2]).max() <= 1.0 + 1e-4
    # spiral render path generated
    assert train.render_path.shape[0] == 120
    assert train.render_path.shape[1:] == (4, 4)


@pytest.fixture
def nsvf_scene(tmp_path, rng):
    (tmp_path / "pose").mkdir()
    (tmp_path / "rgb").mkdir()
    np.savetxt(tmp_path / "bbox.txt", np.array([[-1, -1, -1, 1, 1, 1, 0.1]]))
    with open(tmp_path / "intrinsics.txt", "w") as f:
        f.write("555.0 400.0 400.0 0.\n0 0 0\n")
    for split, prefix, n in (("train", "0_", 3), ("test", "2_", 2)):
        for i in range(n):
            c2w = np.eye(4)
            c2w[2, 3] = 3.0 + i
            np.savetxt(tmp_path / "pose" / f"{prefix}{i:02d}.txt", c2w)
            _save_rgba(tmp_path / "rgb" / f"{prefix}{i:02d}.png", 32, 32, rng)
    return str(tmp_path)


def test_nsvf_loader(nsvf_scene):
    from tensorf_tpu.data.nsvf import NSVF

    train = NSVF(nsvf_scene, split="train", downsample=25.0, wh=(800, 800))
    assert train.img_wh == (32, 32)
    assert train.all_rays.shape == (3 * 32 * 32, 6)
    np.testing.assert_allclose(
        train.scene_bbox, [[-1, -1, -1], [1, 1, 1]]
    )
    assert train.white_bg
    assert train.render_path.shape == (40, 4, 4)

    test = NSVF(nsvf_scene, split="test", downsample=25.0, wh=(800, 800))
    assert test.all_rgbs.shape == (2, 32, 32, 3)


@pytest.fixture
def tnt_scene(tmp_path, rng):
    (tmp_path / "pose").mkdir()
    (tmp_path / "rgb").mkdir()
    np.savetxt(tmp_path / "bbox.txt", np.array([[-1, -1, -1, 1, 1, 1, 0.1]]))
    intr = np.eye(3)
    intr[0, 0] = intr[1, 1] = 1111.0
    intr[0, 2], intr[1, 2] = 960, 540
    np.savetxt(tmp_path / "intrinsics.txt", intr)
    for prefix, n in (("0_", 3), ("1_", 2)):
        for i in range(n):
            c2w = np.eye(4)
            c2w[2, 3] = 3.0 + i
            np.savetxt(tmp_path / "pose" / f"{prefix}{i:02d}.txt", c2w)
            _save_rgba(
                tmp_path / "rgb" / f"{prefix}{i:02d}.png", 27, 48, rng
            )
    return str(tmp_path)


def test_tankstemple_loader(tnt_scene):
    from tensorf_tpu.data.tankstemple import TanksTempleDataset

    train = TanksTempleDataset(tnt_scene, split="train", downsample=40.0)
    assert train.img_wh == (48, 27)
    assert train.all_rays.shape == (3 * 48 * 27, 6)
    np.testing.assert_allclose(
        train.scene_bbox, 1.2 * np.array([[-1, -1, -1], [1, 1, 1]])
    )
    # circular look-at render path
    assert train.render_path.shape == (200, 4, 4)
    # test split falls back to 1_ when no 2_ files exist
    test = TanksTempleDataset(tnt_scene, split="test", downsample=40.0)
    assert test.all_rgbs.shape[0] == 2
