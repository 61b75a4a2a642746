"""YourOwnDataset + Pallas line kernel tests."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_your_own_dataset_reads_colmap2nerf_style(tmp_path, rng):
    from PIL import Image

    root = tmp_path
    (root / "images").mkdir()
    frames = []
    for i in range(3):
        img = (rng.uniform(size=(20, 30, 4)) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / "images" / f"f_{i}.png")
        c2w = np.eye(4)
        c2w[:3, 3] = [0, 0, 2 + i]
        frames.append(
            {
                "file_path": f"images/f_{i}.png",
                "transform_matrix": c2w.tolist(),
            }
        )
    meta = {
        "w": 30,
        "h": 20,
        "fl_x": 40.0,
        "fl_y": 42.0,
        "cx": 14.0,
        "cy": 11.0,
        "camera_angle_x": 0.7,
        "frames": frames,
    }
    (root / "transforms_train.json").write_text(json.dumps(meta))

    from tensorf_tpu.data.your_own_data import YourOwnDataset

    ds = YourOwnDataset(str(root), split="train")
    assert ds.img_wh == (30, 20)
    assert ds.all_rays.shape == (3 * 20 * 30, 6)
    assert ds.all_rgbs.shape == (3 * 20 * 30, 3)
    np.testing.assert_allclose(ds.focal, [40.0, 42.0])
    # fl_y != fl_x and principal point honored
    assert ds.intrinsics[0, 2] == 14.0 and ds.intrinsics[1, 2] == 11.0
    # few-shot list selection works through the shared path
    ds2 = YourOwnDataset(str(root), split="train", num_images=[0, 2])
    assert ds2.all_rays.shape[0] == 2 * 20 * 30


def test_pallas_line_kernel_matches_matmul(rng):
    """Interpret-mode parity of the Pallas fused lerp-matmul kernel."""
    from tensorf_tpu.ops.grid_sample import line_sample_matmul
    from tensorf_tpu.ops.pallas.line_matmul import line_sample_pallas

    L, C, M = 64, 32, 2500
    line = jnp.asarray(rng.normal(size=(L, C)).astype(np.float32))
    coord = jnp.asarray(rng.uniform(-1.1, 1.1, (M,)).astype(np.float32))
    ref = line_sample_matmul(line, coord)
    out = line_sample_pallas(line, coord)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    ct = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32))
    g_ref = jax.grad(
        lambda l: jnp.sum(line_sample_matmul(l, coord) * ct)
    )(line)
    g_out = jax.grad(
        lambda l: jnp.sum(line_sample_pallas(l, coord) * ct)
    )(line)
    np.testing.assert_allclose(
        np.asarray(g_out), np.asarray(g_ref), rtol=1e-4, atol=1e-5
    )


def test_pallas_scatter_add_matches_xla(rng):
    """Interpret-mode parity of the VMEM-accumulator scatter kernel."""
    from tensorf_tpu.ops.pallas.scatter_add import scatter_add_pallas

    M, HW, C = 5000, 256, 128
    idx = jnp.asarray(rng.integers(0, HW, M).astype(np.int32))
    g = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32))
    ref = jnp.zeros((HW, C)).at[idx].add(g)
    out = scatter_add_pallas(idx, g, HW)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-4
    )
