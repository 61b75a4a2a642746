"""Procedural synthetic scene generator (blender / nerf-synthetic format).

Writes a tiny multi-view-consistent dataset to disk — an analytically
ray-traced lambertian sphere on a white background — in the exact
``transforms_{split}.json`` + RGBA PNG layout the blender loader consumes.
Used by the end-to-end tests and for driving the full pipeline in
environments without the NeRF-synthetic data.
"""

from __future__ import annotations

import json
import os
from typing import Tuple

import numpy as np


def _look_at_c2w_opengl(cam_pos: np.ndarray, target=None) -> np.ndarray:
    """OpenGL/blender-convention c2w (x right, y up, -z forward)."""
    target = np.zeros(3) if target is None else np.asarray(target)
    forward = target - cam_pos  # world direction the camera looks along
    forward = forward / np.linalg.norm(forward)
    world_up = np.array([0.0, 0.0, 1.0])
    right = np.cross(forward, world_up)
    if np.linalg.norm(right) < 1e-6:
        right = np.array([1.0, 0.0, 0.0])
    right = right / np.linalg.norm(right)
    up = np.cross(right, forward)
    c2w = np.eye(4)
    c2w[:3, 0] = right
    c2w[:3, 1] = up
    c2w[:3, 2] = -forward  # -z forward
    c2w[:3, 3] = cam_pos
    return c2w


def _trace_sphere(
    c2w: np.ndarray,
    wh: Tuple[int, int],
    camera_angle_x: float,
    radius: float = 0.8,
) -> np.ndarray:
    """Analytic render of a lambertian-shaded sphere; returns (H, W, 4)."""
    W, H = wh
    focal = 0.5 * W / np.tan(0.5 * camera_angle_x)
    i, j = np.meshgrid(
        np.arange(W, dtype=np.float64) + 0.5,
        np.arange(H, dtype=np.float64) + 0.5,
        indexing="xy",
    )
    dirs = np.stack(
        [(i - W / 2) / focal, -(j - H / 2) / focal, -np.ones_like(i)], -1
    )
    rd = dirs @ c2w[:3, :3].T
    rd = rd / np.linalg.norm(rd, axis=-1, keepdims=True)
    ro = c2w[:3, 3]

    b = np.sum(rd * ro, axis=-1)
    c = np.sum(ro * ro) - radius**2
    disc = b * b - c
    hit = disc > 0
    t = -b - np.sqrt(np.maximum(disc, 0))
    hit &= t > 0

    p = ro + rd * t[..., None]
    n = p / radius
    light = np.array([0.577, 0.577, 0.577])
    lambert = np.clip(n @ light, 0, 1)
    # position-dependent albedo so views constrain appearance
    albedo = 0.5 + 0.5 * np.stack([n[..., 0], n[..., 1], n[..., 2]], -1)
    rgb = np.clip(albedo * (0.3 + 0.7 * lambert[..., None]), 0, 1)

    out = np.zeros((H, W, 4))
    out[..., :3] = np.where(hit[..., None], rgb, 1.0)
    out[..., 3] = hit.astype(np.float64)
    return out


# A multi-object checker-textured arrangement for long-schedule training
# runs: high-frequency appearance + real occlusion structure, so the
# coarse-to-fine grid schedule and alpha-mask culling behave like they do
# on the NeRF-synthetic scenes.  Everything fits inside the blender
# loader's default +-1.5 bbox.
COMPOSITE_SPHERES = (
    # (center, radius, base_rgb_a, base_rgb_b, checker_freq)
    ((0.0, 0.0, 0.0), 0.55, (0.9, 0.25, 0.2), (0.95, 0.9, 0.85), 12),
    ((0.85, 0.0, -0.1), 0.26, (0.2, 0.5, 0.9), (0.9, 0.9, 0.3), 8),
    ((-0.85, 0.0, -0.1), 0.26, (0.2, 0.8, 0.4), (0.2, 0.2, 0.6), 10),
    ((0.0, 0.85, -0.1), 0.26, (0.9, 0.6, 0.2), (0.3, 0.1, 0.4), 14),
    ((0.0, -0.85, -0.1), 0.26, (0.7, 0.2, 0.7), (0.9, 0.95, 0.9), 6),
    ((0.45, 0.45, 0.62), 0.16, (0.95, 0.85, 0.2), (0.1, 0.1, 0.1), 16),
    ((-0.45, -0.45, 0.62), 0.16, (0.3, 0.9, 0.9), (0.9, 0.3, 0.2), 20),
    ((0.0, 0.0, -0.78), 0.22, (0.55, 0.55, 0.6), (0.95, 0.45, 0.1), 24),
)


def _trace_composite(
    c2w: np.ndarray, wh: Tuple[int, int], camera_angle_x: float
) -> np.ndarray:
    """Nearest-hit analytic render of the composite checker-sphere scene."""
    W, H = wh
    focal = 0.5 * W / np.tan(0.5 * camera_angle_x)
    i, j = np.meshgrid(
        np.arange(W, dtype=np.float64) + 0.5,
        np.arange(H, dtype=np.float64) + 0.5,
        indexing="xy",
    )
    dirs = np.stack(
        [(i - W / 2) / focal, -(j - H / 2) / focal, -np.ones_like(i)], -1
    )
    rd = dirs @ c2w[:3, :3].T
    rd = rd / np.linalg.norm(rd, axis=-1, keepdims=True)
    ro = c2w[:3, 3]

    t_best = np.full((H, W), np.inf)
    rgb = np.ones((H, W, 3))
    light = np.array([0.577, 0.577, 0.577])
    for center, radius, col_a, col_b, freq in COMPOSITE_SPHERES:
        oc = ro - np.asarray(center)
        b = np.sum(rd * oc, axis=-1)
        c = np.sum(oc * oc) - radius**2
        disc = b * b - c
        t = -b - np.sqrt(np.maximum(disc, 0))
        hit = (disc > 0) & (t > 1e-6) & (t < t_best)
        p = ro + rd * t[..., None]
        n = (p - np.asarray(center)) / radius
        theta = np.arccos(np.clip(n[..., 2], -1, 1))
        phi = np.arctan2(n[..., 1], n[..., 0])
        checker = (
            (np.floor(theta / np.pi * freq) + np.floor((phi + np.pi) / (2 * np.pi) * freq))
            % 2.0
        )
        albedo = np.where(
            checker[..., None] > 0.5, np.asarray(col_a), np.asarray(col_b)
        )
        lambert = np.clip(n @ light, 0, 1)
        shaded = np.clip(albedo * (0.25 + 0.75 * lambert[..., None]), 0, 1)
        rgb = np.where(hit[..., None], shaded, rgb)
        t_best = np.where(hit, t, t_best)

    out = np.zeros((H, W, 4))
    hit_any = np.isfinite(t_best)
    out[..., :3] = np.where(hit_any[..., None], rgb, 1.0)
    out[..., 3] = hit_any.astype(np.float64)
    return out


def make_synthetic_blender_scene(
    root: str,
    n_train: int = 12,
    n_test: int = 4,
    wh: Tuple[int, int] = (64, 64),
    camera_angle_x: float = 0.6911,
    cam_radius: float = 4.0,
    seed: int = 0,
    scene: str = "sphere",
):
    """Write transforms_{train,test}.json + RGBA PNGs under ``root``.

    ``scene``: "sphere" (single lambertian sphere — fast, used by tests) or
    "composite" (checker-textured multi-sphere arrangement — the
    high-fidelity scene for full-schedule training runs).
    """
    from PIL import Image

    rng = np.random.default_rng(seed)
    for split, n in (("train", n_train), ("test", n_test)):
        os.makedirs(os.path.join(root, split), exist_ok=True)
        frames = []
        for k in range(n):
            theta = 2 * np.pi * (k / n) + (0.1 if split == "test" else 0.0)
            phi = np.pi / 5 + 0.25 * rng.standard_normal()
            pos = cam_radius * np.array(
                [
                    np.cos(theta) * np.cos(phi),
                    np.sin(theta) * np.cos(phi),
                    np.sin(phi),
                ]
            )
            c2w = _look_at_c2w_opengl(pos)
            if scene == "composite":
                img = _trace_composite(c2w, wh, camera_angle_x)
            else:
                img = _trace_sphere(c2w, wh, camera_angle_x)
            name = f"r_{k}"
            Image.fromarray((img * 255).astype(np.uint8)).save(
                os.path.join(root, split, name + ".png")
            )
            frames.append(
                {
                    "file_path": f"./{split}/{name}",
                    "transform_matrix": c2w.tolist(),
                }
            )
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump(
                {"camera_angle_x": camera_angle_x, "frames": frames}, f
            )
    return root
