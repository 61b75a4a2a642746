"""Common dataset plumbing: eager in-memory ray stores (numpy).

The reference loaders are torch Datasets used as eager ray stores — they
precompute per-pixel rays for every image at construction and the trainer
indexes ``all_rays``/``all_rgbs`` directly (SURVEY.md §2.3).  The TPU build
keeps that shape (few-shot sets are tiny) but in numpy, with jnp conversion
at the device boundary.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import numpy as np
from PIL import Image


class RayDataset:
    """Base: exposes all_rays, all_rgbs, all_masks, poses, img_wh, near_far,
    scene_bbox, white_bg, directions, is_stack — the attribute surface the
    drivers rely on (reference train.py:178-179, 290)."""

    white_bg: bool = False
    near_far = [2.0, 6.0]

    def __len__(self):
        return len(self.all_rgbs)

    def __getitem__(self, idx):
        if getattr(self, "split", "train") == "train":
            return {"rays": self.all_rays[idx], "rgbs": self.all_rgbs[idx]}
        sample = {"rays": self.all_rays[idx], "rgbs": self.all_rgbs[idx]}
        if getattr(self, "all_masks", None) is not None and len(self.all_masks):
            sample["mask"] = self.all_masks[idx]
        return sample


def select_frame_indices(
    n_frames: int,
    num_images: Union[int, Sequence[int], None],
    n_vis: int = -1,
    seed: int = 20211202,
) -> List[int]:
    """Few-shot frame selection (reference blender.py:69-74 with the
    ``self.N_imgs`` typo fixed — SURVEY.md §2.11 item 6)."""
    interval = 1 if n_vis < 0 else max(n_frames // n_vis, 1)
    idxs = list(range(0, n_frames, interval))
    if isinstance(num_images, (list, tuple)):
        return [int(i) for i in num_images]
    if isinstance(num_images, (int, np.integer)) and 0 < num_images < len(idxs):
        rng = np.random.default_rng(seed)
        return sorted(rng.choice(idxs, int(num_images), replace=False).tolist())
    return idxs


def load_image_rgba(path: str, img_wh, downsample: float) -> np.ndarray:
    """Load an image as float32 (H*W, C); LANCZOS resize on downsample."""
    img = Image.open(path)
    if downsample != 1.0:
        img = img.resize(img_wh, Image.LANCZOS)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    return arr.reshape(-1, arr.shape[-1]) if arr.ndim == 3 else arr.reshape(-1, 1)


def stack_or_cat(parts: List[np.ndarray], is_stack: bool, img_wh=None, ch=None):
    if not parts:
        return np.zeros((0,), np.float32)
    if not is_stack:
        return np.concatenate(parts, axis=0)
    out = np.stack(parts, axis=0)
    if img_wh is not None and ch is not None:
        out = out.reshape(-1, img_wh[1], img_wh[0], ch)
    return out
