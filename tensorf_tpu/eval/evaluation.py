"""Evaluation drivers: test-set metrics, trajectory rendering, mid-train PSNR.

Counterparts of the reference ``evaluation`` (renderer.py:148-225),
``evaluation_path`` (renderer.py:227-282) and ``PSNRs_calculate``
(loss.py:10-57): per-image chunked rendering, PSNR (+optional SSIM/LPIPS),
prediction/ground_truth/rgbd PNG dumps, rgb+depth mp4 videos, mean.txt.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional

import jax
import numpy as np

from ..models.alpha_mask import AlphaGridMask
from ..ops.rays import get_rays, ndc_rays_blender
from ..render.chunked import (
    make_render_fn,
    render_chunked,
    render_chunked_stratified,
)
from ..utils.misc import visualize_depth_numpy
from .metrics import psnr as psnr_fn
from .metrics import rgb_lpips, rgb_ssim


@dataclasses.dataclass
class RendererHandle:
    """Bundles everything needed to render rays with the current model state
    (the role the (tensorf, renderer) pair plays in the reference)."""

    model: object
    cfg: object
    params: dict
    alpha_mask: Optional[AlphaGridMask]
    aabb: object  # jnp (2,3)
    step_size: float
    n_samples: int
    white_bg: bool
    ndc_ray: bool
    shade_top_k: Optional[int] = None
    fused: bool = True
    sample_budget: Optional[int] = None
    use_coarse_gate: bool = True
    # Candidate-count-stratified serving (render_chunked_stratified):
    # per-bucket budgets, exact by construction; used whenever an alpha
    # mask exists.  Falls back to the uniform path without a mask.
    stratified: bool = False
    # Ray-batch DP serving: with a mesh set, each chunk's rays are
    # sharded over the mesh's data axis and GSPMD runs the render SPMD
    # (same layout as the train step; reference serving is single-GPU).
    mesh: object = None

    def render(self, rays: np.ndarray, chunk: int = 8192):
        if self.stratified and self.alpha_mask is not None:
            out = render_chunked_stratified(
                self.model,
                self.cfg,
                self.params,
                self.alpha_mask,
                rays,
                self.aabb,
                step_size=float(self.step_size),
                n_samples=int(self.n_samples),
                white_bg=self.white_bg,
                ndc_ray=self.ndc_ray,
                shade_top_k=self.shade_top_k,
                fused=self.fused,
                chunk=chunk,
                use_coarse_gate=self.use_coarse_gate,
                mesh=self.mesh,
            )
        else:
            fn = make_render_fn(
                self.model,
                self.cfg,
                step_size=float(self.step_size),
                n_samples=int(self.n_samples),
                white_bg=self.white_bg,
                ndc_ray=self.ndc_ray,
                shade_top_k=self.shade_top_k,
                fused=self.fused,
                sample_budget=self.sample_budget,
                use_coarse_gate=self.use_coarse_gate,
            )
            out = render_chunked(
                fn, self.params, self.alpha_mask, rays, self.aabb,
                chunk=chunk, mesh=self.mesh,
            )
        rgb, depth, num_valid, overflow = out
        if overflow > 0.0:
            # Eval-side budget self-verification (ADVICE r2): a too-small
            # budget would silently under-integrate the reported images.
            print(
                f"[eval] WARNING: sample-budget overflow on up to "
                f"{overflow:.1%} of rays in a chunk — rendered images may "
                f"under-integrate; raise sample_budget",
                flush=True,
            )
        return rgb, depth, num_valid


def _write_png(path: str, img: np.ndarray):
    import imageio.v2 as imageio

    imageio.imwrite(path, (np.clip(img, 0, 1) * 255).astype(np.uint8))


def _write_video(path: str, frames: List[np.ndarray], fps: int = 30):
    import imageio.v2 as imageio

    try:
        imageio.mimwrite(path, np.stack(frames), fps=fps, quality=10)
    except Exception as e:  # codec-free environments: fall back to GIF so
        # the video artifact (reference renderer.py:211-212) still exists
        try:
            gif = os.path.splitext(path)[0] + ".gif"
            # imageio's Pillow GIF writer takes duration in MILLISECONDS
            imageio.mimwrite(gif, np.stack(frames), format="GIF",
                             duration=1000.0 / fps, loop=0)
            print(f"[eval] no mp4 backend ({type(e).__name__}); wrote {gif}")
        except Exception as e2:
            print(f"[eval] video write skipped ({e}; gif fallback: {e2})")


def evaluation(
    test_dataset,
    handle: RendererHandle,
    savePath: Optional[str] = None,
    N_vis: int = -1,
    prtx: str = "",
    chunk: int = 8192,
    compute_extra_metrics: bool = True,
    device=None,
    heartbeat=None,
):
    """Render the (stacked) dataset, compute metrics, dump artifacts.

    Returns the list of per-image PSNRs (reference renderer.py:148-225).
    ``heartbeat`` (callable, no args) is invoked once per rendered image —
    the train loop's wedge watchdog stays armed through finalization.
    """
    PSNRs, ssims, l_alex, l_vgg = [], [], [], []
    rgb_frames, depth_frames = [], []
    near_far = test_dataset.near_far
    W, H = test_dataset.img_wh

    if jax.process_count() > 1 and jax.process_index() != 0:
        # multi-host: every process renders (the sharded chunks are
        # collective) and returns identical metrics, but only process 0
        # touches the shared filesystem
        savePath = None

    if savePath is not None:
        os.makedirs(savePath, exist_ok=True)
        os.makedirs(f"{savePath}/prediction", exist_ok=True)
        os.makedirs(f"{savePath}/ground_truth", exist_ok=True)
        os.makedirs(f"{savePath}/rgbd", exist_ok=True)

    n_images = test_dataset.all_rays.shape[0]
    img_eval_interval = 1 if N_vis < 0 else max(n_images // N_vis, 1)
    idxs = list(range(0, n_images, img_eval_interval))

    for idx in idxs:
        if heartbeat is not None:
            heartbeat()
        rays = np.asarray(test_dataset.all_rays[idx]).reshape(-1, 6)
        rgb_map, depth_map, _ = handle.render(rays, chunk=chunk)
        rgb_map = np.clip(rgb_map, 0, 1).reshape(H, W, 3)
        depth_map = depth_map.reshape(H, W)
        depth_vis, _ = visualize_depth_numpy(depth_map, near_far)

        if len(test_dataset.all_rgbs):
            gt_rgb = np.asarray(test_dataset.all_rgbs[idx]).reshape(H, W, 3)
            PSNRs.append(psnr_fn(rgb_map, gt_rgb))
            if compute_extra_metrics:
                ssims.append(rgb_ssim(rgb_map, gt_rgb, 1))
                la = rgb_lpips(gt_rgb, rgb_map, "alex")
                lv = rgb_lpips(gt_rgb, rgb_map, "vgg")
                # NaN (not omission) when LPIPS weights are unavailable,
                # so mean.txt keeps the reference's 4-line format
                # (renderer.py:218-222).
                if (la is None or lv is None) and not l_alex and not l_vgg:
                    print(
                        "[eval] LPIPS weights unavailable — mean.txt "
                        "LPIPS lines will be NaN (vendor "
                        "tensorf_tpu/eval/weights/lpips_{alex,vgg}.npz "
                        "via scripts/convert_lpips_weights.py on a "
                        "networked machine, or set TENSORF_LPIPS_DIR)"
                    )
                l_alex.append(la if la is not None else float("nan"))
                l_vgg.append(lv if lv is not None else float("nan"))

        rgb_frames.append((rgb_map * 255).astype(np.uint8))
        depth_frames.append(depth_vis[..., ::-1])  # BGR->RGB for video

        if savePath is not None:
            _write_png(f"{savePath}/prediction/{prtx}{idx:03d}.png", rgb_map)
            if len(test_dataset.all_rgbs):
                _write_png(
                    f"{savePath}/ground_truth/{prtx}{idx:03d}.png", gt_rgb
                )
            rgbd = np.concatenate(
                [
                    (rgb_map * 255).astype(np.uint8),
                    depth_vis[..., ::-1],
                ],
                axis=1,
            )
            import imageio.v2 as imageio

            imageio.imwrite(f"{savePath}/rgbd/{prtx}{idx:03d}.png", rgbd)

    if savePath is not None:
        _write_video(f"{savePath}/{prtx}video.mp4", rgb_frames)
        _write_video(f"{savePath}/{prtx}depthvideo.mp4", depth_frames)

        if PSNRs:
            # reference 4-line mean.txt: psnr, ssim, lpips-alex, lpips-vgg
            # (renderer.py:218-222); extra-metric lines are NaN when those
            # metrics were not computed.
            lines = [float(np.mean(PSNRs))]
            if compute_extra_metrics:
                lines.append(float(np.mean(ssims)) if ssims else float("nan"))
                lines.append(float(np.mean(l_alex)) if l_alex else float("nan"))
                lines.append(float(np.mean(l_vgg)) if l_vgg else float("nan"))
            np.savetxt(f"{savePath}/{prtx}mean.txt", np.asarray(lines))

    return PSNRs


def evaluation_path(
    test_dataset,
    handle: RendererHandle,
    c2ws,
    savePath: Optional[str] = None,
    prtx: str = "",
    chunk: int = 8192,
    device=None,
    heartbeat=None,
):
    """Render a camera trajectory (reference renderer.py:227-282).
    ``heartbeat`` is invoked once per frame (wedge-watchdog liveness)."""
    W, H = test_dataset.img_wh
    near_far = test_dataset.near_far
    if jax.process_count() > 1 and jax.process_index() != 0:
        savePath = None  # compute in lockstep, write from process 0 only
    if savePath is not None:
        os.makedirs(savePath, exist_ok=True)
        os.makedirs(f"{savePath}/prediction", exist_ok=True)
        os.makedirs(f"{savePath}/rgbd", exist_ok=True)

    rgb_frames, depth_frames = [], []
    for idx, c2w in enumerate(np.asarray(c2ws)):
        if heartbeat is not None:
            heartbeat()
        rays_o, rays_d = get_rays(test_dataset.directions, c2w[:3, :4])
        if handle.ndc_ray:
            rays_o, rays_d = ndc_rays_blender(
                H, W, test_dataset.focal[0], 1.0, rays_o, rays_d
            )
        rays = np.concatenate([rays_o, rays_d], axis=1).astype(np.float32)
        rgb_map, depth_map, _ = handle.render(rays, chunk=chunk)
        rgb_map = np.clip(rgb_map, 0, 1).reshape(H, W, 3)
        depth_vis, _ = visualize_depth_numpy(
            depth_map.reshape(H, W), near_far
        )
        rgb_frames.append((rgb_map * 255).astype(np.uint8))
        depth_frames.append(depth_vis[..., ::-1])
        if savePath is not None:
            _write_png(f"{savePath}/prediction/{prtx}{idx:03d}.png", rgb_map)

    if savePath is not None:
        _write_video(f"{savePath}/{prtx}video.mp4", rgb_frames)
        _write_video(f"{savePath}/{prtx}depthvideo.mp4", depth_frames)
    return []


def psnrs_calculate(handle: RendererHandle, dataset, chunk: int = 4096,
                    heartbeat=None):
    """Mid-training test-set PSNR sweep (reference loss.py:10-57)."""
    PSNRs = []
    W, H = dataset.img_wh
    for idx in range(dataset.all_rays.shape[0]):
        if heartbeat is not None:
            heartbeat()
        rays = np.asarray(dataset.all_rays[idx]).reshape(-1, 6)
        rgb_map, _, _ = handle.render(rays, chunk=chunk)
        rgb_map = np.clip(rgb_map, 0, 1)
        if len(dataset.all_rgbs):
            gt = np.asarray(dataset.all_rgbs[idx]).reshape(-1, 3)
            PSNRs.append(psnr_fn(rgb_map, gt))
    return PSNRs
