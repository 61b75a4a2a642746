"""Chunked eval-time rendering — the `OctreeRender_trilinear_fast` surface.

The reference's render driver (renderer.py:13-26) host-loops over ray
chunks and calls the model per chunk.  Here each chunk is one call into a
single cached jitted render program (fixed chunk shape; the tail chunk is
padded), so full-image rendering runs at device speed with one compile.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.freq_mask import FreeMasks
from .volume import render_rays


@partial(
    jax.jit,
    static_argnames=(
        "model",
        "cfg",
        "step_size",
        "n_samples",
        "white_bg",
        "ndc_ray",
        "shade_top_k",
        "fused",
        "sample_budget",
    ),
)
def _render_eval(
    model,
    cfg,
    params,
    alpha_mask,
    rays,
    aabb,
    masks,
    *,
    step_size,
    n_samples,
    white_bg,
    ndc_ray,
    shade_top_k,
    fused,
    sample_budget,
):
    out = render_rays(
        model,
        cfg,
        params,
        alpha_mask,
        rays,
        None,
        masks,
        aabb=aabb,
        step_size=step_size,
        n_samples=n_samples,
        is_train=False,
        white_bg=white_bg,
        ndc_ray=ndc_ray,
        shade_top_k=shade_top_k,
        fused=fused,
        sample_budget=sample_budget,
    )
    return out.rgb, out.depth, out.num_valid_samples


def make_render_fn(
    model,
    cfg,
    *,
    step_size: float,
    n_samples: int,
    white_bg: bool,
    ndc_ray: bool,
    shade_top_k: Optional[int] = None,
    fused: bool = True,
    sample_budget: Optional[int] = None,
):
    """Bind the static render configuration; returns f(params, alpha_mask,
    rays, aabb, masks) -> (rgb, depth, num_valid)."""

    def fn(params, alpha_mask, rays, aabb, masks=FreeMasks()):
        return _render_eval(
            model,
            cfg,
            params,
            alpha_mask,
            rays,
            aabb,
            masks,
            step_size=step_size,
            n_samples=n_samples,
            white_bg=white_bg,
            ndc_ray=ndc_ray,
            shade_top_k=shade_top_k,
            fused=fused,
            sample_budget=sample_budget,
        )

    return fn


@partial(
    jax.jit,
    static_argnames=(
        "model",
        "cfg",
        "step_size",
        "n_samples",
        "white_bg",
        "ndc_ray",
        "shade_top_k",
        "fused",
        "sample_budget",
        "tile",
    ),
)
def _render_frame(
    model,
    cfg,
    params,
    alpha_mask,
    rays,  # (T*tile, 6) padded
    aabb,
    masks,
    *,
    step_size,
    n_samples,
    white_bg,
    ndc_ray,
    shade_top_k,
    fused,
    sample_budget,
    tile,
):
    """Whole-frame render as ONE device program: lax.map over ray tiles.

    The host-loop chunk driver costs one dispatch per chunk — through a
    tunneled chip that dominates frame time (reference surface being
    replaced: renderer.py:13-26 host loop).  Here the tile loop is compiled
    into the program, so a full frame is a single dispatch.
    """
    tiles = rays.reshape(-1, tile, 6)

    def body(r):
        out = render_rays(
            model, cfg, params, alpha_mask, r, None, masks,
            aabb=aabb, step_size=step_size, n_samples=n_samples,
            is_train=False, white_bg=white_bg, ndc_ray=ndc_ray,
            shade_top_k=shade_top_k, fused=fused,
            sample_budget=sample_budget,
        )
        return out.rgb, out.depth

    rgb, depth = jax.lax.map(body, tiles)
    return rgb.reshape(-1, 3), depth.reshape(-1)


def render_frame(
    render_cfg: dict,
    params,
    alpha_mask,
    rays,
    aabb,
    *,
    tile: int = 16384,
    masks: FreeMasks = FreeMasks(),
):
    """Render (M, 6) rays in one device dispatch; returns numpy rgb/depth.

    ``render_cfg`` holds the static kwargs of make_render_fn (model, cfg,
    step_size, n_samples, white_bg, ndc_ray, shade_top_k, fused,
    sample_budget).
    """
    rays = np.asarray(rays, dtype=np.float32)
    M = rays.shape[0]
    pad = (-M) % tile
    if pad:
        rays = np.concatenate(
            [rays, np.broadcast_to(rays[-1:], (pad, 6))], axis=0
        )
    rgb, depth = _render_frame(
        render_cfg["model"],
        render_cfg["cfg"],
        params,
        alpha_mask,
        jnp.asarray(rays),
        aabb,
        masks,
        step_size=render_cfg["step_size"],
        n_samples=render_cfg["n_samples"],
        white_bg=render_cfg["white_bg"],
        ndc_ray=render_cfg["ndc_ray"],
        shade_top_k=render_cfg.get("shade_top_k"),
        fused=render_cfg.get("fused", True),
        sample_budget=render_cfg.get("sample_budget"),
        tile=tile,
    )
    return np.asarray(rgb[:M]), np.asarray(depth[:M])


def render_chunked(
    render_fn,
    params,
    alpha_mask,
    rays,
    aabb,
    *,
    chunk: int = 8192,
    masks: FreeMasks = FreeMasks(),
):
    """Render (M, 6) rays in fixed-size chunks; returns numpy rgb/depth.

    Pads the tail chunk so every call hits the same compiled program.
    """
    rays = np.asarray(rays, dtype=np.float32)
    M = rays.shape[0]
    pending = []
    for start in range(0, M, chunk):
        part = rays[start : start + chunk]
        n = part.shape[0]
        if n < chunk:
            part = np.concatenate(
                [part, np.broadcast_to(part[-1:], (chunk - n, 6))], axis=0
            )
        # dispatch every chunk asynchronously; fetch after the loop so the
        # device pipeline never stalls on host transfers
        pending.append(
            (n, render_fn(params, alpha_mask, jnp.asarray(part), aabb, masks))
        )
    rgbs = [np.asarray(rgb[:n]) for n, (rgb, _, _) in pending]
    depths = [np.asarray(depth[:n]) for n, (_, depth, _) in pending]
    total_valid = int(sum(int(nv) for _, (_, _, nv) in pending))
    return (
        np.concatenate(rgbs, axis=0),
        np.concatenate(depths, axis=0),
        total_valid,
    )
