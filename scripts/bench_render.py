#!/usr/bin/env python
"""Render-throughput benchmark: 800x800 novel-view FPS (a BASELINE.json
headline metric).

Renders full 800x800 frames with the flagship TensorVMSplit model
(128-grid, 16/48 comps, MLP_Fea) through the chunked eval renderer, with a
15%-occupancy alpha mask + sample budget (the post-training serving
configuration).  Prints one JSON line.

Note: per-call dispatch overhead through the axon tunnel favors large
chunks here; on directly-attached TPUs smaller chunks (4096-8192) have
better per-ray device time (memory pressure grows with chunk size).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from tensorf_tpu.models import FIELD_MODELS, ModelConfig
    from tensorf_tpu.models.alpha_mask import AlphaGridMask, with_dilation
    from tensorf_tpu.ops.rays import get_ray_directions, get_rays
    from tensorf_tpu.render.chunked import make_render_fn, render_chunked

    cfg = ModelConfig(
        model_name="TensorVMSplit",
        density_n_comp=(16, 16, 16),
        app_n_comp=(48, 48, 48),
        app_dim=27,
        shading_mode="MLP_Fea",
        pos_pe=2,
        view_pe=2,
        fea_pe=2,
        feature_c=128,
    )
    model = FIELD_MODELS[cfg.model_name]
    grid = (128, 128, 128)
    params = model.init(jax.random.PRNGKey(0), cfg, grid)
    aabb = jnp.asarray([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]])

    rng = np.random.default_rng(0)
    vol = (rng.uniform(size=grid) < 0.15).astype(np.float32)
    mask = with_dilation(AlphaGridMask(aabb=aabb, volume=jnp.asarray(vol)))

    H = W = 800
    focal = 0.5 * 800 / np.tan(0.5 * 0.6911)
    dirs = get_ray_directions(H, W, [focal, focal])
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 4.0
    rays_o, rays_d = get_rays(dirs, c2w)
    rays = np.concatenate([rays_o, rays_d], -1).astype(np.float32)

    fn = make_render_fn(
        model,
        cfg,
        step_size=float(3.0 / 127 * 0.5),
        n_samples=440,
        white_bg=True,
        ndc_ray=False,
        sample_budget=128,
    )

    # warm (compile)
    render_chunked(fn, params, mask, rays[:32768], aabb, chunk=32768)

    tic = time.perf_counter()
    frames = 3
    for _ in range(frames):
        rgb, depth, _ = render_chunked(
            fn, params, mask, rays, aabb, chunk=32768
        )
    toc = time.perf_counter()
    fps = frames / (toc - tic)
    print(
        json.dumps(
            {
                "metric": "render_800x800_fps",
                "value": round(fps, 3),
                "unit": "frames/s",
                "rays_per_sec": round(frames * H * W / (toc - tic), 1),
            }
        )
    )


if __name__ == "__main__":
    main()
