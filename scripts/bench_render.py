#!/usr/bin/env python
"""Render-throughput benchmark: 800x800 novel-view FPS (a BASELINE.json
headline metric).

Renders full 800x800 frames with the flagship TensorVMSplit model at its
post-training configuration (300^3 grid, alpha mask, sample budget,
top-K shading) through BOTH render drivers:

  * chunked:  host loop, one device dispatch per chunk (the reference's
              renderer.py:13-26 architecture, kept for parity);
  * frame:    one jitted program per frame (lax.map over ray tiles) — the
              TPU-native serving path, immune to per-dispatch tunnel
              latency.

Writes RENDER_r02.json next to the repo root and prints it.  The
dispatch-vs-device split is measured directly: chunked-vs-frame delta is
dispatch overhead; the frame path's N-vs-2N delta is pure device time.
"""

import os

# persistent XLA compile cache — first compile of each program through
# the tunneled TPU takes minutes; cached recompiles take seconds
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    from tensorf_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from tensorf_tpu.models import FIELD_MODELS, ModelConfig
    from tensorf_tpu.models.alpha_mask import AlphaGridMask, with_dilation
    from tensorf_tpu.models.config import cal_n_samples
    from tensorf_tpu.ops.rays import get_ray_directions, get_rays
    from tensorf_tpu.render.chunked import (
        make_render_fn,
        render_chunked,
        render_frame,
    )

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

    # serving configuration: final 300^3 grid + measured-or-default params
    grid = (300, 300, 300)
    params_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "BENCH_PARAMS.json"
    )
    occupancy, budget = 0.15, 160
    if os.path.exists(params_path):
        with open(params_path) as f:
            d = json.load(f)
        occupancy = d.get("mask_occupancy", occupancy)
        budget = d.get("sample_budget", budget)

    params = model.init(jax.random.PRNGKey(0), cfg, grid)
    aabb = jnp.asarray([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]])
    rng = np.random.default_rng(0)
    mg = 214
    vol = (rng.uniform(size=(mg, mg, mg)) < occupancy).astype(np.float32)
    mask = with_dilation(AlphaGridMask(aabb=aabb, volume=jnp.asarray(vol)))

    H = W = 800
    focal = 0.5 * 800 / np.tan(0.5 * 0.6911)
    dirs = get_ray_directions(H, W, [focal, focal])
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 4.0
    rays_o, rays_d = get_rays(dirs, c2w)
    rays = np.concatenate([rays_o, rays_d], -1).astype(np.float32)

    n_samples = cal_n_samples(grid, 0.5)
    static = dict(
        model=model, cfg=cfg,
        step_size=float(3.0 / (grid[0] - 1) * 0.5),
        n_samples=n_samples, white_bg=True, ndc_ray=False,
        sample_budget=int(budget), shade_top_k=32,
    )
    fn = make_render_fn(
        model, cfg,
        step_size=static["step_size"], n_samples=n_samples,
        white_bg=True, ndc_ray=False,
        sample_budget=int(budget), shade_top_k=32,
    )

    def fps_of(run, frames=3):
        run()  # warm/compile
        tic = time.perf_counter()
        for _ in range(frames):
            run()
        t1 = (time.perf_counter() - tic) / frames
        tic = time.perf_counter()
        for _ in range(2 * frames):
            run()
        t2 = (time.perf_counter() - tic) / (2 * frames)
        # t1 includes any warmup residue; prefer the steadier 2N number
        return 1.0 / t2, t2

    fps_chunk, t_chunk = fps_of(
        lambda: render_chunked(fn, params, mask, rays, aabb, chunk=32768)
    )
    fps_frame, t_frame = fps_of(
        lambda: render_frame(static, params, mask, rays, aabb, tile=32768)
    )

    out = {
        "metric": "render_800x800_fps",
        "value": round(max(fps_frame, fps_chunk), 3),
        "unit": "frames/s",
        "fps_single_dispatch": round(fps_frame, 3),
        "fps_host_chunked": round(fps_chunk, 3),
        "dispatch_overhead_ms_per_frame": round(
            (t_chunk - t_frame) * 1e3, 1
        ),
        "device_ms_per_frame": round(t_frame * 1e3, 1),
        "rays_per_sec": round(H * W * max(fps_frame, fps_chunk), 1),
        "config": {
            "grid": grid[0], "sample_budget": int(budget),
            "mask_occupancy": occupancy, "shade_top_k": 32,
            "n_samples": n_samples,
        },
    }
    line = json.dumps(out)
    print(line)
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     "RENDER_r02.json"), "w",
    ) as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
