#!/usr/bin/env python
"""Render-throughput benchmark: 800x800 novel-view FPS (a BASELINE.json
headline metric).

Renders full 800x800 frames with the flagship TensorVMSplit model at its
post-training configuration through THREE render drivers:

  * chunked:     host loop at a fixed p99.9 sample budget, one device
                 dispatch per chunk (round-2 configuration, kept for
                 comparison; architecture parity: renderer.py:13-26);
  * frame:       one jitted program per frame (lax.map over ray tiles) —
                 immune to per-dispatch tunnel latency;
  * stratified:  the round-3 serving path (render_chunked_stratified):
                 count candidates per ray, sort, render each budget-tier
                 bucket at its own static budget.  Serving frames are
                 dominated by rays that hit little (measured mean
                 candidate count ~48-68 vs p99.9 416), so per-sample work
                 collapses toward the mean.

Stratified serving is CONTENT-dependent (bucket sizes come from the
scene), so this benchmark loads the real trained checkpoint + real test
camera (BENCH_PARAMS.json source_ckpt by default) rather than a synthetic
occupancy volume.  Writes RENDER_r05.json at the repo root and prints it.
"""

import os

# persistent XLA compile cache — first compile of each program through
# the tunneled TPU takes minutes; cached recompiles take seconds
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--datadir", default=os.path.join(ROOT, "data",
                                                      "synth_composite"))
    ap.add_argument("--frames", type=int, default=2)
    args = ap.parse_args()

    import jax

    from tensorf_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from tensorf_tpu.data.blender import BlenderDataset
    from tensorf_tpu.models import FIELD_MODELS
    from tensorf_tpu.models.config import GridGeometry
    from tensorf_tpu.render.chunked import (
        make_render_fn,
        render_chunked,
        render_chunked_stratified,
        render_frame,
    )
    from tensorf_tpu.utils.ckpt import load_checkpoint

    params_path = os.path.join(ROOT, "BENCH_PARAMS.json")
    budget = 416
    ckpt = args.ckpt
    if os.path.exists(params_path):
        with open(params_path) as f:
            d = json.load(f)
        budget = int(d.get("sample_budget", budget))
        ckpt = ckpt or d.get("source_ckpt")
    if not (ckpt and os.path.exists(ckpt)):
        # VERDICT r4 #2: degrade gracefully — the r4 recovery checklist
        # died here on a VM-reset-deleted ckpt.  Fall back to the newest
        # trained checkpoint under log/, else emit a well-formed JSON
        # error line (exit 0) so downstream checklist steps still run.
        import glob

        cands = sorted(
            glob.glob(os.path.join(ROOT, "log", "**", "*.npz"),
                      recursive=True),
            key=os.path.getmtime,
        )
        cands = [c for c in cands if "history" not in os.path.basename(c)]
        if cands:
            ckpt = cands[-1]
            print(f"[bench_render] falling back to newest ckpt: {ckpt}",
                  file=sys.stderr)
        else:
            print(json.dumps({
                "metric": "render_800x800_fps", "value": 0.0,
                "unit": "frames/s",
                "error": f"no trained checkpoint (got {ckpt}, none under "
                         "log/); run configs/synth_full.txt or pass --ckpt",
            }))
            return

    cfg, params, aabb_np, grid, mask, _ = load_checkpoint(ckpt)
    model = FIELD_MODELS[cfg.model_name]
    geometry = GridGeometry.create(aabb_np, grid, cfg.step_ratio)
    aabb = jnp.asarray(geometry.aabb_np)
    n_samples = geometry.n_samples
    step_size = geometry.step_size

    ds = BlenderDataset(args.datadir, split="test", is_stack=True)
    W, H = ds.img_wh
    rays = np.asarray(ds.all_rays[0]).reshape(-1, 6).astype(np.float32)

    common = dict(
        step_size=float(step_size), n_samples=int(n_samples),
        white_bg=True, ndc_ray=False, shade_top_k=32,
    )
    static = dict(model=model, cfg=cfg, sample_budget=budget, **common)
    fn = make_render_fn(model, cfg, sample_budget=budget, **common)

    def fps_of(run, frames):
        run()  # warm/compile
        tic = time.perf_counter()
        for _ in range(frames):
            run()
        tic2 = time.perf_counter()
        for _ in range(2 * frames):
            run()
        t2 = (time.perf_counter() - tic2) / (2 * frames)
        return 1.0 / t2, t2

    fps_strat, t_strat = fps_of(
        lambda: render_chunked_stratified(
            model, cfg, params, mask, rays, aabb, chunk=32768, **common
        ),
        args.frames,
    )
    # Pose-resident serving (round 5): camera directions live on device
    # for the whole session; a new view uploads only the 3x4 pose and
    # rays materialize on device (rays_from_pose) — the 15 MB/frame ray
    # upload (~1 s at the measured ~15 MB/s tunnel) disappears.  Same
    # compiled programs as the stratified arm.
    from tensorf_tpu.render.chunked import rays_from_pose

    dirs_dev = jnp.asarray(
        np.asarray(ds.directions).reshape(-1, 3).astype(np.float32)
    )
    pose = np.asarray(ds.poses[0], np.float32)

    def run_pose():
        rays_dev = rays_from_pose(dirs_dev, jnp.asarray(pose))
        return render_chunked_stratified(
            model, cfg, params, mask, rays_dev, aabb, chunk=32768, **common
        )

    fps_pose, t_pose = fps_of(run_pose, args.frames)
    fps_chunk, t_chunk = fps_of(
        lambda: render_chunked(fn, params, mask, rays, aabb, chunk=32768),
        args.frames,
    )
    fps_frame, t_frame = fps_of(
        lambda: render_frame(static, params, mask, rays, aabb, tile=32768),
        args.frames,
    )

    best = max(fps_strat, fps_pose, fps_frame, fps_chunk)
    out = {
        "metric": "render_800x800_fps",
        "value": round(best, 3),
        "unit": "frames/s",
        "fps_pose_resident": round(fps_pose, 3),
        "fps_stratified": round(fps_strat, 3),
        "fps_single_dispatch": round(fps_frame, 3),
        "fps_host_chunked": round(fps_chunk, 3),
        "dispatch_overhead_ms_per_frame": round((t_chunk - t_frame) * 1e3, 1),
        "ms_per_frame_stratified": round(t_strat * 1e3, 1),
        "ms_per_frame_fixed_budget": round(t_chunk * 1e3, 1),
        "rays_per_sec": round(H * W * best, 1),
        "config": {
            "ckpt": os.path.abspath(ckpt), "grid": list(grid),
            "sample_budget": budget, "shade_top_k": 32,
            "n_samples": int(n_samples), "img_wh": [W, H],
        },
    }
    line = json.dumps(out)
    print(line)
    with open(os.path.join(ROOT, "RENDER_r05.json"), "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
