#!/usr/bin/env python
"""Serving-path time attribution: one 32k-ray eval chunk at varying
candidate tiers, plus the candidate-count pass, on the real trained
checkpoint.  Localizes why stratified serving (RENDER_r03) lands far
above its row floor: if a tier-32 chunk costs ~ a tier-448 chunk, the
fixed full-lattice work (sampling, gate probes, packing, top_k)
dominates and bucket budgets cannot help.

Usage: python scripts/ablate_render.py [--chunk 32768]
"""

import os

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
    ap.add_argument("--chunk", type=int, default=32768)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint to measure (default: BENCH_PARAMS.json"
                         " source_ckpt; that path can die with a VM reset)")
    args = ap.parse_args()

    import jax

    from tensorf_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from tensorf_tpu.data.blender import BlenderDataset
    from tensorf_tpu.models import FIELD_MODELS
    from tensorf_tpu.models.config import GridGeometry
    from tensorf_tpu.render.chunked import make_render_fn
    from tensorf_tpu.render.culling import count_ray_candidates_and_alive
    from tensorf_tpu.utils.ckpt import load_checkpoint

    with open(os.path.join(ROOT, "BENCH_PARAMS.json")) as f:
        bp = json.load(f)
    cfg, params, aabb_np, grid, mask, _ = load_checkpoint(
        args.ckpt or bp["source_ckpt"])
    model = FIELD_MODELS[cfg.model_name]
    geometry = GridGeometry.create(aabb_np, grid, cfg.step_ratio)
    aabb = jnp.asarray(geometry.aabb_np)

    ds = BlenderDataset(
        os.path.join(ROOT, "data", "synth_composite"), split="test",
        is_stack=True,
    )
    rays = np.asarray(ds.all_rays[0]).reshape(-1, 6).astype(np.float32)
    chunk = args.chunk

    def timed(f, *a, iters=args.iters):
        o = f(*a)
        jax.device_get(jnp.sum(o[0] if isinstance(o, tuple) else o))
        tic = time.perf_counter()
        for _ in range(iters):
            o = f(*a)
        jax.device_get(jnp.sum(o[0] if isinstance(o, tuple) else o))
        t1 = time.perf_counter() - tic
        tic = time.perf_counter()
        for _ in range(2 * iters):
            o = f(*a)
        jax.device_get(jnp.sum(o[0] if isinstance(o, tuple) else o))
        return ((time.perf_counter() - tic) - t1) / iters

    # count pass over the full frame (amortized part of stratified serving)
    tic = time.perf_counter()
    counts, alive, _ = count_ray_candidates_and_alive(
        rays, mask, geometry.aabb_np, geometry.step_size,
        tuple(float(v) for v in cfg.near_far), n_samples=geometry.n_samples,
        chunk=chunk,
    )
    t_count = time.perf_counter() - tic
    out = {
        "frame_rays": int(rays.shape[0]),
        "chunk": chunk,
        "n_samples": int(geometry.n_samples),
        "count_pass_s": round(t_count, 2),
        "mean_cand": round(float(counts.mean()), 1),
    }
    print(f"count pass {t_count:.2f}s (mean cand {counts.mean():.1f})",
          flush=True)

    # one chunk of the EASIEST rays (sorted ascending) at several tiers —
    # in the stratified driver the low tiers carry most of the frame
    order = np.argsort(counts, kind="stable")
    easy = jnp.asarray(rays[order[:chunk]])
    common = dict(
        step_size=float(geometry.step_size),
        n_samples=int(geometry.n_samples),
        white_bg=True, ndc_ray=False, shade_top_k=32,
    )
    # no unbudgeted (None) variant: the full-lattice packed-footprint
    # intermediate at chunk 32768 is (32768*1075, 64ch) f32 = 9 GB -> OOM
    for tier in (32, 128, 448):
        fn = make_render_fn(
            model, cfg, sample_budget=tier, budget_mode="cand", **common
        )
        t = timed(fn, params, mask, easy, aabb)
        out[f"chunk_ms_tier_{tier}"] = round(t * 1e3, 1)
        print(f"tier {str(tier):>5s}: {t*1e3:8.1f} ms / {chunk} rays",
              flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
