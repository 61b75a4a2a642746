#!/usr/bin/env python
"""Measure post-convergence culling statistics from a trained checkpoint.

Replaces bench.py's modeled phase-B parameters with *measured* ones
(VERDICT r1 #2/#3): alpha-mask occupancy, the per-ray alive-sample
histogram under the final grid/mask, and the budget that covers a target
fraction of rays.  Writes BENCH_PARAMS.json at the repo root (bench.py
picks it up automatically).

Usage: python scripts/measure_occupancy.py <ckpt.npz> <datadir> [--out BENCH_PARAMS.json]
"""

import os

# persistent XLA compile cache — first compile of each program through
# the tunneled TPU takes minutes; cached recompiles take seconds
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("datadir")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "BENCH_PARAMS.json"
    ))
    ap.add_argument("--rays", type=int, default=65536)
    ap.add_argument("--stratify-by", default="cand", choices=["cand", "alive"])
    args = ap.parse_args()

    import jax

    from tensorf_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from tensorf_tpu.data.blender import BlenderDataset
    from tensorf_tpu.models.alpha_mask import (
        sample_alpha_gate,
        sample_alpha_gate_coarse,
        with_dilation,
    )
    from tensorf_tpu.models.config import GridGeometry
    from tensorf_tpu.ops.rays import sample_along_rays
    from tensorf_tpu.utils.ckpt import load_checkpoint

    model_cfg, params, aabb, grid_size, alpha_mask, _ = load_checkpoint(
        args.ckpt
    )
    geometry = GridGeometry.create(aabb, grid_size, model_cfg.step_ratio)
    ds = BlenderDataset(args.datadir, split="test", is_stack=False)
    rays = np.asarray(ds.all_rays, np.float32)
    sel = np.random.default_rng(0).choice(
        rays.shape[0], size=min(args.rays, rays.shape[0]), replace=False
    )
    rays = jnp.asarray(rays[sel])

    occupancy = float(np.asarray(alpha_mask.volume).mean()) if alpha_mask is not None else 1.0
    aabb_j = jnp.asarray(geometry.aabb_np)
    near, far = model_cfg.near_far

    alive_counts, cand_counts = [], []
    alpha_mask = with_dilation(alpha_mask) if alpha_mask is not None else None
    for i in range(0, rays.shape[0], 8192):
        chunk = rays[i : i + 8192]
        xyz, _, valid = sample_along_rays(
            chunk[:, :3], chunk[:, 3:6], aabb_j, near, far,
            geometry.step_size, geometry.n_samples, None,
        )
        if alpha_mask is not None:
            cand = valid & sample_alpha_gate_coarse(alpha_mask, xyz)
            alive = valid & (sample_alpha_gate(alpha_mask, xyz) > 0)
        else:
            cand = alive = valid
        alive_counts.append(np.asarray(jnp.sum(alive, axis=-1)))
        cand_counts.append(np.asarray(jnp.sum(cand, axis=-1)))
    alive = np.concatenate(alive_counts)
    cand = np.concatenate(cand_counts)

    pct = lambda a, q: int(np.percentile(a, q))
    stats = {
        "mask_occupancy": round(occupancy, 4),
        "grid_size": list(grid_size),
        "n_samples_lattice": geometry.n_samples,
        "alive_per_ray": {
            "mean": round(float(alive.mean()), 1),
            "p50": pct(alive, 50), "p90": pct(alive, 90),
            "p99": pct(alive, 99), "p999": pct(alive, 99.9),
            "max": int(alive.max()),
        },
        "candidates_per_ray": {
            "mean": round(float(cand.mean()), 1),
            "p50": pct(cand, 50), "p90": pct(cand, 90),
            "p99": pct(cand, 99), "p999": pct(cand, 99.9),
            "max": int(cand.max()),
        },
        # budget covering 99.9% of rays' exact-alive samples, padded to a
        # lane multiple — the two-stage compaction budgets exact-alive
        # samples (render/volume.py), so this is what bench.py and the
        # presets should use; the coarse candidate count only sizes the
        # internal K1 stage.
        "sample_budget": int(np.ceil(pct(alive, 99.9) / 32) * 32),
        "source_ckpt": os.path.abspath(args.ckpt),
    }
    hist, edges = np.histogram(cand, bins=16)
    stats["candidate_histogram"] = {
        "edges": [int(e) for e in edges], "counts": [int(c) for c in hist]
    }

    # ---- round 3: TRAINING-store stratification parameters ----
    # The serving-side stats above include rays that miss everything; the
    # train step samples the bbox+alpha-REFILTERED store, whose candidate
    # distribution is what sizes the stratified sub-batches (train/loop.py
    # ::restratify).  Reproduce that store and record the exact strata the
    # loop would build, so bench.py charges the real stratified step.
    from tensorf_tpu.render.culling import (
        _budget_hint,
        count_ray_candidates_and_alive,
        filter_rays_alpha,
        filter_rays_bbox,
        stratify_rays,
        stratify_rays_joint,
    )
    from tensorf_tpu.train.sampler import allocate_quotas

    train_ds = BlenderDataset(args.datadir, split="train", is_stack=False)
    t_rays = np.asarray(train_ds.all_rays, np.float32)
    t_rgbs = np.asarray(train_ds.all_rgbs, np.float32)
    t_rays, t_rgbs = filter_rays_bbox(t_rays, t_rgbs, geometry.aabb_np)
    if alpha_mask is not None:
        t_rays, _ = filter_rays_alpha(
            t_rays, t_rgbs, alpha_mask, geometry.aabb_np,
            geometry.step_size, (near, far),
        )
    t_sel = np.random.default_rng(1).choice(
        t_rays.shape[0], size=min(4 * args.rays, t_rays.shape[0]),
        replace=False,
    )
    t_counts, t_alive, t_chord = count_ray_candidates_and_alive(
        t_rays[t_sel], alpha_mask, geometry.aabb_np, geometry.step_size,
        (near, far), n_samples=geometry.n_samples,
    )
    # candidate-primary stratification is the measured optimum (per-row
    # gather/scatter cost is nearly width-flat — SCATTER_RECHECK_r03.txt —
    # so total rows moved dominates; the alive-primary joint partition
    # that tightens stage-2 at the cost of looser stage-1 budgets measured
    # a wash for VMSplit and a 1.46x regression for CP).  --stratify-by
    # alive reproduces the A/B.
    if args.stratify_by == "alive":
        strata, budgets, alive_hints = stratify_rays_joint(t_counts, t_alive)
    else:
        strata, budgets = stratify_rays(t_counts)
        alive_hints = []
        for sel, b in zip(strata, budgets):
            hint = _budget_hint(t_alive[sel].max())
            alive_hints.append(hint if hint < int(b) else None)
    alive_budgets = [int(a) if a is not None else 0 for a in alive_hints]
    batch = 4096
    quotas = allocate_quotas([s.size for s in strata], batch, 8)
    stats["train_strata"] = {
        "store_mean_candidates": round(float(t_counts.mean()), 1),
        "store_p999_candidates": int(np.percentile(t_counts, 99.9)),
        "store_mean_alive": round(float(t_alive.mean()), 1),
        "sizes": [int(s.size) for s in strata],
        "quotas": quotas,
        "budgets": [int(b) for b in budgets],
        "alive_budgets": alive_budgets,
        # per-stratum chord-capped lattices (train/loop.py::restratify):
        # samples start at the bbox entry, so the stratum's longest chord
        # bounds the lattice it must sample
        "n_eff": [
            int(min(geometry.n_samples, _budget_hint(t_chord[sel].max())))
            for sel in strata
        ],
        "batch": batch,
    }

    # ---- phase-A (mask-free 128^3 warm-up) prefilter budget ----
    # in-bbox candidate counts on the bbox-filtered train store at the
    # INIT grid geometry; p999 (padded) is the monitored prefilter_budget
    # the presets should carry (VERDICT r2 #7).
    init_geom = GridGeometry.create(
        np.asarray(train_ds.scene_bbox, np.float32).reshape(2, 3),
        (128, 128, 128), model_cfg.step_ratio,
    )
    a_rays = np.asarray(train_ds.all_rays, np.float32)
    a_rays, _ = filter_rays_bbox(
        a_rays, np.asarray(train_ds.all_rgbs, np.float32), init_geom.aabb_np
    )
    a_sel = np.random.default_rng(2).choice(
        a_rays.shape[0], size=min(args.rays, a_rays.shape[0]), replace=False
    )
    from tensorf_tpu.render.culling import count_ray_inbbox

    # group-padded counts (the statistic the window-granular compaction
    # pays) — same function the train loop's prefilter restratify uses
    a_counts = count_ray_inbbox(
        a_rays[a_sel], init_geom.aabb_np, init_geom.step_size, (near, far),
        n_samples=init_geom.n_samples,
    )
    # in-bbox stratification of the warm-up phase (train/loop.py
    # ::restratify mask-free branch): per-stratum budgets from the same
    # DP partition the loop uses, so bench.py charges the real phase-A
    # stratified step.
    a_strata, a_budgets = stratify_rays(a_counts)
    a_quotas = allocate_quotas([s.size for s in a_strata], batch, 8)
    stats["prefilter"] = {
        "n_samples_lattice": init_geom.n_samples,
        "mean_in_bbox": round(float(a_counts.mean()), 1),
        "p999_in_bbox": int(np.percentile(a_counts, 99.9)),
        "prefilter_budget": int(
            np.ceil(np.percentile(a_counts, 99.9) / 32) * 32
        ),
        "strata": {
            "sizes": [int(s.size) for s in a_strata],
            "quotas": a_quotas,
            "budgets": [int(b) for b in a_budgets],
            "batch": batch,
        },
    }

    with open(args.out, "w") as f:
        json.dump(stats, f, indent=1)
    print(json.dumps(stats, indent=1))


if __name__ == "__main__":
    main()
