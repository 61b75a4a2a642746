#!/usr/bin/env python
"""Matched-seed stratified-vs-unstratified quality A/B on CPU (VERDICT r3 #4).

The r3 question: the 30k stratified run came in 0.84 dB below the r2
unstratified run, attributed (untested) to single-seed spread.  The full
15k/30k A/B needs the TPU (configs/synth_ab_*.txt are queued on tunnel
recovery — /tmp/on_recovery.sh); this harness is the CPU-scale version of
the same experiment: the full coarse-to-fine schedule (5 upsamples +
2 alpha-mask/shrink events, configs/synth_long.txt) run to completion with
stratification ON vs OFF under MATCHED seeds, several seeds per arm, so
both the per-arm spread and the paired per-seed delta are measured rather
than assumed.

Reference experiment analog: /root/reference/train.py:450-480 (the
schedule whose endpoint quality must not regress under our batching).

Round 5 (VERDICT r4 #5): four arms at matched seeds, with the
noise-match fix now default-on —

  unstrat      stratify=0                  (reference-composition baseline)
  strat        stratify=1 (defaults)       (the fix: noise-matched, shipping)
  strat_nonm   stratify=1 noise_match=0    (the r4 defect configuration —
                                            should reproduce the ~-0.9 dB
                                            generalization gap)
  diag_single  stratify=1, one stratum     (machinery control: stratified
               (strata_quantiles=[1.0])     code path, uniform composition)

Runs sequentially (1 CPU core — CLAUDE.md); compile cache makes seeds
after the first much cheaper.  Writes AB_QUALITY_CPU_r05.json.

  python scripts/ab_quality_cpu.py [--seeds 3] [--iters 3000]
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# the A/B's 40x40 scene gets its OWN directory: round 5 found that writing
# it to data/synth_sphere silently downgraded the verify-skill scene
# (800x800, same path, gitignored — the VM reset deleted it and this
# script's regeneration won the race), which cost a verify drive ~4.6 dB
SCENE_DIR = os.path.join(ROOT, "data", "synth_sphere_ab40")


def ensure_scene() -> None:
    if not os.path.exists(os.path.join(SCENE_DIR, "transforms_train.json")):
        sys.path.insert(0, ROOT)
        from tensorf_tpu.data.synthetic import make_synthetic_blender_scene

        make_synthetic_blender_scene(
            SCENE_DIR, n_train=10, n_test=2, wh=(40, 40))


ARM_FLAGS = {
    # the shipping default: noise-matched stratification (the fix)
    "strat": ["--stratify", "1", "--stratify_prefilter", "1"],
    "unstrat": ["--stratify", "0", "--stratify_prefilter", "0"],
    # the r4 defect configuration: quota-fixed stratified batches
    "strat_nonm": ["--stratify", "1", "--stratify_prefilter", "1",
                   "--stratify_noise_match", "0"],
    # machinery control: stratified code path, single stratum -> uniform
    # composition (distinguishes composition effects from code-path bugs)
    "diag_single": ["--stratify", "1", "--stratify_prefilter", "0",
                    "--strata_quantiles", "[1.0]"],
}


def run_one(arm: str, seed: int, iters: int) -> dict:
    exp = f"ab_{arm}_s{seed}"
    log_path = f"/tmp/{exp}.log"
    cmd = [
        sys.executable, os.path.join(ROOT, "train.py"),
        "--config", os.path.join(ROOT, "configs/synth_long.txt"),
        "--datadir", SCENE_DIR,
        "--platform", "cpu",
        "--expname", exp,
        "--basedir", os.path.join(ROOT, "log_ab"),
        "--n_iters", str(iters),
        "--seed", str(seed),
        *ARM_FLAGS[arm],
        "--N_vis", "2",
        "--vis_every", "0",
        "--train_vis_every", "0",
        "--render_test", "1",
    ]
    env = dict(os.environ, JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache_ab")
    tic = time.time()
    with open(log_path, "w") as f:
        rc = subprocess.call(cmd, cwd=ROOT, env=env, stdout=f,
                             stderr=subprocess.STDOUT)
    wall = time.time() - tic
    psnr = None
    with open(log_path) as f:
        for ln in f:
            m = re.search(r"test all psnr: ([0-9.]+)", ln)
            if m:
                psnr = float(m.group(1))
    return {"arm": arm, "seed": seed, "rc": rc, "psnr": psnr,
            "wall_s": round(wall, 1), "log": log_path}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--iters", type=int, default=3000)
    args = ap.parse_args()
    ensure_scene()
    runs = []
    # interleave arms so a mid-experiment interrupt still leaves pairs;
    # the two headline arms run first at every seed, diagnostics after
    for i in range(args.seeds):
        seed = 20211202 + 1000 * i
        for arm in ("strat", "unstrat", "strat_nonm", "diag_single"):
            r = run_one(arm, seed, args.iters)
            runs.append(r)
            print(json.dumps(r), flush=True)
            _write(runs, args)
    return 0


def _write(runs, args) -> None:
    by_arm = {}
    for r in runs:
        if r["psnr"] is not None and r["rc"] == 0:
            by_arm.setdefault(r["arm"], []).append(r["psnr"])
    pairs = {}
    for r in runs:
        pairs.setdefault(r["seed"], {})[r["arm"]] = r["psnr"]
    def paired(a, b):
        return [
            round(p[a] - p[b], 3)
            for p in pairs.values()
            if p.get(a) is not None and p.get(b) is not None
        ]

    summary = {
        "runs": runs,
        "iters": args.iters,
        "schedule": "synth_long (5 upsamples + 2 alpha-mask/shrink)",
        "psnr_by_arm": {
            a: {
                "mean": round(sum(v) / len(v), 3),
                "min": round(min(v), 3),
                "max": round(max(v), 3),
                "n": len(v),
            }
            for a, v in by_arm.items()
        },
        "paired_delta_strat_minus_unstrat": paired("strat", "unstrat"),
        "paired_delta_nonm_minus_unstrat": paired("strat_nonm", "unstrat"),
        "paired_delta_single_minus_unstrat": paired("diag_single",
                                                    "unstrat"),
        "platform": "cpu",
    }
    with open(os.path.join(ROOT, "AB_QUALITY_CPU_r05.json"), "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    sys.exit(main())
