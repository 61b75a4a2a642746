#!/usr/bin/env python
"""Summarize a full-schedule training run into RUN_30K.md.

Reads the run's log folder (history.npz, mean.txt, training_time.txt) and
the captured stdout log, plus BENCH_PARAMS.json if measure_occupancy has
run, and writes the markdown report VERDICT r1 #2 asks for: PSNR curve,
schedule events, budget-overflow / auto-raise history, wall-clock, final
metrics, measured occupancy + alive-sample histogram.

Usage: python scripts/summarize_run.py <logfolder> <stdout_log> [--out RUN_30K.md]
"""

import argparse
import json
import os
import re
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logfolder")
    ap.add_argument("stdout_log")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "RUN_30K.md"))
    args = ap.parse_args()

    lines = open(args.stdout_log, errors="replace").read().splitlines()
    events = [
        l for l in lines
        if re.search(r"^\[\d+\]|alpha ray filtering|\[budget\]", l)
    ]
    iters = [
        l for l in lines if l.startswith("Iteration")
    ]
    hist_path = os.path.join(args.logfolder, "history.npz")
    hist = dict(np.load(hist_path)) if os.path.exists(hist_path) else {}
    mean_path = os.path.join(args.logfolder, "imgs_test_all", "mean.txt")
    mean_vals = (
        np.loadtxt(mean_path).reshape(-1).tolist()
        if os.path.exists(mean_path)
        else []
    )
    tt_path = os.path.join(args.logfolder, "training_time.txt")
    wall = open(tt_path).read().strip() if os.path.exists(tt_path) else "?"

    params_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "BENCH_PARAMS.json"
    )
    bench_params = (
        json.load(open(params_path)) if os.path.exists(params_path) else None
    )

    out = []
    out.append("# RUN_30K — full-schedule training run (composite scene)\n")
    out.append(
        "The reference's canonical 30k-iteration coarse-to-fine schedule "
        "(configs/config.yaml:32-91: N_voxel 128^3->300^3, upsamp "
        "[2000,3000,4000,5500,7000], alphaMask [2000,4000]) run end-to-end "
        "at 800x800 on the procedural composite scene "
        "(`configs/synth_full.txt`, `tensorf_tpu/data/synthetic.py`), on "
        "one TPU v5e chip.\n"
    )
    out.append(f"* wall-clock: {wall}")
    if mean_vals:
        names = ["PSNR", "SSIM", "LPIPS-alex", "LPIPS-vgg"]
        final = ", ".join(
            f"{n} {v:.4f}" for n, v in zip(names, mean_vals)
        )
        out.append(f"* final test metrics (mean.txt): {final}")
    out.append("")
    out.append("## PSNR curve (train / test at eval points)\n")
    if hist:
        out.append("| iteration | train PSNR | test PSNR | mse |")
        out.append("|---|---|---|---|")
        for i in range(len(hist.get("iteration", []))):
            out.append(
                f"| {int(hist['iteration'][i])} | "
                f"{hist['train_psnr'][i]:.2f} | "
                f"{hist['test_psnr'][i]:.2f} | {hist['mse'][i]:.5f} |"
            )
    # per-segment step time from consecutive Iteration lines (VERDICT r2
    # #4 done-criterion: steady-state rate vs the benched step rate)
    seg = []
    pat = re.compile(r"Iteration (\d+):.*elapsed = ([\d.]+)s")
    prev = None
    for l in iters:
        m = pat.search(l)
        if not m:
            continue
        it, el = int(m.group(1)), float(m.group(2))
        if prev is not None and it > prev[0]:
            seg.append((prev[0], it, (el - prev[1]) / (it - prev[0]) * 1e3))
        prev = (it, el)
    if seg:
        out.append("## Per-segment step time (ms/iter, includes event/"
                   "compile overhead at boundaries)\n")
        out.append("| iters | ms/iter |")
        out.append("|---|---|")
        for a, b, ms in seg:
            out.append(f"| {a}-{b} | {ms:.1f} |")
        steady = [ms for a, b, ms in seg if a >= 7000]
        if steady:
            out.append(
                f"\nSteady-state (>=7000, final grid incl. eval pauses): "
                f"median {np.median(steady):.1f} ms/iter."
            )
    out.append("")
    out.append("## Progress line samples\n```")
    step = max(1, len(iters) // 20)
    out.extend(iters[::step])
    out.append("```\n")
    out.append("## Schedule events + budget self-verification\n```")
    out.extend(events)
    out.append("```\n")
    if bench_params:
        out.append("## Measured post-convergence culling statistics\n")
        out.append("```json")
        out.append(json.dumps(bench_params, indent=1))
        out.append("```")
        out.append(
            "\nThese parameters calibrate bench.py's mask-era phases "
            "(BENCH_PARAMS.json)."
        )
    with open(args.out, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
