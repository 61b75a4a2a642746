#!/usr/bin/env python
"""REAL multi-process SPMD smoke run: 2 ranks x 4 CPU devices, gloo.

Launches two actual `train.py --distributed 1` processes that join one
8-device global mesh via jax.distributed (CPU backend, gloo cross-process
collectives) and train the tiny procedural sphere scene through the full
schedule (upsample + alpha-mask/shrink + refilter + stratification), then
verifies:

  * both ranks exit 0,
  * every `stratified ray store:` statics line is IDENTICAL across ranks
    (the multi-host SPMD invariant: same compiled step programs),
  * rank 0 wrote the eval artifacts and the final PSNR clears the same
    bar as the single-process e2e test.

This upgrades SURVEY.md §2.10 "multi-host" from monkeypatch-simulated to
actually-executed (the reference has no multi-host story at all).  Run
from the repo root:  python scripts/multihost_smoke.py

Writes MULTIHOST_SMOKE_r04.json at the repo root.
"""

import argparse
import json
import os
import re
import socket
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_ITERS = 280  # crosses upsample@150, mask+shrink@200, refilter@260
TIMEOUT_S = 3600


def free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def ensure_scene() -> str:
    path = os.path.join(ROOT, "data", "synth_sphere")
    if not os.path.exists(os.path.join(path, "transforms_train.json")):
        sys.path.insert(0, ROOT)
        from tensorf_tpu.data.synthetic import make_synthetic_blender_scene

        make_synthetic_blender_scene(path, n_train=10, n_test=2, wh=(40, 40))
    return path


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_proc", type=int, default=2,
                    help="process count; devices-per-process is 8//n_proc "
                         "so every factorization shares the same 8-device "
                         "global mesh (and thus the same strata statics)")
    ap.add_argument("--out", default="MULTIHOST_SMOKE_r04.json")
    args = ap.parse_args()
    n_proc = args.n_proc
    assert 8 % n_proc == 0, n_proc
    dev_per = 8 // n_proc
    ensure_scene()
    port = free_port()
    logdir = os.path.join(ROOT, "log_mh")
    procs, logs = [], []
    tic = time.time()
    for rank in range(n_proc):
        env = dict(os.environ)
        env.update(
            TFTPU_COORDINATOR=f"localhost:{port}",
            TFTPU_NUM_PROCESSES=str(n_proc),
            TFTPU_PROCESS_ID=str(rank),
            TFTPU_CPU_DEVICES=str(dev_per),
            TFTPU_CPU_COLLECTIVES="gloo",
            JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache_mh",
        )
        log_path = f"/tmp/mh_rank{rank}.log"
        logs.append(log_path)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    os.path.join(ROOT, "train.py"),
                    "--config", os.path.join(ROOT, "configs/synth_sphere.txt"),
                    "--platform", "cpu",
                    "--distributed", "1",
                    "--basedir", logdir,
                    "--expname", "mh_smoke",
                    "--n_iters", str(N_ITERS),
                    "--batch_size", "512",
                    "--N_vis", "1",
                    "--vis_every", "0",
                    "--train_vis_every", "0",
                ],
                cwd=ROOT,
                env=env,
                stdout=open(log_path, "w"),
                stderr=subprocess.STDOUT,
            )
        )
    rcs = []
    deadline = time.time() + TIMEOUT_S
    for p in procs:
        try:
            rcs.append(p.wait(timeout=max(1, deadline - time.time())))
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            rcs.append(-9)
    wall = time.time() - tic

    def lines_of(path, pat):
        with open(path) as f:
            return [ln.strip() for ln in f if re.search(pat, ln)]

    strat = [lines_of(lg, r"stratified ray store:") for lg in logs]
    statics_match = (
        all(s == strat[0] for s in strat[1:]) and len(strat[0]) > 0
    )
    psnr = None
    for ln in lines_of(logs[0], r"test all psnr"):
        m = re.search(r"psnr: ([0-9.]+)", ln)
        if m:
            psnr = float(m.group(1))
    mean_txt = None
    for base, _, files in os.walk(logdir):
        if "mean.txt" in files and "mh_smoke" in base:
            mean_txt = os.path.join(base, "mean.txt")
    ok = (
        all(rc == 0 for rc in rcs)
        and statics_match
        and psnr is not None
        and psnr > 17.0
        and mean_txt is not None
    )
    result = {
        "ok": ok,
        "rcs": rcs,
        "wall_s": round(wall, 1),
        "n_processes": n_proc,
        "devices_per_process": dev_per,
        "n_iters": N_ITERS,
        "statics_lines_per_rank": [len(s) for s in strat],
        "statics_match": statics_match,
        "final_test_psnr": psnr,
        "mean_txt": mean_txt,
        "collectives": "gloo",
    }
    out = os.path.join(ROOT, args.out)
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
