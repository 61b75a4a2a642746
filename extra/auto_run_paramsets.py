#!/usr/bin/env python
"""Hyperparameter sweep orchestrator — TPU-native successor of the
reference's GPU sweep runner (reference extra/auto_run_paramsets.py).

Keeps the reference's operational features:
  * cartesian-product expansion of a param dict into CLI flag strings and
    experiment names (get_param_list, reference :28-67),
  * a worker pool that claims accelerators from a queue (reference claims
    GPUs via CUDA_VISIBLE_DEVICES; here each worker pins a TPU host/chip
    via env — on a pod slice each worker would target a different host),
  * mkdir-based folder-lock mutex so concurrent workers don't claim the
    same experiment (reference :7-16),
  * skip-if-folder-exists idempotent resume of interrupted sweeps
    (reference :192-195),
  * a stopFolder sentinel for cooperative abort (reference :18-19).

Usage: edit PARAM_DICT below (or import run_sweep) and run
  python extra/auto_run_paramsets.py --datafolder <data_root> --basedir ./log
"""

from __future__ import annotations

import argparse
import itertools
import os
import queue
import subprocess
import threading
import time
from typing import Dict, List, Sequence, Tuple


def get_folder_locker(log_folder: str):
    """mkdir-based cross-process mutex (reference :7-13)."""
    while True:
        try:
            os.makedirs(log_folder + "/lockFolder")
            break
        except OSError:
            time.sleep(0.01)


def release_folder_locker(log_folder: str):
    os.removedirs(log_folder + "/lockFolder")


def get_stop_folder(log_folder: str) -> bool:
    return os.path.isdir(log_folder + "/stopFolder")


def get_param_list(
    param_dict: Dict, datafolder: str = ""
) -> Tuple[List[str], List[str]]:
    """Cartesian product of a {flag: [values]} dict -> (cli strings,
    experiment names).  Tuple keys zip their values together (reference
    :28-67)."""

    def param_str(key: str, val) -> str:
        if key == "data_name":
            return f"--datadir {datafolder}/{val} "
        return f"--{key} {val} "

    keys = list(param_dict.keys())
    params, expnames = [], []
    for combo in itertools.product(*(param_dict[k] for k in keys)):
        one, name = "", ""
        for key, val in zip(keys, combo):
            if isinstance(key, tuple):
                assert len(key) == len(val)
                for k, v in zip(key, val):
                    one += param_str(k, v)
                    name += f"{v},"
                name = name[:-1] + "-"
            else:
                one += param_str(key, val)
                name += f"{val}-"
        params.append(one)
        expnames.append(name.replace(" ", "")[:-1])
    return params, expnames


def run_sweep(
    param_dict: Dict,
    *,
    basedir: str = "./log",
    datafolder: str = "",
    config: str = "configs/lego.txt",
    devices: Sequence[str] = ("0",),
    dry_run: bool = False,
):
    """Run every combination, one worker per accelerator."""
    params, expnames = get_param_list(param_dict, datafolder)
    os.makedirs(basedir, exist_ok=True)

    dev_queue: "queue.Queue[str]" = queue.Queue()
    for d in devices:
        dev_queue.put(d)

    def launch(cli: str, expname: str, device: str):
        try:
            cmd = (
                f"python train.py --config {config} {cli}"
                f"--expname {expname} --basedir {basedir}"
            )
            print(f"[sweep][dev {device}] {cmd}")
            if not dry_run:
                env = dict(os.environ)
                # single-host: select the chip; multi-host pods would set
                # the target host / coordinator address here instead.
                env["TPU_VISIBLE_DEVICES"] = device
                subprocess.run(cmd, shell=True, env=env, check=False)
        finally:
            dev_queue.put(device)

    threads = []
    for cli, expname in zip(params, expnames):
        if get_stop_folder(basedir):
            print("[sweep] stopFolder present — aborting remaining runs")
            break

        # claim the experiment folder under the lock (reference :185-195)
        get_folder_locker(basedir)
        try:
            exp_dir = os.path.join(basedir, expname)
            if os.path.isdir(exp_dir):
                print(f"[sweep] skip existing {expname}")
                continue
            os.makedirs(exp_dir, exist_ok=True)
        finally:
            release_folder_locker(basedir)

        device = dev_queue.get()  # blocks until an accelerator frees up
        t = threading.Thread(target=launch, args=(cli, expname, device))
        t.start()
        threads.append(t)

    for t in threads:
        t.join()


PARAM_DICT = {
    "data_name": ["lego", "chair", "drums", "ficus", "hotdog",
                  "materials", "mic", "ship"],
    "model_name": ["TensorVMSplit"],
    "n_iters": [30000],
}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--datafolder", default="./data/nerf_synthetic")
    ap.add_argument("--basedir", default="./log/sweep")
    ap.add_argument("--config", default="configs/lego_vm.txt")
    ap.add_argument("--devices", default="0",
                    help="comma-separated accelerator ids")
    ap.add_argument("--dry_run", action="store_true")
    args = ap.parse_args()
    run_sweep(
        PARAM_DICT,
        basedir=args.basedir,
        datafolder=args.datafolder,
        config=args.config,
        devices=args.devices.split(","),
        dry_run=args.dry_run,
    )
