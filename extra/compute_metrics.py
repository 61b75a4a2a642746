#!/usr/bin/env python
"""Offline metric recomputation over saved renders.

Counterpart of reference extra/compute_metrics.py:83-182 (which is broken
as written — its scene lists live in comments): re-scores prediction PNGs
against ground-truth PNGs across experiment folders, writing per-scene and
mean PSNR/SSIM (and LPIPS when available).

Usage:
  python extra/compute_metrics.py --exp_folder ./log/<date> \
      [--scenes lego,chair] [--pred prediction --gt ground_truth]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tensorf_tpu.eval.metrics import psnr, rgb_lpips, rgb_ssim  # noqa: E402


def score_pair(pred_path: str, gt_path: str):
    import imageio.v2 as imageio

    pred = np.asarray(imageio.imread(pred_path), np.float64) / 255.0
    gt = np.asarray(imageio.imread(gt_path), np.float64) / 255.0
    pred, gt = pred[..., :3], gt[..., :3]
    out = {
        "psnr": psnr(pred, gt),
        "ssim": rgb_ssim(pred, gt, 1),
    }
    la = rgb_lpips(gt.astype(np.float32), pred.astype(np.float32), "alex")
    if la is not None:
        out["lpips_alex"] = la
    return out


def score_scene(scene_dir: str, pred: str, gt: str):
    pred_dir, gt_dir = os.path.join(scene_dir, pred), os.path.join(scene_dir, gt)
    if not (os.path.isdir(pred_dir) and os.path.isdir(gt_dir)):
        return None
    rows = []
    for name in sorted(os.listdir(pred_dir)):
        gt_path = os.path.join(gt_dir, name)
        if os.path.exists(gt_path):
            rows.append(score_pair(os.path.join(pred_dir, name), gt_path))
    if not rows:
        return None
    return {k: float(np.mean([r[k] for r in rows if k in r])) for k in rows[0]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp_folder", required=True)
    ap.add_argument("--scenes", default="",
                    help="comma-separated subfolders; default: all")
    ap.add_argument("--pred", default="imgs_test_all/prediction")
    ap.add_argument("--gt", default="imgs_test_all/ground_truth")
    args = ap.parse_args()

    scenes = (
        args.scenes.split(",")
        if args.scenes
        else sorted(
            d
            for d in os.listdir(args.exp_folder)
            if os.path.isdir(os.path.join(args.exp_folder, d))
        )
    )
    all_scores = {}
    for scene in scenes:
        s = score_scene(os.path.join(args.exp_folder, scene), args.pred, args.gt)
        if s:
            all_scores[scene] = s
            print(scene, " ".join(f"{k}={v:.4f}" for k, v in s.items()))
    if all_scores:
        keys = next(iter(all_scores.values())).keys()
        means = {
            k: float(np.mean([s[k] for s in all_scores.values() if k in s]))
            for k in keys
        }
        print("mean", " ".join(f"{k}={v:.4f}" for k, v in means.items()))
        out = os.path.join(args.exp_folder, "metrics_recomputed.txt")
        with open(out, "w") as f:
            for scene, s in all_scores.items():
                f.write(f"{scene} {s}\n")
            f.write(f"mean {means}\n")
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
