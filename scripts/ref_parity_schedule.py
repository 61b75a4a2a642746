#!/usr/bin/env python
"""Reference-semantics trajectory parity THROUGH schedule events (VERDICT
r3 #6 — ref_parity.py stops at 600 single-segment iters; this harness
drives both sides through the full intended schedule).

Events exercised (the reference's intended train.py:450-480 block, which
its shipped loop never reaches due to the premature ``return`` at
train.py:447 — SURVEY.md §2.11):

  * iter 300: updateAlphaMask (tensorBase.py:233) + shrink (tensoRF.py:291)
    + fresh Adam at lr_init (param shapes changed)
  * iter 450: upsample_volume_grid (tensoRF.py:283) to N_VOXEL_FINAL +
    nSamples = min(old, cal_n_samples(new_reso)) + fresh Adam
    (lr_upsample_reset semantics: lr_scale = 1)
  * iter 700: updateAlphaMask + alpha-based filtering_rays
    (tensorBase.py:259) + fresh sampler over the filtered store
  * after the first mask event both sides switch L1 8e-5 -> 4e-5
    (opt.py:50 L1_weight_rest)

The reference side drives the torch model classes directly on CPU; the
ours side drives tensorf_tpu's step/upsample/shrink/culling primitives
with identical hyperparameters.  Initializations are independent RNG
draws, so agreement is statistical: matching event markers (occupancy %,
shrunk grid size, corrected aabb, kept-ray ratio) and the same converged
test PSNR within a few tenths of a dB.

Usage:
  python scripts/ref_parity_schedule.py [--iters 900] [--skip-ref]
      [--skip-ours] [--ours-cpu] [--out PARITY_SCHEDULE.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, ROOT)

GRID_INIT = (24, 24, 24)
N_VOXEL_FINAL = 40 ** 3
BATCH = 1024
EVAL_EVERY = 100
LR_INIT, LR_BASIS = 0.02, 1e-3
L1_W, L1_W_REST = 8e-5, 4e-5
ORTHO_W = 0.01
LR_DECAY_RATIO = 0.1
STEP_RATIO = 0.5
ALPHA_LIST = [300, 700]
UPSAMP_LIST = [450]
_SMOKE = os.environ.get("PARITY_SMOKE")
if _SMOKE:  # tiny-schedule smoke mode for CI/dev (events at 20/30/45)
    ALPHA_LIST = [20, 45]
    UPSAMP_LIST = [30]

ARGS_DICT = dict(
    step_ratio=STEP_RATIO,
    fea2denseAct="softplus",
    density_n_comp=[4, 4, 4],
    app_n_comp=[8, 8, 8],
    app_dim=9,
    density_shift=-3.0,
    distance_scale=25.0,
    alphaMask_thres=1e-4,
    shadingMode="MLP_Fea",
    pos_pe=2,
    view_pe=2,
    fea_pe=2,
    featureC=32,
)


def _scene(datadir):
    from tensorf_tpu.data.blender import BlenderDataset

    wh = (40, 40)
    if not os.path.exists(os.path.join(datadir, "transforms_train.json")):
        from tensorf_tpu.data.synthetic import make_synthetic_blender_scene

        make_synthetic_blender_scene(datadir, n_train=10, n_test=2, wh=wh)
    train = BlenderDataset(datadir, split="train", wh=wh)
    test = BlenderDataset(datadir, split="test", wh=wh, is_stack=False)
    return train, test


def run_reference(datadir, iters, seed=0):
    """Torch-CPU reference through the intended schedule."""
    import torch

    sys.path.insert(0, "/root/reference")
    from models.tensoRF import TensorVMSplit  # noqa: E402

    # reference utils.py pulls in torchvision (absent here); these two are
    # the same formulas as utils.py:117-125 on torch tensors
    def N_to_reso(n_voxels, bbox):
        xyz_min, xyz_max = bbox
        voxel_size = ((xyz_max - xyz_min).prod() / n_voxels) ** (1 / 3)
        return ((xyz_max - xyz_min) / voxel_size).long().tolist()

    def cal_n_samples(reso, step_ratio=0.5):
        return int(np.linalg.norm([int(r) for r in reso]) / step_ratio)

    torch.manual_seed(seed)
    train, test = _scene(datadir)
    aabb = torch.tensor(
        np.asarray(train.scene_bbox, np.float32).reshape(2, 3)
    )
    model = TensorVMSplit(
        ARGS_DICT, aabb, list(GRID_INIT), near_far=[2.0, 6.0], device="cpu"
    )
    n_samples = min(1e6, cal_n_samples(GRID_INIT, STEP_RATIO))

    def fresh_opt(scale=1.0):
        groups = model.get_optparam_groups(LR_INIT * scale, LR_BASIS * scale)
        return torch.optim.Adam(groups, betas=(0.9, 0.99))

    optimizer = fresh_opt()
    lr_factor = LR_DECAY_RATIO ** (1 / iters)

    allrays = torch.from_numpy(np.asarray(train.all_rays, np.float32))
    allrgbs = torch.from_numpy(np.asarray(train.all_rgbs, np.float32))
    test_rays = torch.from_numpy(np.asarray(test.all_rays, np.float32))
    test_rgbs = np.asarray(test.all_rgbs, np.float32)

    def eval_psnr():
        with torch.no_grad():
            preds = []
            for s in range(0, test_rays.shape[0], 4096):
                rgb, _, _ = model(
                    test_rays[s : s + 4096], None, white_bg=True,
                    is_train=False, ndc_ray=False, N_samples=int(n_samples),
                )
                preds.append(rgb.numpy())
            pred = np.clip(np.concatenate(preds), 0, 1)
        mse = float(np.mean((pred - test_rgbs) ** 2))
        return -10.0 * np.log10(mse)

    rng = np.random.default_rng(seed)
    l1_w = L1_W
    rows, events, t_train = [], [], 0.0
    for it in range(iters + 1):
        tic = time.perf_counter()
        if it > 0:
            ids = rng.integers(0, allrays.shape[0], BATCH)
            rays, rgbs = allrays[ids], allrgbs[ids]
            rgb_map, _, _ = model(
                rays, None, white_bg=True, is_train=True, ndc_ray=False,
                N_samples=int(n_samples),
            )
            loss = torch.mean((rgb_map - rgbs) ** 2)
            total = (
                loss
                + l1_w * model.density_L1()
                + ORTHO_W * model.vector_comp_diffs()
            )
            optimizer.zero_grad()
            total.backward()
            optimizer.step()
            for g in optimizer.param_groups:
                g["lr"] = g["lr"] * lr_factor

            if it in ALPHA_LIST:
                reso_cur = [int(g) for g in model.gridSize]
                new_aabb = model.updateAlphaMask(tuple(reso_cur), None)
                occ = float(
                    model.alphaMask.alpha_volume.sum()
                    / model.alphaMask.alpha_volume.numel()
                )
                ev = {"iter": it, "kind": "mask", "occupancy": occ}
                if it == ALPHA_LIST[0]:
                    model.shrink(new_aabb)
                    optimizer = fresh_opt()
                    ev["kind"] = "mask+shrink"
                    ev["grid"] = [int(g) for g in model.gridSize]
                    ev["aabb"] = model.aabb.numpy().tolist()
                elif it == ALPHA_LIST[1]:
                    n0 = allrays.shape[0]
                    allrays, allrgbs = model.filtering_rays(
                        allrays, allrgbs, N_samples=int(n_samples)
                    )
                    ev["kind"] = "mask+refilter"
                    ev["kept_frac"] = allrays.shape[0] / n0
                l1_w = L1_W_REST
                events.append(ev)
                print(f"[ref ] {ev}", flush=True)

            if it in UPSAMP_LIST:
                reso_new = N_to_reso(N_VOXEL_FINAL, model.aabb)
                n_samples = min(n_samples, cal_n_samples(reso_new, STEP_RATIO))
                model.upsample_volume_grid(reso_new)
                optimizer = fresh_opt(1.0)  # lr_upsample_reset
                ev = {
                    "iter": it, "kind": "upsample",
                    "grid": [int(g) for g in model.gridSize],
                    "n_samples": int(n_samples),
                }
                events.append(ev)
                print(f"[ref ] {ev}", flush=True)
        t_train += time.perf_counter() - tic

        if it % EVAL_EVERY == 0:
            psnr = eval_psnr()
            rows.append((it, psnr))
            print(f"[ref ] iter {it:4d}  test_psnr {psnr:6.2f}", flush=True)
    return rows, events, iters * BATCH / t_train


def run_ours(datadir, iters, force_cpu=False, seed=0):
    """tensorf_tpu through the same schedule with the same hypers."""
    import jax

    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
    from tensorf_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from tensorf_tpu.models import FIELD_MODELS, ModelConfig
    from tensorf_tpu.models.config import (
        GridGeometry,
        cal_n_samples,
        n_to_reso,
    )
    from tensorf_tpu.render.chunked import make_render_fn
    from tensorf_tpu.render.culling import (
        filter_rays_alpha,
        update_alpha_mask,
    )
    from tensorf_tpu.train.losses import LossWeights
    from tensorf_tpu.train.optim import make_optimizer
    from tensorf_tpu.train.step import TrainStatics, make_train_step

    train, test = _scene(datadir)
    cfg = ModelConfig(
        model_name="TensorVMSplit",
        density_n_comp=(4, 4, 4),
        app_n_comp=(8, 8, 8),
        app_dim=9,
        shading_mode="MLP_Fea",
        pos_pe=2,
        view_pe=2,
        fea_pe=2,
        feature_c=32,
        density_shift=-3.0,
        alpha_mask_thres=1e-4,  # == ARGS_DICT's alphaMask_thres
    )
    model = FIELD_MODELS[cfg.model_name]
    aabb_np = np.asarray(train.scene_bbox, np.float32).reshape(2, 3)
    geometry = GridGeometry.create(aabb_np, GRID_INIT, STEP_RATIO)
    params = model.init(jax.random.PRNGKey(seed), cfg, GRID_INIT)
    lr_factor = LR_DECAY_RATIO ** (1 / iters)
    n_samples = min(10 ** 6, cal_n_samples(GRID_INIT, STEP_RATIO))
    near_far = (2.0, 6.0)

    allrays = np.asarray(train.all_rays, np.float32)
    allrgbs = np.asarray(train.all_rgbs, np.float32)
    test_rays = np.asarray(test.all_rays, np.float32)
    test_rgbs = np.asarray(test.all_rgbs, np.float32)

    l1_w = L1_W
    alpha_mask = None

    def build(l1):
        statics = TrainStatics(
            n_samples=n_samples,
            step_size=geometry.step_size,
            white_bg=True,
            ndc_ray=False,
            total_steps=iters,
            lr_factor=lr_factor,
            weights=LossWeights(l1=l1, ortho=ORTHO_W),
        )
        step = make_train_step(model, cfg, statics, optimizer)
        render = make_render_fn(
            model, cfg, step_size=geometry.step_size,
            n_samples=n_samples, white_bg=True, ndc_ray=False,
        )
        return step, render

    optimizer, opt_state = make_optimizer(params, LR_INIT, LR_BASIS, lr_factor)
    step_fn, render_fn = build(l1_w)

    def eval_psnr():
        preds = []
        for s in range(0, test_rays.shape[0], 4096):
            chunk = test_rays[s : s + 4096]
            pad = 4096 - chunk.shape[0]
            padded = np.pad(chunk, ((0, pad), (0, 0))) if pad else chunk
            rgb = render_fn(
                params, alpha_mask, jnp.asarray(padded), aabb
            )[0]
            preds.append(np.asarray(rgb)[: chunk.shape[0]])
        pred = np.clip(np.concatenate(preds), 0, 1)
        mse = float(np.mean((pred - test_rgbs) ** 2))
        return -10.0 * np.log10(mse)

    aabb = jnp.asarray(aabb_np)
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed + 1)
    rows, events, t_train = [], [], 0.0
    for it in range(iters + 1):
        tic = time.perf_counter()
        if it > 0:
            ids = rng.integers(0, allrays.shape[0], BATCH)
            key, sub = jax.random.split(key)
            params, opt_state, metrics = step_fn(
                params, opt_state, alpha_mask, aabb,
                jnp.asarray(allrays[ids]), jnp.asarray(allrgbs[ids]),
                jnp.asarray(it - 1, jnp.int32), sub,
            )
            float(jax.device_get(metrics["mse"]))

            if it in ALPHA_LIST:
                alpha_mask, new_aabb, occ = update_alpha_mask(
                    model, cfg, params, alpha_mask, geometry.aabb_np,
                    geometry.grid_size, geometry.step_size, None,
                )
                ev = {"iter": it, "kind": "mask", "occupancy": occ}
                if it == ALPHA_LIST[0]:
                    # shrink (loop.py event semantics == tensoRF.py:291)
                    old = geometry
                    units = old.units
                    t_l = np.round(
                        np.round((new_aabb[0] - old.aabb_np[0]) / units)
                    ).astype(np.int64)
                    b_r = np.round(
                        (new_aabb[1] - old.aabb_np[0]) / units
                    ).astype(np.int64) + 1
                    b_r = np.minimum(b_r, np.asarray(old.grid_size))
                    params = model.shrink(
                        cfg, jax.device_get(params),
                        tuple(t_l.tolist()), tuple(b_r.tolist()),
                    )
                    gs_arr = np.asarray(old.grid_size, np.float64)
                    t_l_r = t_l / (gs_arr - 1)
                    b_r_r = (b_r - 1) / (gs_arr - 1)
                    corrected = np.stack(
                        [
                            (1 - t_l_r) * old.aabb_np[0]
                            + t_l_r * old.aabb_np[1],
                            (1 - b_r_r) * old.aabb_np[0]
                            + b_r_r * old.aabb_np[1],
                        ]
                    )
                    geometry = GridGeometry.create(
                        corrected, tuple((b_r - t_l).tolist()), STEP_RATIO
                    )
                    aabb = jnp.asarray(geometry.aabb_np)
                    optimizer, opt_state = make_optimizer(
                        params, LR_INIT, LR_BASIS, lr_factor
                    )
                    ev["kind"] = "mask+shrink"
                    ev["grid"] = list(geometry.grid_size)
                    ev["aabb"] = geometry.aabb_np.tolist()
                elif it == ALPHA_LIST[1]:
                    n0 = allrays.shape[0]
                    allrays, allrgbs = filter_rays_alpha(
                        allrays, allrgbs, alpha_mask, geometry.aabb_np,
                        geometry.step_size, near_far,
                    )
                    ev["kind"] = "mask+refilter"
                    ev["kept_frac"] = allrays.shape[0] / n0
                l1_w = L1_W_REST
                step_fn, render_fn = build(l1_w)
                events.append(ev)
                print(f"[ours] {ev}", flush=True)

            if it in UPSAMP_LIST:
                new_grid = n_to_reso(N_VOXEL_FINAL, geometry.aabb_np)
                n_samples = min(
                    n_samples, cal_n_samples(new_grid, STEP_RATIO)
                )
                params = model.upsample(
                    cfg, jax.device_get(params), new_grid
                )
                geometry = GridGeometry.create(
                    geometry.aabb_np, new_grid, STEP_RATIO
                )
                aabb = jnp.asarray(geometry.aabb_np)
                optimizer, opt_state = make_optimizer(
                    params, LR_INIT, LR_BASIS, lr_factor
                )
                step_fn, render_fn = build(l1_w)
                ev = {
                    "iter": it, "kind": "upsample",
                    "grid": list(geometry.grid_size),
                    "n_samples": int(n_samples),
                }
                events.append(ev)
                print(f"[ours] {ev}", flush=True)
        t_train += time.perf_counter() - tic

        if it % EVAL_EVERY == 0:
            psnr = eval_psnr()
            rows.append((it, psnr))
            print(f"[ours] iter {it:4d}  test_psnr {psnr:6.2f}", flush=True)
    return rows, events, iters * BATCH / t_train


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--datadir", default="./data/synth_parity")
    ap.add_argument("--iters", type=int, default=900)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--skip-ref", action="store_true")
    ap.add_argument("--skip-ours", action="store_true")
    ap.add_argument("--ours-cpu", action="store_true")
    ap.add_argument("--out", default="PARITY_SCHEDULE.json")
    args = ap.parse_args()

    result = {"iters": args.iters, "seed": args.seed}
    if not args.skip_ref:
        rows, events, rps = run_reference(args.datadir, args.iters, args.seed)
        result["ref"] = {"rows": rows, "events": events, "rays_per_sec": rps}
    if not args.skip_ours:
        rows, events, rps = run_ours(
            args.datadir, args.iters, args.ours_cpu, args.seed
        )
        result["ours"] = {"rows": rows, "events": events, "rays_per_sec": rps}
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
