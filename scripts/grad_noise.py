#!/usr/bin/env python
"""Minibatch-gradient variance: uniform vs stratified batch composition.

The round-4 CPU quality A/B (AB_QUALITY_CPU_r04.json) shows the
stratified arm matching or beating the unstratified arm on TRAIN psnr
while losing ~0.8-1.0 dB on TEST psnr at matched seeds — a
generalization gap, not a fitting gap.  Leading hypothesis: the
quota-fixed per-step stratum composition REDUCES minibatch gradient
noise (it removes the multinomial between-strata component), and in the
few-shot regime SGD noise acts as an implicit regularizer — the
reference's uniform sampler (train.py:44-56) keeps that noise.

This measures the premise directly at a trained checkpoint: draw K
minibatches per estimator —

  uniform:     SimpleSampler ids -> plain from-store step, full lattice
  stratified:  StratifiedSampler ids (proportional quotas) -> stratified
               step at exact per-stratum candidate budgets

— take one SGD(lr=1) step each (param_delta == -grad exactly), and
report E||g - gbar||^2 per estimator plus the stratified/uniform ratio.
Both estimators are unbiased for the same store-mean objective, so the
ratio isolates composition-driven variance.

Usage:
  python scripts/grad_noise.py log_ab/<date>/ab_strat_<seed>/final_*.npz \
      [--draws 24] [--batch 2048] [--datadir ./data/synth_sphere]
"""

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_ab")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--draws", type=int, default=24)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--datadir", default="./data/synth_sphere")
    ap.add_argument("--downsample", type=float, default=4.0)
    ap.add_argument("--out", default="GRAD_NOISE_r04.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from tensorf_tpu.data import dataset_dict
    from tensorf_tpu.models import FIELD_MODELS
    from tensorf_tpu.models.config import GridGeometry
    from tensorf_tpu.render.culling import (
        count_ray_candidates,
        filter_rays_alpha,
        filter_rays_bbox,
        stratify_rays,
    )
    from tensorf_tpu.train.losses import LossWeights
    from tensorf_tpu.train.sampler import (
        SimpleSampler,
        StratifiedSampler,
        allocate_quotas,
    )
    from tensorf_tpu.train.step import TrainStatics, make_train_step
    from tensorf_tpu.utils.ckpt import load_checkpoint

    cfg, params, aabb, grid_size, alpha_mask, extra = load_checkpoint(
        args.ckpt
    )
    assert alpha_mask is not None, "need a post-mask-era checkpoint"
    model = FIELD_MODELS[cfg.model_name]
    geometry = GridGeometry.create(aabb, grid_size, cfg.step_ratio)
    ns = int((extra or {}).get("n_samples", geometry.n_samples))
    near_far = tuple(cfg.near_far)

    ds = dataset_dict["blender"](
        args.datadir, split="train", downsample=args.downsample,
        is_stack=False,
    )
    allrays = np.asarray(ds.all_rays, np.float32)
    allrgbs = np.asarray(ds.all_rgbs, np.float32)
    allrays, allrgbs = filter_rays_bbox(allrays, allrgbs, ds.scene_bbox)
    allrays, allrgbs = filter_rays_alpha(
        allrays, allrgbs, alpha_mask, geometry.aabb_np, geometry.step_size,
        near_far,
    )
    n_store = allrays.shape[0]

    counts = count_ray_candidates(
        allrays, alpha_mask, geometry.aabb_np, geometry.step_size, near_far,
        n_samples=ns,
    )
    strata, budgets = stratify_rays(counts)
    quotas = allocate_quotas([s.size for s in strata], args.batch, 8)
    strata_budgets = tuple(b if b < ns else None for b in budgets)
    print(f"store {n_store}, strata sizes {[s.size for s in strata]}, "
          f"quotas {quotas}, budgets {strata_budgets}")

    common = dict(
        n_samples=ns,
        step_size=geometry.step_size,
        white_bg=True,
        ndc_ray=False,
        total_steps=3000,
        lr_factor=1.0,
        weights=LossWeights(),  # pure-MSE gradient (regs are ray-free)
        from_store=True,
        shade_top_k=None,
        use_coarse_gate=True,
    )
    sgd = optax.sgd(1.0)
    opt_state = sgd.init(params)
    shares = tuple(s.size / float(n_store) for s in strata)
    plain_fn = make_train_step(model, cfg, TrainStatics(**common), sgd)
    strat_fn = make_train_step(
        model, cfg,
        TrainStatics(
            strata_budgets=strata_budgets, strata_loss_weights=shares,
            **common,
        ),
        sgd,
    )
    match_fn = make_train_step(
        model, cfg,
        TrainStatics(
            strata_budgets=strata_budgets, strata_loss_weights=shares,
            strata_noise_match=True, **common,
        ),
        sgd,
    )

    rays_j = jnp.asarray(allrays)
    rgbs_j = jnp.asarray(allrgbs)
    base = jax.random.PRNGKey(0)
    flat0, tree = jax.flatten_util.ravel_pytree(params)

    def grad_of(fn, ids, k):
        # the jitted step donates params/opt_state buffers — feed copies
        p1, _, _ = fn(
            jax.tree.map(jnp.copy, params),
            jax.tree.map(jnp.copy, opt_state),
            alpha_mask, jnp.asarray(geometry.aabb_np),
            rays_j, rgbs_j, ids, jnp.asarray(2999, jnp.int32),
            jax.random.fold_in(base, k),
        )
        g = np.asarray(flat0 - jax.flatten_util.ravel_pytree(p1)[0])
        del p1
        return g

    uni = SimpleSampler(n_store, args.batch, seed=11)
    st = StratifiedSampler(strata, quotas, seed=13)
    st2 = StratifiedSampler(strata, quotas, seed=17)

    G = {"uniform": [], "stratified": [], "noise_matched": []}
    for k in range(args.draws):
        ids_u = jnp.asarray(uni.nextids().astype(np.int32))
        G["uniform"].append(grad_of(plain_fn, ids_u, k))
        ids_s = tuple(
            jnp.asarray(i.astype(np.int32)) for i in st.nextids()
        )
        G["stratified"].append(grad_of(strat_fn, ids_s, 10_000 + k))
        ids_m = tuple(
            jnp.asarray(i.astype(np.int32)) for i in st2.nextids()
        )
        G["noise_matched"].append(grad_of(match_fn, ids_m, 20_000 + k))
        print(f"draw {k + 1}/{args.draws}", flush=True)

    out = {"draws": args.draws, "batch": args.batch, "store": int(n_store),
           "strata_sizes": [int(s.size) for s in strata],
           "quotas": [int(q) for q in quotas], "ckpt": args.ckpt}
    for arm, gs in G.items():
        M = np.stack(gs)
        gbar = M.mean(0)
        var = float(np.mean(np.sum((M - gbar) ** 2, axis=1)))
        out[arm] = {
            "mean_norm2": float(np.sum(gbar**2)),
            "noise_E_norm2": var,
        }
    out["var_ratio_strat_over_uniform"] = (
        out["stratified"]["noise_E_norm2"] / out["uniform"]["noise_E_norm2"]
    )
    out["var_ratio_matched_over_uniform"] = (
        out["noise_matched"]["noise_E_norm2"]
        / out["uniform"]["noise_E_norm2"]
    )
    line = json.dumps(out)
    print(line)
    with open(os.path.join(ROOT, args.out), "w") as f:
        f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
