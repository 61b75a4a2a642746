#!/usr/bin/env python
"""Benchmark: training throughput (rays/sec/chip) of the flagship model.

Measures the full jitted train step (render + AD + Adam + all regularizers
+ FreeNeRF masks) on the lego-equivalent configuration — TensorVMSplit
16/48 components, 128-grid, MLP_Fea shading, batch 4096, ~440 samples/ray
(reference configs/lego.txt + configs/config.yaml) — in both schedule
phases and reports the 30k-iteration-weighted average:

  * phase A (iters 0-2000, 6.7%): no alpha mask, full sample lattice;
  * phase B (iters 2000-30000, 93.3%): alpha-mask culling active — modeled
    with a 15%-occupancy mask and a 128-sample per-ray budget (the TPU
    analog of the reference's boolean-compaction culling; exact when the
    budget covers the alive samples).

vs_baseline: the reference PyTorch implementation trains this
configuration at roughly 1.2e5 rays/sec on a desktop GPU (upstream TensoRF
reports ~17 min for 30k x 4096-ray iters on a 2080Ti-class card; the repo
itself publishes no numbers — SURVEY.md §6).  vs_baseline = measured /
1.2e5; BASELINE.json's north star asks for >5x per chip.

Timing note: on the tunneled axon backend block_until_ready returns before
execution completes; a scalar device_get is the only reliable barrier, and
the N-vs-2N delta removes fixed dispatch overhead.
"""

import json
import time

import numpy as np

BASELINE_RAYS_PER_SEC = 1.2e5
TOTAL_ITERS = 30000
MASK_FREE_ITERS = 2000


def _phase_step_time(mask_on: bool, sample_budget, iters: int = 20):
    import jax
    import jax.numpy as jnp

    from tensorf_tpu.models import FIELD_MODELS, ModelConfig
    from tensorf_tpu.models.alpha_mask import AlphaGridMask, with_dilation
    from tensorf_tpu.train.losses import LossWeights
    from tensorf_tpu.train.optim import make_optimizer
    from tensorf_tpu.train.step import TrainStatics, make_train_step

    cfg = ModelConfig(
        model_name="TensorVMSplit",
        density_n_comp=(16, 16, 16),
        app_n_comp=(48, 48, 48),
        app_dim=27,
        shading_mode="MLP_Fea",
        pos_pe=2,
        view_pe=2,
        fea_pe=2,
        feature_c=128,
    )
    model = FIELD_MODELS[cfg.model_name]
    grid = (128, 128, 128)
    batch = 4096
    n_samples = 440  # cal_n_samples(128^3 grid, step_ratio=0.5)

    params = model.init(jax.random.PRNGKey(0), cfg, grid)
    lr_factor = 0.1 ** (1 / TOTAL_ITERS)
    optimizer, opt_state = make_optimizer(params, 0.02, 1e-3, lr_factor)
    statics = TrainStatics(
        n_samples=n_samples,
        step_size=float(3.0 / 127 * 0.5),
        white_bg=True,
        ndc_ray=False,
        total_steps=TOTAL_ITERS,
        lr_factor=lr_factor,
        weights=LossWeights(
            ortho=0.01, l1=8e-5, tv_density=0.01, tv_app=0.01
        ),
        free_reg=True,
        free_decomp=True,
        freq_reg_ratio=0.8,
        sample_budget=sample_budget,
    )
    step_fn = make_train_step(model, cfg, statics, optimizer)

    rng = np.random.default_rng(0)
    o = rng.normal(size=(batch, 3))
    o = 4.0 * o / np.linalg.norm(o, axis=-1, keepdims=True)
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate([o, d], -1).astype(np.float32))
    rgbs = jnp.asarray(rng.uniform(size=(batch, 3)).astype(np.float32))
    aabb = jnp.asarray([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]])

    mask = None
    if mask_on:
        vol = (rng.uniform(size=grid) < 0.15).astype(np.float32)
        mask = with_dilation(
            AlphaGridMask(aabb=aabb, volume=jnp.asarray(vol))
        )

    key = jax.random.PRNGKey(0)

    def run(i, params, opt_state):
        k = jax.random.fold_in(key, i)
        return step_fn(
            params, opt_state, mask, aabb, rays, rgbs,
            jnp.asarray(i, jnp.int32), k,
        )

    params, opt_state, metrics = run(0, params, opt_state)
    float(jax.device_get(metrics["mse"]))

    def timed(n, params, opt_state):
        tic = time.perf_counter()
        for i in range(1, n + 1):
            params, opt_state, metrics = run(i, params, opt_state)
        float(jax.device_get(metrics["mse"]))
        return time.perf_counter() - tic, params, opt_state

    t1, params, opt_state = timed(iters, params, opt_state)
    t2, params, opt_state = timed(2 * iters, params, opt_state)
    return (t2 - t1) / iters, batch


def main():
    t_free, batch = _phase_step_time(mask_on=False, sample_budget=None)
    t_mask, _ = _phase_step_time(mask_on=True, sample_budget=128)

    total_time = MASK_FREE_ITERS * t_free + (
        TOTAL_ITERS - MASK_FREE_ITERS
    ) * t_mask
    rays_per_sec = TOTAL_ITERS * batch / total_time
    print(
        json.dumps(
            {
                "metric": "train_rays_per_sec_per_chip",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
