#!/usr/bin/env python
"""Benchmark: training throughput (rays/sec/chip) of the flagship model.

Runs the full jitted train step (render + AD + Adam + regularizers) on the
lego-equivalent configuration — TensorVMSplit 16/48 comps, 128-grid
(post-first-upsample scale), MLP_Fea shading, batch 4096, ~440 samples/ray
(the reference lego setup: configs/lego.txt + configs/config.yaml).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference PyTorch implementation trains the same
configuration at roughly 1.2e5 rays/sec on a desktop GPU (upstream TensoRF
reports ~17 min for 30k iters x 4096 rays on a 2080Ti-class card — the
repo itself publishes no numbers, SURVEY.md §6; BASELINE.json's north star
asks for >5x per chip).  vs_baseline = measured / 1.2e5.
"""

import json
import time

import numpy as np

BASELINE_RAYS_PER_SEC = 1.2e5


def main():
    import jax
    import jax.numpy as jnp

    from tensorf_tpu.models import FIELD_MODELS, ModelConfig
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
    lr_factor = 0.1 ** (1 / 30000)
    optimizer, opt_state = make_optimizer(params, 0.02, 1e-3, lr_factor)
    statics = TrainStatics(
        n_samples=n_samples,
        step_size=float(3.0 / 127 * 0.5),
        white_bg=True,
        ndc_ray=False,
        total_steps=30000,
        lr_factor=lr_factor,
        weights=LossWeights(
            ortho=0.01, l1=8e-5, tv_density=0.01, tv_app=0.01
        ),
        free_reg=True,
        free_decomp=True,
        freq_reg_ratio=0.8,
        shade_top_k=None,
    )
    step_fn = make_train_step(model, cfg, statics, optimizer)

    rng = np.random.default_rng(0)
    o = rng.normal(size=(batch, 3))
    o = 4.0 * o / np.linalg.norm(o, axis=-1, keepdims=True)
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate([o, d], -1).astype(np.float32))
    rgbs = jnp.asarray(rng.uniform(size=(batch, 3)).astype(np.float32))
    aabb = jnp.asarray([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]])

    key = jax.random.PRNGKey(0)

    def run(i, params, opt_state):
        k = jax.random.fold_in(key, i)
        return step_fn(
            params, opt_state, None, aabb, rays, rgbs,
            jnp.asarray(i, jnp.int32), k,
        )

    # warmup / compile
    params, opt_state, metrics = run(0, params, opt_state)
    jax.block_until_ready(metrics["mse"])

    iters = 50
    tic = time.perf_counter()
    for i in range(1, iters + 1):
        params, opt_state, metrics = run(i, params, opt_state)
    jax.block_until_ready(metrics["mse"])
    toc = time.perf_counter()

    rays_per_sec = batch * iters / (toc - tic)
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
