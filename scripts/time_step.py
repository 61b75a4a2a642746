#!/usr/bin/env python
"""Time one full train step config on the current backend.

Usage: python scripts/time_step.py [--topk K] [--budget K] [--dtype bf16]
       [--batch B] [--nsamples N] [--grid G] [--mask]
"""

import os

# persistent XLA compile cache — first compile of each program through
# the tunneled TPU takes minutes; cached recompiles take seconds
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--topk", type=int, default=0)
    ap.add_argument("--budget", type=int, default=0)
    ap.add_argument("--dtype", type=str, default="float32")
    ap.add_argument("--grid_dtype", type=str, default="float32")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--nsamples", type=int, default=440)
    ap.add_argument("--grid", type=int, default=128)
    ap.add_argument("--mask", action="store_true")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax

    from tensorf_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from tensorf_tpu.models import FIELD_MODELS, ModelConfig
    from tensorf_tpu.models.alpha_mask import AlphaGridMask
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
        dtype=args.dtype,
        grid_dtype=args.grid_dtype,
    )
    model = FIELD_MODELS[cfg.model_name]
    g = args.grid
    params = model.init(jax.random.PRNGKey(0), cfg, (g, g, g))
    opt, opt_state = make_optimizer(params, 0.02, 1e-3, 0.9999)
    st = TrainStatics(
        n_samples=args.nsamples,
        step_size=float(3.0 / (g - 1) * 0.5),
        white_bg=True,
        ndc_ray=False,
        total_steps=30000,
        lr_factor=0.9999,
        weights=LossWeights(ortho=0.01, l1=8e-5, tv_density=0.01, tv_app=0.01),
        free_reg=True,
        free_decomp=True,
        freq_reg_ratio=0.8,
        shade_top_k=args.topk or None,
        sample_budget=args.budget or None,
    )
    fn = make_train_step(model, cfg, st, opt)

    rng = np.random.default_rng(0)
    o = rng.normal(size=(args.batch, 3))
    o = 4.0 * o / np.linalg.norm(o, axis=-1, keepdims=True)
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate([o, d], -1).astype(np.float32))
    rgbs = jnp.asarray(rng.uniform(size=(args.batch, 3)).astype(np.float32))
    aabb = jnp.asarray([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]])

    mask = None
    if args.mask:
        vol = (rng.uniform(size=(g, g, g)) < 0.15).astype(np.float32)
        mask = AlphaGridMask(aabb=aabb, volume=jnp.asarray(vol))

    def call(i, p, s):
        return fn(p, s, mask, aabb, rays, rgbs, jnp.asarray(i, jnp.int32),
                  jax.random.PRNGKey(i))

    p, s, m = call(0, params, opt_state)
    float(jax.device_get(m["mse"]))
    t0 = time.perf_counter()
    for i in range(args.iters):
        p, s, m = call(i, p, s)
    float(jax.device_get(m["mse"]))
    t1 = time.perf_counter()
    for i in range(2 * args.iters):
        p, s, m = call(i, p, s)
    float(jax.device_get(m["mse"]))
    t2 = time.perf_counter()
    ms = ((t2 - t1) - (t1 - t0)) / args.iters * 1000
    print(
        f"step {ms:.1f} ms  ({args.batch / ms * 1000:,.0f} rays/s)  "
        f"topk={args.topk} budget={args.budget} dtype={args.dtype} "
        f"mask={args.mask}"
    )


if __name__ == "__main__":
    main()
