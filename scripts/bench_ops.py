#!/usr/bin/env python
"""Micro-benchmarks of the train step's constituent ops on the real TPU.

Times each op in isolation at the true step shapes (phase A: 4096x443
samples on 128^2 planes; phase B budget shapes via --m/--rows) so
optimization work is attributable.  Timing uses the N-vs-2N delta with a
scalar device_get barrier (axon tunnel: block_until_ready returns early).

Usage: python scripts/bench_ops.py [--op SUBSTR] [--m M] [--rows R]
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


def timed(fn, args, iters=8, warmup=2):
    import jax

    from tensorf_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    out = None
    for _ in range(warmup):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    float(jax.device_get(jnp.sum(leaf) if hasattr(leaf, "dtype") else leaf))

    def run(n):
        tic = time.perf_counter()
        o = None
        for _ in range(n):
            o = fn(*args)
        leaf = jax.tree.leaves(o)[0]
        float(
            jax.device_get(jnp.sum(leaf) if hasattr(leaf, "dtype") else leaf)
        )
        return time.perf_counter() - tic

    t1 = run(iters)
    t2 = run(2 * iters)
    return (t2 - t1) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--op", type=str, default="")
    ap.add_argument("--m", type=int, default=1814528)  # 4096*443
    ap.add_argument("--rows", type=int, default=16384)  # 128^2
    cli = ap.parse_args()

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    M, R = cli.m, cli.rows
    idx = jnp.asarray(rng.integers(0, R, size=M).astype(np.int32))
    cases = []  # (name, jitted_fn, args)

    # --- gather rate vs row width -------------------------------------------
    gather = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum(0))
    for width in (16, 64, 128, 256):
        tbl = jnp.asarray(rng.normal(size=(R, width)).astype(np.float32))
        cases.append((f"gather_w{width}_fp32", gather, (tbl, idx)))
    gather16 = jax.jit(
        lambda t, i: jnp.take(t, i, axis=0).astype(jnp.float32).sum(0)
    )
    tbl16 = jnp.asarray(
        rng.normal(size=(R, 256)).astype(np.float32)
    ).astype(jnp.bfloat16)
    cases.append(("gather_w256_bf16", gather16, (tbl16, idx)))

    # --- scatter-add rate -----------------------------------------------------
    for width in (64, 256):
        gr = jnp.asarray(rng.normal(size=(M, width)).astype(np.float32))
        sc = jax.jit(
            lambda g, i, width=width: jnp.zeros((R, width), jnp.float32)
            .at[i]
            .add(g)
        )
        cases.append((f"scatter_w{width}_fp32", sc, (gr, idx)))

    gr256 = jnp.asarray(rng.normal(size=(M, 256)).astype(np.float32))
    idx_sorted = jnp.sort(idx)
    sc_sorted = jax.jit(
        lambda g, i: jnp.zeros((R, 256), jnp.float32)
        .at[i]
        .add(g, indices_are_sorted=True)
    )
    cases.append(("scatter_w256_sortedflag", sc_sorted, (gr256, idx_sorted)))

    # --- sort cost ------------------------------------------------------------
    arange = jnp.arange(M, dtype=jnp.int32)
    sortkv = jax.jit(lambda i, a: jax.lax.sort_key_val(i, a))
    cases.append(("sort_keyval_M", sortkv, (idx, arange)))

    # --- sorted segment-sum (permute + cumsum + boundary gather) ---------------
    perm = jnp.asarray(rng.permutation(M).astype(np.int32))

    def _seg(g, p, si):
        gs = jnp.take(g, p, axis=0)
        cs = jnp.cumsum(gs, axis=0)
        last = (
            jnp.zeros((R,), jnp.int32)
            .at[si]
            .max(jnp.arange(M, dtype=jnp.int32))
        )
        return jnp.take(cs, last, axis=0)

    cases.append(("segsum_w256", jax.jit(_seg), (gr256, perm, idx_sorted)))

    # --- top_k budget compaction ------------------------------------------------
    topk = jax.jit(lambda s: jax.lax.top_k(s, 128)[1])
    score = jnp.asarray(rng.normal(size=(4096, 443)).astype(np.float32))
    cases.append(("topk_443_128", topk, (score,)))
    score2 = jnp.asarray(rng.normal(size=(4096, 1039)).astype(np.float32))
    cases.append(("topk_1039_128", topk2 := topk, (score2,)))

    # --- MLP shading fwd+bwd -----------------------------------------------------
    from tensorf_tpu.models import ModelConfig
    from tensorf_tpu.models.shading import apply_shading, init_shading
    from tensorf_tpu.ops.freq_mask import FreeMasks

    cfg = ModelConfig(
        model_name="TensorVMSplit", app_dim=27, shading_mode="MLP_Fea",
        pos_pe=2, view_pe=2, fea_pe=2, feature_c=128,
    )
    rparams = init_shading(jax.random.PRNGKey(0), cfg)
    xyz = jnp.asarray(rng.uniform(-1, 1, size=(M, 3)).astype(np.float32))
    view = jnp.asarray(rng.normal(size=(M, 3)).astype(np.float32))
    feat = jnp.asarray(rng.normal(size=(M, 27)).astype(np.float32))
    masks = FreeMasks(None, None, None)

    mlp_g = jax.jit(
        jax.grad(
            lambda p, x, v, f: jnp.sum(apply_shading(cfg, p, x, v, f, masks))
        )
    )
    cases.append(("mlp_fwdbwd_M", mlp_g, (rparams, xyz, view, feat)))

    # --- raw2alpha fwd+bwd ---------------------------------------------------------
    from tensorf_tpu.ops.render_math import raw2alpha

    sig = jnp.asarray(rng.uniform(size=(4096, 443)).astype(np.float32))
    dst = jnp.full((4096, 443), 0.01, jnp.float32)
    r2a = jax.jit(
        jax.grad(lambda s, d: jnp.sum(raw2alpha(s, d)[1]))
    )
    cases.append(("raw2alpha_fwdbwd", r2a, (sig, dst)))

    # --- footprint plane sampling fwd / fwd+bwd --------------------------------------
    from tensorf_tpu.ops.grid_sample import (
        footprint_sample_2d,
        line_sample_matmul,
        make_footprint_2d,
    )

    H = W = int(np.sqrt(R))
    plane = jnp.asarray(rng.normal(size=(H, W, 64)).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-1, 1, size=(M, 2)).astype(np.float32))

    fp_f = jax.jit(
        lambda p, c: jnp.sum(
            footprint_sample_2d(make_footprint_2d(p), H, W, c)
        )
    )
    cases.append(("footprint_fwd", fp_f, (plane, coords)))
    fp_g = jax.jit(
        jax.grad(
            lambda p, c: jnp.sum(
                footprint_sample_2d(make_footprint_2d(p), H, W, c)
            )
        )
    )
    cases.append(("footprint_fwdbwd", fp_g, (plane, coords)))

    line = jnp.asarray(rng.normal(size=(128, 64)).astype(np.float32))
    lc = jnp.asarray(rng.uniform(-1, 1, size=(M,)).astype(np.float32))
    lm_g = jax.jit(
        jax.grad(lambda l, c: jnp.sum(line_sample_matmul(l, c)))
    )
    cases.append(("line_matmul_fwdbwd", lm_g, (line, lc)))

    for name, fn, fargs in cases:
        if cli.op and cli.op not in name:
            continue
        try:
            t = timed(fn, fargs)
            extra = ""
            if "gather" in name or "scatter" in name or "segsum" in name:
                extra = f"  ({M / t / 1e9:.3f}G rows/s)"
            print(f"{name:28s} {t * 1e3:8.2f} ms{extra}", flush=True)
        except Exception as e:
            print(f"{name:28s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
