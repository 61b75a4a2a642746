#!/usr/bin/env python
"""Re-measure the 1KB-row scatter-add rate (round-3 follow-up).

BENCH_SELF_r03 recorded scatter_rows_per_sec_1024B = 0.242G — 4x the r2
measurement (0.057G) and equal to the gather rate, which is suspicious
(CLAUDE.md flags it as unexplained).  This script measures the same op
across row widths, table heights, index orders and duplication factors,
numerically verifies one small case against numpy, and greps the
compiled HLO for the lowering strategy, so the phase-A roofline floor can
rest on an explained number.

Usage: python scripts/recheck_scatter.py
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import json
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    from tensorf_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    def t_of(f, *a, iters=6):
        o = f(*a)
        float(jax.device_get(jnp.sum(o)))
        tic = time.perf_counter()
        for _ in range(iters):
            o = f(*a)
        float(jax.device_get(jnp.sum(o)))
        t1 = time.perf_counter() - tic
        tic = time.perf_counter()
        for _ in range(2 * iters):
            o = f(*a)
        float(jax.device_get(jnp.sum(o)))
        return ((time.perf_counter() - tic) - t1) / iters

    # numerical sanity: the jitted scatter-add matches numpy on a small case
    def scatter(gg, i, R, C):
        return jnp.zeros((R, C), jnp.float32).at[i].add(gg)

    i_s = jnp.asarray(rng.integers(0, 64, size=512).astype(np.int32))
    g_s = jnp.asarray(rng.normal(size=(512, 8)).astype(np.float32))
    want = np.zeros((64, 8), np.float32)
    np.add.at(want, np.asarray(i_s), np.asarray(g_s))
    got = np.asarray(jax.jit(scatter, static_argnums=(2, 3))(g_s, i_s, 64, 8))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    print("numeric check: ok", flush=True)

    out = {}
    M = 1_048_576
    for C in (16, 64, 192, 256):
        for R in (90_000, 1_048_576):
            for order in ("random", "sorted"):
                idx_np = rng.integers(0, R, size=M).astype(np.int32)
                if order == "sorted":
                    idx_np = np.sort(idx_np)
                idx = jnp.asarray(idx_np)
                g = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32))
                f = jax.jit(
                    lambda gg, i, _R=R, _C=C: jnp.zeros((_R, _C), jnp.float32)
                    .at[i]
                    .add(gg)
                )
                t = t_of(f, g, idx)
                key = f"C{C}_R{R}_{order}"
                out[key] = {
                    "rows_per_sec": round(M / t, 0),
                    "gb_per_sec": round(M * C * 4 / t / 1e9, 1),
                    "ms": round(t * 1e3, 2),
                }
                print(
                    f"{key:24s} {M/t/1e6:8.1f}M rows/s "
                    f"{M*C*4/t/1e9:7.1f} GB/s  {t*1e3:7.2f} ms",
                    flush=True,
                )

    # what did XLA lower the suspicious case to?
    f256 = jax.jit(
        lambda gg, i: jnp.zeros((90_000, 256), jnp.float32).at[i].add(gg)
    )
    g = jnp.asarray(rng.normal(size=(M, 256)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 90_000, size=M).astype(np.int32))
    try:
        txt = f256.lower(g, idx).compile().as_text()
        markers = {
            m: txt.count(m)
            for m in ("sort", "scatter", "reduce-scatter", "dynamic-update")
        }
        out["hlo_markers_C256_R90000"] = markers
        print("HLO markers:", markers, flush=True)
    except Exception as e:
        print(f"HLO dump failed: {e}", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
