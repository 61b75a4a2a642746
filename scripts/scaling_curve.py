#!/usr/bin/env python
"""Multi-device DP scaling evidence on the virtual CPU mesh (VERDICT r3 #8).

One physical CPU core executes all virtual devices serially, so wall-clock
cannot show real scaling here.  What CAN be measured exactly is the
compiled SPMD program itself, per device count, at a FIXED global batch:

  * per-device FLOPs and bytes accessed (XLA cost analysis of the
    partitioned module) — ray-batch DP must show ~1/N compute;
  * the collective traffic the partitioner inserted — for pure DP this
    must be exactly one gradient/psum all-reduce set whose payload is the
    (replicated) parameter size, independent of N;
  * from those two, the v5e projection.  The step is memory-bound on the
    chip, so: t(N) = t_measured(1) · bytes(N)/bytes(1) + 2·G/BW_ici
    (bidirectional ring all-reduce, G = grad bytes, v5e ICI ~45 GB/s/dir
    per the public v5e spec sheet).  bytes(N) decomposes as
    sharded/N + replicated — the replicated part (Adam + L1/TV on the
    full params) is the measured Amdahl term.

Writes SCALING_r04.json and prints a table.

Usage (the conftest pattern — force CPU + 8 virtual devices):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/scaling_curve.py
"""

import json
import os
import re
import sys
import time

import numpy as np

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, ROOT)

N_DEVICES = (1, 2, 4, 8)
GLOBAL_BATCH = 4096
GRID = (64, 64, 64)
N_SAMPLES = 64
ICI_GBPS = 45.0  # v5e per-direction ICI bandwidth, public spec
V5E_BF16_TFLOPS = 197.0
MEASURED_STEP_MS = 117.0  # BENCH_SELF_r03 mask-era step, this op mix


def build(n_devices):
    import jax
    import jax.numpy as jnp

    from tensorf_tpu.models import FIELD_MODELS, ModelConfig
    from tensorf_tpu.parallel.mesh import make_mesh, replicate, shard_rays
    from tensorf_tpu.train.losses import LossWeights
    from tensorf_tpu.train.optim import make_optimizer
    from tensorf_tpu.train.step import TrainStatics, make_train_step

    cfg = ModelConfig(
        model_name="TensorVMSplit",
        density_n_comp=(8, 8, 8),
        app_n_comp=(24, 24, 24),
        app_dim=27,
        shading_mode="MLP_Fea",
        pos_pe=2,
        view_pe=2,
        fea_pe=2,
        feature_c=128,
    )
    model = FIELD_MODELS[cfg.model_name]
    params = model.init(jax.random.PRNGKey(0), cfg, GRID)
    optimizer, opt_state = make_optimizer(params, 0.02, 1e-3, 0.999)
    statics = TrainStatics(
        n_samples=N_SAMPLES,
        step_size=0.05,
        white_bg=True,
        ndc_ray=False,
        total_steps=30000,
        lr_factor=0.999,
        weights=LossWeights(l1=8e-5, ortho=0.01),
        shade_top_k=32,
        from_store=True,
        strata_budgets=(16, 32, None),
        strata_n_samples=(N_SAMPLES, N_SAMPLES, N_SAMPLES),
    )
    step_fn = make_train_step(model, cfg, statics, optimizer)

    mesh = make_mesh(n_devices)
    params = replicate(mesh, params)
    opt_state = replicate(mesh, opt_state)
    store_n = GLOBAL_BATCH * 4
    rng = np.random.default_rng(0)
    o = rng.uniform(-1, 1, size=(store_n, 3)).astype(np.float32)
    d = rng.normal(size=(store_n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    store_rays = replicate(mesh, jnp.asarray(np.concatenate([o, d], 1)))
    store_rgbs = replicate(
        mesh,
        jnp.asarray(rng.uniform(size=(store_n, 3)).astype(np.float32)),
    )
    quotas = (GLOBAL_BATCH // 4, GLOBAL_BATCH // 4, GLOBAL_BATCH // 2)
    ids = tuple(
        shard_rays(
            mesh,
            jnp.asarray(rng.integers(0, store_n, size=(q,)).astype(np.int32)),
        )
        for q in quotas
    )
    aabb = jnp.asarray([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]])
    args = (
        params, opt_state, None, aabb, store_rays, store_rgbs,
        ids, jnp.asarray(0, jnp.int32), jax.random.PRNGKey(1),
    )
    n_param = sum(
        int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params)
    )
    return step_fn, args, n_param


def collective_bytes(hlo_text):
    """Total all-reduce payload bytes in the optimized HLO (f32 leaves)."""
    total = 0
    ops = 0
    for m in re.finditer(r"all-reduce[^=]*=\s*(\([^)]*\)|\S+)\s", hlo_text):
        sig = m.group(1)
        for shape in re.finditer(r"(f32|bf16|f16|s32|u32)\[([\d,]*)\]", sig):
            dtype, dims = shape.groups()
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += n * (2 if dtype in ("bf16", "f16") else 4)
        ops += 1
    return ops, total


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from tensorf_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    avail = len(jax.devices())
    rows = []
    for n in N_DEVICES:
        if n > avail:
            print(f"skip n={n} (only {avail} devices)")
            continue
        step_fn, args, n_param = build(n)
        t0 = time.time()
        lowered = step_fn.lower(*args)
        compiled = lowered.compile()
        t_compile = time.time() - t0
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost.get("flops", -1))
        bytes_acc = float(cost.get("bytes accessed", -1))
        hlo = compiled.as_text()
        n_ar, ar_bytes = collective_bytes(hlo)
        # one warm execution (serialized on 1 core — recorded for
        # completeness, not evidence); params/opt_state are donated, so
        # thread the returned state into the timed call
        out = compiled(*args)
        jax.block_until_ready(out)
        args2 = (out[0], out[1]) + args[2:]
        t1 = time.time()
        out = compiled(*args2)
        jax.block_until_ready(out)
        t_step = time.time() - t1
        rows.append(
            dict(
                n_devices=n,
                per_device_flops=flops,
                per_device_bytes=bytes_acc,
                all_reduce_ops=n_ar,
                all_reduce_bytes=ar_bytes,
                param_count=n_param,
                compile_s=round(t_compile, 1),
                serialized_step_s=round(t_step, 4),
            )
        )
        print(rows[-1], flush=True)

    # v5e projection at this global batch.  The step is MEMORY-bound on
    # the chip (BENCH_SELF_r03: 117 ms mask-era vs a 0.15 ms flops time at
    # peak), so the compute term scales with per-device BYTES, anchored to
    # the measured single-chip step time; comm term = bidirectional ring
    # all-reduce of the constant gradient payload.  The per-device bytes
    # themselves expose the Amdahl term: work on REPLICATED params (Adam,
    # L1/TV regularizers) does not shrink with N.
    base = rows[0]
    t_meas_s = MEASURED_STEP_MS / 1e3
    for r in rows:
        n = r["n_devices"]
        t_mem = t_meas_s * r["per_device_bytes"] / base["per_device_bytes"]
        t_comm = (
            0.0
            if n == 1
            else 2.0 * r["all_reduce_bytes"] / (ICI_GBPS * 1e9)
        )
        r["v5e_projected_step_ms"] = round((t_mem + t_comm) * 1e3, 3)
        r["v5e_projected_speedup"] = round(t_meas_s / (t_mem + t_comm), 2)

    out = {
        "global_batch": GLOBAL_BATCH,
        "grid": GRID,
        "n_samples": N_SAMPLES,
        "note": (
            "per-device costs from XLA cost analysis of the partitioned "
            "SPMD module; wall-clock on the 1-core virtual mesh is "
            "serialized and NOT scaling evidence; projection model: "
            "t = t_meas(1)*bytes(N)/bytes(1) + 2*grad_bytes/ICI_BW "
            "(memory-bound step, BENCH_SELF_r03 anchor)"
        ),
        "rows": rows,
    }
    with open(os.path.join(ROOT, "SCALING_r04.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("\n n | flops/dev | bytes/dev | AR bytes | proj v5e ms | speedup")
    for r in rows:
        print(
            f"{r['n_devices']:2d} | {r['per_device_flops']:.3e} | "
            f"{r['per_device_bytes']:.3e} | {r['all_reduce_bytes']:.2e} | "
            f"{r['v5e_projected_step_ms']:11.2f} | "
            f"{r['v5e_projected_speedup']:.2f}x"
        )
    print("wrote SCALING_r04.json")


if __name__ == "__main__":
    main()
