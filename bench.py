#!/usr/bin/env python
"""Benchmark: training throughput (rays/sec/chip) of the flagship models.

Measures the full jitted train step (render + AD + Adam + all regularizers
+ FreeNeRF masks) of the reference's two flagship lego configurations
(reference configs/config.yaml + configs/lego.txt):

  * TensorVMSplit 16/48, MLP_Fea, batch 4096 — the headline metric.
  * TensorCP 16/48 (lego.txt model) — reported as `cp_rays_per_sec`.

The 30k-iteration schedule is modeled phase-by-phase at the *real* grid
resolutions of the reference's upsample schedule (N_voxel 128^3 -> 300^3
geometric over [2000,3000,4000,5500,7000], config.yaml:38-44), not a
single fixed grid:

  phase A  iters     0- 2000  128^3 grid, no alpha mask, monitored
                              prefilter candidate budget (measured p99.9
                              of in-bbox counts) over the full lattice
  phase C  iters  2000-30000  300^3 grid (the final-grid cost is charged
                              to the whole mask era -> conservative),
                              alpha mask, ALIVE-COUNT-STRATIFIED
                              sub-batches at measured per-stratum
                              candidate budgets (the production layout:
                              device-resident store + ids-only feed)

All parameters (mask occupancy, strata sizes/quotas/budgets, prefilter
budget) come from BENCH_PARAMS.json when a measured full-schedule run has
written one (scripts/measure_occupancy.py), else conservative defaults.

vs_baseline: the reference PyTorch implementation trains the VMSplit
configuration at roughly 1.2e5 rays/sec on a desktop GPU (upstream TensoRF
reports ~17 min for 30k x 4096-ray iters on a 2080Ti-class card; the repo
itself publishes no numbers — SURVEY.md §6).  vs_baseline = measured /
1.2e5; BASELINE.json's north star asks for >5x per chip.

Roofline fields (VERDICT r1 #8, r2 #3): plane_gather_rows_per_sec /
plane_scatter_rows_per_sec are the *measured* per-op ceilings from this
chip (scripts/bench_ops.py methodology); floor_ms_* is the minimum step
time those ceilings allow for the exact gather/scatter row counts each
phase must move (see _floor_ms for the term-by-term account), and
vs_roofline = floor / measured per phase.

Timing note: on the tunneled axon backend block_until_ready returns before
execution completes; a scalar device_get is the only reliable barrier, and
the N-vs-2N delta removes fixed dispatch overhead.
"""

import os

# persistent XLA compile cache — first compile of each program through
# the tunneled TPU takes minutes; cached recompiles take seconds
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import json
import time

import numpy as np

BASELINE_RAYS_PER_SEC = 1.2e5
TOTAL_ITERS = 30000
PHASES = (
    # (name, iters, grid, mask_on).  The whole mask era is modeled at the
    # FINAL 300^3 grid (the 2000-7000 iters actually run at 131..260-sized
    # grids, which are cheaper — so the weighted number is conservative);
    # two phases per model keeps the cold-compile cost of a bench run
    # bounded (~4 train-step programs).
    ("A", 2000, 128, False),
    ("C", 28000, 300, True),
)
DEFAULT_PARAMS = {
    "mask_occupancy": 0.15,
    "sample_budget": 160,
    "train_strata": {
        "quotas": [2048, 1224, 616, 208],
        "budgets": [160, 288, 384, 480],
        "batch": 4096,
    },
    "prefilter": {"prefilter_budget": 352},
}
SHADE_TOP_K = 32
# pre-mask (phase-A) top-K appearance split — mirrors the schema
# default prefilter_shade_top_k=64 (round 5: 166.6 -> 91.4 ms/step)
SHADE_TOP_K_PREFILTER = 64
COARSE_STRIDE = 4


def load_params():
    p = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_PARAMS.json")
    if os.path.exists(p):
        with open(p) as f:
            d = json.load(f)
        return {**DEFAULT_PARAMS, **d}
    return dict(DEFAULT_PARAMS)


def _strata_for(params_bench, n_samples):
    """(quota, cand_budget, alive_budget, n_eff) tuples for the mask-era
    stratified step; budgets are capped at the per-stratum chord lattice
    n_eff (None = unbudgeted stratum; alive None = single-stage)."""
    ts = params_bench.get("train_strata") or DEFAULT_PARAMS["train_strata"]
    alive = ts.get("alive_budgets") or [0] * len(ts["quotas"])
    neff = ts.get("n_eff") or [n_samples] * len(ts["quotas"])
    out = []
    for q, b, a, ne in zip(ts["quotas"], ts["budgets"], alive, neff):
        ne = min(int(ne), n_samples)
        cb = int(b) if int(b) < ne else None
        ab = int(a) if (cb is not None and 0 < int(a) < cb) else None
        out.append((int(q), cb, ab, ne))
    return out


def _make_step(model_name, grid, mask_on, batch, params_bench):
    import jax

    from tensorf_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from tensorf_tpu.models import FIELD_MODELS, ModelConfig
    from tensorf_tpu.models.alpha_mask import AlphaGridMask, with_dilation
    from tensorf_tpu.models.config import cal_n_samples
    from tensorf_tpu.train.losses import LossWeights
    from tensorf_tpu.train.optim import make_optimizer
    from tensorf_tpu.train.step import TrainStatics, make_train_step

    if model_name == "TensorCP":
        cfg = ModelConfig(
            model_name="TensorCP", density_n_comp=(16,), app_n_comp=(48,),
            app_dim=27, shading_mode="MLP", pos_pe=2, view_pe=2, fea_pe=2,
            feature_c=128,
        )
    else:
        cfg = ModelConfig(
            model_name="TensorVMSplit", density_n_comp=(16, 16, 16),
            app_n_comp=(48, 48, 48), app_dim=27, shading_mode="MLP_Fea",
            pos_pe=2, view_pe=2, fea_pe=2, feature_c=128,
        )
    model = FIELD_MODELS[cfg.model_name]
    gs = (grid, grid, grid)
    n_samples = cal_n_samples(gs, 0.5)
    step_size = float(3.0 / (grid - 1) * 0.5)

    params = model.init(jax.random.PRNGKey(0), cfg, gs)
    lr_factor = 0.1 ** (1 / TOTAL_ITERS)
    optimizer, opt_state = make_optimizer(params, 0.02, 1e-3, lr_factor)

    strata_ns = None
    if mask_on:
        strata = _strata_for(params_bench, n_samples)
        strata_budgets = tuple(b for _, b, _, _ in strata)
        strata_alive = tuple(a for _, _, a, _ in strata)
        strata_ns = tuple(ne for _, _, _, ne in strata)
        if not any(a is not None for a in strata_alive):
            strata_alive = None
        quotas = [q for q, _, _, _ in strata]
    else:
        strata_alive = None
        pf = params_bench.get("prefilter") or DEFAULT_PARAMS["prefilter"]
        ps = pf.get("strata")
        if ps:
            # measured in-bbox stratification of the warm-up phase
            # (train/loop.py::restratify mask-free branch); the in-bbox
            # count IS the chord, so each stratum renders unbudgeted on
            # its chord-capped lattice (the cap is the compaction)
            strata_budgets = tuple(
                int(b) if int(b) < n_samples else None
                for b in ps["budgets"]
            )
            strata_ns = tuple(
                min(int(b), n_samples) for b in ps["budgets"]
            )
            quotas = [int(q) for q in ps["quotas"]]
        else:
            strata_budgets = None
            quotas = [batch]

    statics = TrainStatics(
        n_samples=n_samples,
        step_size=step_size,
        white_bg=True,
        ndc_ray=False,
        total_steps=TOTAL_ITERS,
        lr_factor=lr_factor,
        weights=LossWeights(
            ortho=0.01 if "VM" in model_name else 0.0,
            l1=8e-5, tv_density=0.01, tv_app=0.01,
        ),
        free_reg=True,
        free_decomp=True,
        freq_reg_ratio=0.8,
        # production layout: device-resident ray store, ids-only feed
        from_store=True,
        strata_budgets=strata_budgets,
        strata_alive_budgets=strata_alive,
        strata_n_samples=strata_ns,
        sample_budget=(
            None if (mask_on or strata_budgets is not None)
            else min(int(pf["prefilter_budget"]), n_samples - 1)
        ),
        # mask-era split path: appearance gathered only for the top-K
        # shading weights (configs/lego_vm.txt shipping configuration)
        shade_top_k=SHADE_TOP_K if mask_on else SHADE_TOP_K_PREFILTER,
    )
    step_fn = make_train_step(model, cfg, statics, optimizer)

    rng = np.random.default_rng(0)
    store_n = 262_144
    o = rng.normal(size=(store_n, 3))
    o = 4.0 * o / np.linalg.norm(o, axis=-1, keepdims=True)
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    store_rays = jnp.asarray(np.concatenate([o, d], -1).astype(np.float32))
    store_rgbs = jnp.asarray(
        rng.uniform(size=(store_n, 3)).astype(np.float32)
    )
    ids_np = [
        rng.integers(0, store_n, size=(q,)).astype(np.int32) for q in quotas
    ]
    if strata_budgets is not None:
        ids = tuple(jnp.asarray(i) for i in ids_np)
    else:
        ids = jnp.asarray(ids_np[0])
    aabb = jnp.asarray([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]])

    mask = None
    if mask_on:
        # mask volumes stay at the resolution of their update event
        # (reference updateAlphaMask at iters 2000/4000 -> <=214^3 here);
        # occupancy from the measured run parameters.
        mg = min(grid, 214)
        occ = float(params_bench["mask_occupancy"])
        vol = (rng.uniform(size=(mg, mg, mg)) < occ).astype(np.float32)
        mask = with_dilation(AlphaGridMask(aabb=aabb, volume=jnp.asarray(vol)))

    key = jax.random.PRNGKey(0)

    def run(i, params, opt_state):
        k = jax.random.fold_in(key, i)
        return step_fn(
            params, opt_state, mask, aabb, store_rays, store_rgbs, ids,
            jnp.asarray(i, jnp.int32), k,
        )

    return run, params, opt_state


_PHASE_SPREAD = {}  # {(model, phase_grid): [delta_ms, delta_ms]} — detail


def _phase_step_time(model_name, grid, mask_on, params_bench,
                     batch=4096, iters=12):
    import jax

    run, params, opt_state = _make_step(
        model_name, grid, mask_on, batch, params_bench
    )
    params, opt_state, metrics = run(0, params, opt_state)
    float(jax.device_get(metrics["mse"]))

    def timed(n, params, opt_state):
        tic = time.perf_counter()
        for i in range(1, n + 1):
            params, opt_state, metrics = run(i, params, opt_state)
        float(jax.device_get(metrics["mse"]))
        return time.perf_counter() - tic, params, opt_state

    # two independent N-vs-2N deltas; keep the SLOWER one (ADVICE r4:
    # establish a noise band — the r4 CP 0.976x->0.949x "regression" was a
    # single unbanded measurement; flukes are always in the too-fast
    # direction, see _roofline.t_of).  Both land in BENCH_DETAIL.json.
    est = []
    for _ in range(2):
        t1, params, opt_state = timed(iters, params, opt_state)
        t2, params, opt_state = timed(2 * iters, params, opt_state)
        est.append((t2 - t1) / iters)
    _PHASE_SPREAD[f"{model_name}_{grid}"] = [round(e * 1e3, 1) for e in est]
    return max(est)


def _roofline(batch=4096):
    """Measured per-op ceilings at the row widths the step actually moves:
    64B (gate probes / compaction rows), 256B (packed 4-tap x 16ch density
    footprint rows), 768B (4-tap x 48ch appearance rows); the 1KB numbers
    are kept for continuity with r1/r2 bench JSONs."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    M, R = 1_048_576, 90000
    idx = jnp.asarray(rng.integers(0, R, size=M).astype(np.int32))

    def t_of(f, *a, iters=6):
        # Two independent N-vs-2N deltas; keep the SLOWER one.  A single
        # delta produced one fluke (r3 initial bench: 1KB scatter read
        # 242M rows/s = 4x r2; SCATTER_RECHECK_r03.txt re-measured 58M
        # across 16 configs) — an inflated t1 deflates the delta, and
        # flukes are always in the too-fast direction.
        o = f(*a); float(jax.device_get(jnp.sum(o)))
        est = []
        for _ in range(2):
            tic = time.perf_counter()
            for _ in range(iters):
                o = f(*a)
            float(jax.device_get(jnp.sum(o)))
            t1 = time.perf_counter() - tic
            tic = time.perf_counter()
            for _ in range(2 * iters):
                o = f(*a)
            float(jax.device_get(jnp.sum(o)))
            est.append(((time.perf_counter() - tic) - t1) / iters)
        return max(est)

    out = {}
    for C in (16, 64, 192, 256):
        tbl = jnp.asarray(rng.normal(size=(R, C)).astype(np.float32))
        g = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32))
        gather = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum(0))
        scatter = jax.jit(
            lambda gg, i, _R=R, _C=C: jnp.zeros((_R, _C), jnp.float32)
            .at[i]
            .add(gg)
        )
        tg, ts = t_of(gather, tbl, idx), t_of(scatter, g, idx)
        out[f"gather_rows_per_sec_{C*4}B"] = round(M / tg, 0)
        out[f"scatter_rows_per_sec_{C*4}B"] = round(M / ts, 0)
    # legacy field names (1KB rows) for r1/r2 comparability
    out["plane_gather_rows_per_sec"] = out["gather_rows_per_sec_1024B"]
    out["plane_scatter_rows_per_sec"] = out["scatter_rows_per_sec_1024B"]
    return out


def _floor_ms(roof, strata, n_lattice, *, shade_top_k, axes=3,
              mask_on=True):
    """Roofline floor for one train step (VERDICT r2 #3): the time the
    measured gather/scatter ceilings allow for the rows the step MUST
    move, at the widths it moves them, ignoring every flop (MLP, line
    matmuls, top-k, Adam) and all fusion slack.

    Per stratum of quota q at candidate budget K (None -> lattice),
    exact-alive budget K2 (None -> K2 = K, single stage), and per-stratum
    chord-capped lattice ne (defaults to the global lattice):
      64B-class gathers:  q*ne/4       coarse-gate probes (strided)
                        + q*K          candidate-compaction row gather
                          (only when the budget engages: K < ne)
                        + q*K          exact gate on kept rows
                        + q*K2         alive-compaction row gather (stage 2)
    split path (shade_top_k set):
      256B gathers:       axes*q*K2    density 4-tap footprint fwd rows
      768B gathers:       axes*q*topk  appearance footprint fwd rows
      256B scatters:      axes*q*K2    density footprint backward
      768B scatters:      axes*q*topk  appearance footprint backward
    unsplit path (no top-k, fused den+app table):
      1KB gathers/scatters: axes*q*K2  combined 4-tap footprint rows
    """
    g64 = float(roof["gather_rows_per_sec_64B"])
    g256 = float(roof["gather_rows_per_sec_256B"])
    g768 = float(roof["gather_rows_per_sec_768B"])
    g1k = float(roof["gather_rows_per_sec_1024B"])
    s256 = float(roof["scatter_rows_per_sec_256B"])
    s768 = float(roof["scatter_rows_per_sec_768B"])
    s1k = float(roof["scatter_rows_per_sec_1024B"])
    t = 0.0
    for q, K, *rest in strata:
        K2 = rest[0] if rest else None
        ne = rest[1] if len(rest) > 1 and rest[1] else n_lattice
        budget_on = K is not None and K < ne
        k = K if budget_on else ne
        k2 = K2 if (K2 is not None and budget_on) else k
        if mask_on:
            t += q * ne / COARSE_STRIDE / g64  # coarse probes
            if budget_on:
                t += q * (2 * k) / g64  # compaction gather + exact gate
            else:
                t += q * ne / g64  # exact gate over the capped lattice
        if k2 < k:
            t += q * k2 / g64  # stage-2 alive compaction row gather
        if shade_top_k is not None:
            topk = min(shade_top_k, k2)
            t += q * (
                axes * k2 / g256
                + axes * topk / g768
                + axes * k2 / s256
                + axes * topk / s768
            )
        else:
            t += q * (axes * k2 / g1k + axes * k2 / s1k)
    return t * 1e3


def weighted_rays_per_sec(phase_times, batch):
    total_time = sum(n * t for (_, n, _, _), t in phase_times)
    return TOTAL_ITERS * batch / total_time


def _device_or_die(timeout_s: float = 600.0):
    """Fail fast (with one well-formed JSON line) if the device never
    answers — the tunneled chip can wedge (r3: a 5+ hour outage where
    backend init blocked forever), and a hung bench is worse than an
    explicit error the driver can record."""
    import threading

    done = threading.Event()

    def watchdog():
        if not done.wait(timeout_s):
            print(
                json.dumps(
                    {
                        "metric": "train_rays_per_sec_per_chip",
                        "value": 0.0,
                        "unit": "rays/s",
                        "vs_baseline": 0.0,
                        "error": (
                            f"device unreachable: backend init/first op "
                            f"did not complete within {timeout_s:.0f}s "
                            "(tunnel outage); see BENCH_SELF_r03.json "
                            "for the last self-measured numbers"
                        ),
                    }
                ),
                flush=True,
            )
            os._exit(1)

    threading.Thread(target=watchdog, daemon=True).start()
    import jax
    import jax.numpy as jnp

    jax.device_get(jnp.zeros(()))  # forces backend init + one round trip
    done.set()


def main():
    from tensorf_tpu.models.config import cal_n_samples

    _device_or_die()
    params_bench = load_params()
    batch = 4096

    vm_times = [
        (ph, _phase_step_time("TensorVMSplit", grid, mask_on, params_bench))
        for ph in PHASES
        for (_, _, grid, mask_on) in [ph]
    ]
    vm_rays = weighted_rays_per_sec(vm_times, batch)

    cp_times = [
        (ph, _phase_step_time("TensorCP", grid, mask_on, params_bench))
        for ph in PHASES
        for (_, _, grid, mask_on) in [ph]
    ]
    cp_rays = weighted_rays_per_sec(cp_times, batch)

    roof = _roofline()

    # per-phase roofline floors for the VMSplit headline (fwd+bwd rows)
    floors = {}
    pf = params_bench.get("prefilter") or DEFAULT_PARAMS["prefilter"]
    for name, _, grid, mask_on in PHASES:
        ns = cal_n_samples((grid, grid, grid), 0.5)
        if mask_on:
            strata = _strata_for(params_bench, ns)
            floors[name] = round(
                _floor_ms(roof, strata, ns, shade_top_k=SHADE_TOP_K), 1
            )
        else:
            ps = pf.get("strata")
            if ps:
                # chord-capped lattices: in-bbox budgets ARE the lattices
                pstrata = [
                    (int(q), None, None, min(int(b), ns))
                    for q, b in zip(ps["quotas"], ps["budgets"])
                ]
            else:
                pstrata = [(batch, min(int(pf["prefilter_budget"]), ns))]
            floors[name] = round(
                _floor_ms(roof, pstrata, ns,
                          shade_top_k=SHADE_TOP_K_PREFILTER,
                          mask_on=False), 1
            )
    vs_roofline = {
        name: round(floors[name] / (t * 1e3), 3)
        for (name, _, _, _), t in vm_times
    }

    # VERDICT r4 #4: stdout must stay a compact (<~1KB) single JSON line —
    # the driver captures only a 2000-char tail, and BENCH_r04 lost the
    # headline metric to bench_params/roofline bloat.  Full detail
    # (bench_params, per-width roofline ceilings, baseline provenance)
    # goes to the sidecar BENCH_DETAIL.json + stderr.
    detail = {
        # vs_baseline normalizes to 1.2e5 rays/s — the upstream TensoRF
        # literature figure for this config on a 2080Ti-class GPU (the
        # reference repo publishes no numbers; no GPU here to measure one)
        "baseline_note": "vs_baseline = measured / 1.2e5 rays/s (2080Ti-"
                         "class literature figure; see bench.py docstring)",
        "phase_ms_cp": {
            name: round(t * 1e3, 1) for (name, _, _, _), t in cp_times
        },
        # per-phase noise band: the two independent N-vs-2N deltas each
        # reported phase time is the max of (ADVICE r4 #3)
        "phase_ms_spread": _PHASE_SPREAD,
        "bench_params": params_bench,
        **roof,
    }
    sidecar = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(sidecar, "w") as f:
        json.dump(detail, f, indent=1)
    import sys
    print(json.dumps(detail), file=sys.stderr)

    out = {
        "metric": "train_rays_per_sec_per_chip",
        "value": round(vm_rays, 1),
        "unit": "rays/s",
        "vs_baseline": round(vm_rays / BASELINE_RAYS_PER_SEC, 3),
        "cp_rays_per_sec": round(cp_rays, 1),
        "cp_vs_baseline": round(cp_rays / BASELINE_RAYS_PER_SEC, 3),
        "phase_ms_vm": {
            name: round(t * 1e3, 1) for (name, _, _, _), t in vm_times
        },
        "floor_ms_vm": floors,
        "vs_roofline_vm": vs_roofline,
        "detail": "BENCH_DETAIL.json",
    }
    line = json.dumps(out)
    assert len(line) < 1500, f"headline line too long ({len(line)} chars)"
    print(line)


if __name__ == "__main__":
    main()
