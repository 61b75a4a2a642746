#!/usr/bin/env python
"""Step-time attribution by ablation (round-3 follow-up to the roofline).

Times the mask-era / phase-A VMSplit configuration with pieces disabled,
so the gap between the measured step and the roofline floor is
attributable without a trace viewer:

  full        the real train step (fwd + bwd + Adam + regs)
  fwd         render only (no grad/optimizer)
  no_shade    render with shading short-circuited via shade_top_k=1
  no_budget   render without the budget compaction (full lattice gates)
  den_only    density_feature_fused only: gather+sigma+raw2alpha, no app

Usage: python scripts/ablate_step.py [--phase A|C]
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import argparse
import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


_ELEM_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "i32": 4, "ui32": 4,
               "i8": 1, "ui8": 1, "i1": 1, "f64": 8, "i64": 8}


def _shapes(sig):
    """'(tensor<AxBxf32>, ...) -> tensor<...>' -> ([(dims, dtype)], ...)."""
    import re

    def parse(seg):
        out = []
        for m in re.finditer(r"tensor<([0-9x]*)x?([a-z]+[0-9]+|i1)>", seg):
            dims = [int(d) for d in m.group(1).split("x") if d]
            out.append((dims, m.group(2)))
        return out

    lhs, _, rhs = sig.partition("->")
    return parse(lhs), parse(rhs)


def _row_cost_ns(roof, width_bytes, kind):
    """Per-row ns from the measured ceilings, nearest width class."""
    classes = [64, 256, 768, 1024]
    w = min(classes, key=lambda c: abs(c - min(width_bytes, 1024)))
    key = f"{kind}_rows_per_sec_{w}B" if w != 1024 else \
        f"{kind}_rows_per_sec_1024B"
    return 1e9 / float(roof[key])


def _attrib_report(variants, params, rays, args):
    """Price every gather/scatter/dot in the lowered StableHLO against the
    measured roofline so the phase-vs-floor gap is attributable to named
    ops (round-5 follow-up: phase A ran at 45% of floor with no trace
    viewer available through the tunnel)."""
    import re

    import jax

    roof_path = os.path.join(ROOT, "BENCH_DETAIL.json")
    with open(roof_path) as f:
        roof = json.load(f)

    for vname in ("fwd", "fwd_bwd"):
        txt = variants[vname].lower(params, rays).as_text()
        items = []
        bulk_bytes = 0
        # ops with regions (scatter, sort, reduce) put their type signature
        # lines after the region body — stitch region ops back onto one
        # logical line so the signature parse below sees them
        lines = []
        pending = None
        for ln in txt.splitlines():
            if pending is not None:
                pending += " " + ln.strip()
                if re.search(r"\}\) : \(", ln) or " : (" in ln:
                    lines.append(pending)
                    pending = None
                continue
            if re.search(r'"stablehlo\.(scatter|sort)"', ln) \
                    and " : (" not in ln:
                pending = ln.strip()
                continue
            lines.append(ln)
        for ln in lines:
            sig = ln.rsplit(" : ", 1)
            if len(sig) != 2:
                continue
            op_m = re.search(r'"?stablehlo\.(\w+)"?', ln)
            if not op_m:
                continue
            op = op_m.group(1)
            batched = "batching_dims" in ln
            ins, outs = _shapes(sig[1])
            if op == "gather" and ins and outs:
                dims, dt = outs[0]
                width = (dims[-1] if dims else 1) * _ELEM_BYTES.get(dt, 4)
                rows = 1
                for d in dims[:-1]:
                    rows *= d
                ms = rows * _row_cost_ns(roof, width, "gather") * 1e-6
                items.append((ms, f"gather {rows}r x {width}B "
                                  f"tbl={ins[0][0]}"))
            elif op == "scatter" and len(ins) >= 3:
                dims, dt = ins[2]
                width = (dims[-1] if dims else 1) * _ELEM_BYTES.get(dt, 4)
                rows = 1
                for d in dims[:-1]:
                    rows *= d
                ms = rows * _row_cost_ns(roof, width, "scatter") * 1e-6
                if batched:
                    ms *= 4  # measured batched-RMW penalty (bench_ops)
                items.append((ms, f"scatter{'(batched)' if batched else ''}"
                                  f" {rows}r x {width}B tbl={ins[0][0]}"))
            elif op == "dot_general" and len(ins) >= 2 and outs:
                (da, dta), (db, _) = ins[0], ins[1]
                dr, dtr = outs[0]
                numel = lambda d: int(np.prod(d)) if d else 1
                k = da[-1] if da else 1
                flops = 2.0 * numel(dr) * k
                bw = (numel(da) * _ELEM_BYTES.get(dta, 4)
                      + numel(db) * 4 + numel(dr) * _ELEM_BYTES.get(dtr, 4))
                peak = 45e12 if dta == "f32" else 180e12
                ms = max(flops / peak, bw / 81e9) * 1e3
                items.append((ms, f"dot {da}x{db}->{dr} {dta} "
                                  f"{flops/1e9:.1f}GF"))
            elif op in ("concatenate", "pad", "transpose", "sort"):
                n = sum(
                    int(np.prod(d)) * _ELEM_BYTES.get(dt, 4)
                    for d, dt in ins
                )
                if n > 4 << 20:
                    bulk_bytes += 2 * n  # read + write
                    items.append((2 * n / 81e9 * 1e3,
                                  f"{op} {n/1e6:.0f}MB"))
        items.sort(reverse=True)
        total = sum(m for m, _ in items)
        print(f"== {vname}: {len(items)} priced ops, "
              f"roofline-estimated {total:.1f} ms ==")
        for ms, desc in items[:30]:
            print(f"  {ms:7.2f} ms  {desc}")
        agg = {}
        for ms, desc in items:
            agg[desc.split()[0]] = agg.get(desc.split()[0], 0.0) + ms
        print("  by-class: " + "  ".join(
            f"{k}={v:.1f}ms" for k, v in sorted(agg.items())))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="C", choices=["A", "C"])
    ap.add_argument("--model", default="TensorVMSplit",
                    choices=["TensorVMSplit", "TensorCP"],
                    help="field model to attribute (CP mirrors bench.py's "
                         "16/48 lego.txt configuration)")
    ap.add_argument("--line_dtype", default="float32",
                    help="one-hot line-matrix dtype (bfloat16 = the r3 "
                         "measured ~6ms/step lever, now a separate knob)")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (compile smoke test while "
                         "the TPU is owned by a training run)")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--grid", type=int, default=0,
                    help="override the phase grid (CPU smoke tests)")
    ap.add_argument("--topk", type=int, default=-1,
                    help="override shade_top_k (-1 = phase default: 32 "
                         "masked / None pre-mask) — measures the phase-A "
                         "top-K appearance split candidate")
    ap.add_argument("--attrib", action="store_true",
                    help="no timing: lower fwd/fwd_bwd to StableHLO and "
                         "price every gather/scatter/dot against the "
                         "measured roofline (BENCH_DETAIL.json) — names "
                         "where the floor gap lives without a TPU")
    args = ap.parse_args()

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(ROOT, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from tensorf_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from tensorf_tpu.models import FIELD_MODELS, ModelConfig
    from tensorf_tpu.models.alpha_mask import AlphaGridMask, with_dilation
    from tensorf_tpu.models.config import cal_n_samples
    from tensorf_tpu.ops.freq_mask import FreeMasks
    from tensorf_tpu.render.volume import render_rays

    params_bench = bench.load_params()
    grid = args.grid or (300 if args.phase == "C" else 128)
    mask_on = args.phase == "C"
    batch = args.batch

    if args.model == "TensorCP":
        cfg = ModelConfig(
            model_name="TensorCP", density_n_comp=(16,), app_n_comp=(48,),
            app_dim=27, shading_mode="MLP_Fea",
            pos_pe=2, view_pe=2, fea_pe=2, feature_c=128,
            line_dtype=args.line_dtype,
        )
    else:
        cfg = ModelConfig(
            model_name="TensorVMSplit", density_n_comp=(16, 16, 16),
            app_n_comp=(48, 48, 48), app_dim=27, shading_mode="MLP_Fea",
            pos_pe=2, view_pe=2, fea_pe=2, feature_c=128,
            line_dtype=args.line_dtype,
        )
    model = FIELD_MODELS[cfg.model_name]
    gs = (grid, grid, grid)
    n_samples = cal_n_samples(gs, 0.5)
    step_size = float(3.0 / (grid - 1) * 0.5)
    params = model.init(jax.random.PRNGKey(0), cfg, gs)
    aabb = jnp.asarray([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]])

    rng = np.random.default_rng(0)
    o = rng.normal(size=(batch, 3))
    o = 4.0 * o / np.linalg.norm(o, axis=-1, keepdims=True)
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate([o, d], -1).astype(np.float32))

    mask = None
    if mask_on:
        mg = min(grid, 214)
        occ = float(params_bench["mask_occupancy"])
        vol = (rng.uniform(size=(mg, mg, mg)) < occ).astype(np.float32)
        mask = with_dilation(
            AlphaGridMask(aabb=aabb, volume=jnp.asarray(vol))
        )

    if mask_on:
        strata = bench._strata_for(params_bench, n_samples)
    else:
        pf = params_bench.get("prefilter") or bench.DEFAULT_PARAMS[
            "prefilter"
        ]
        ps = pf.get("strata")
        if ps:
            # chord-capped lattices: in-bbox budgets ARE the lattices
            strata = [
                (int(q), None, None, min(int(b), n_samples))
                for q, b in zip(ps["quotas"], ps["budgets"])
            ]
        else:
            strata = [
                (batch, min(int(pf["prefilter_budget"]), n_samples - 1),
                 None)
            ]

    if batch != 4096:
        # smoke-test batches: scale the measured 4096-ray quotas down
        strata = [(max(1, q * batch // 4096), *rest) for q, *rest in strata]

    def _barrier(o):
        # scalar device_get is the only reliable barrier on axon; sum the
        # first leaf (one XLA program -> completion is all-or-nothing)
        leaf = jax.tree_util.tree_leaves(o)[0]
        jax.device_get(jnp.sum(leaf))

    def timed(f, *a, iters=args.iters):
        _barrier(f(*a))
        tic = time.perf_counter()
        for _ in range(iters):
            o = f(*a)
        _barrier(o)
        t1 = time.perf_counter() - tic
        tic = time.perf_counter()
        for _ in range(2 * iters):
            o = f(*a)
        _barrier(o)
        return ((time.perf_counter() - tic) - t1) / iters

    def render_strata(params, rays, *, shade_top_k, budgets=None,
                      use_budget=True):
        """Concatenated per-stratum renders (mirrors the stratified step)."""
        outs = []
        start = 0
        for q, K, K2, *ne in strata:
            ne = ne[0] if (ne and ne[0]) else n_samples
            sub = jax.lax.dynamic_slice_in_dim(rays, start % batch, q)
            start += q
            out = render_rays(
                model, cfg, params, mask, sub, None, FreeMasks(),
                aabb=aabb, step_size=step_size, n_samples=ne,
                is_train=False, white_bg=True, ndc_ray=False,
                shade_top_k=shade_top_k, fused=True,
                sample_budget=(K if use_budget else None),
                budget_mode="cand" if mask_on else "alive",
                alive_budget=(K2 if use_budget else None),
            )
            outs.append(out.rgb)
        return jnp.concatenate(outs)

    topk = 32 if mask_on else 64  # mirrors schema shade defaults
    if args.topk >= 0:
        topk = args.topk or None

    # ---- isolation stubs (round 5): decompose the floor gap ------------
    # mlp_off: shading head replaced by a 3-channel slice — keeps the
    # appearance gather (features feed the stub) but removes the MLP's
    # matmuls + PE + their activation traffic.
    import tensorf_tpu.render.volume as volume_mod

    real_apply_shading = volume_mod.apply_shading

    def _stub_shading(cfg_, params_, pts, viewdirs, features, masks_):
        return jax.nn.sigmoid(features[:, :3])

    class _DenOnly(model):
        """Appearance half removed in BOTH render paths (unsplit
        fused_features and the split path's app_feature_fused): no app
        gather, no app backward scatter; zeros keep downstream shapes."""

        @staticmethod
        def fused_features(cfg_, params_, xyz, den_mask, app_mask):
            den = model.density_feature_fused(cfg_, params_, xyz, den_mask)
            app = jnp.zeros(xyz.shape[:-1] + (cfg_.app_dim,), xyz.dtype)
            return den, app

        @staticmethod
        def app_feature_fused(cfg_, params_, xyz, mask):
            return jnp.zeros(xyz.shape[:-1] + (cfg_.app_dim,), xyz.dtype)

    class _SampleOnly(_DenOnly):
        """No table reads at all — sampling + compaction + composite
        skeleton.  The tiny scalar param term keeps the backward alive
        (otherwise XLA dead-code-eliminates the whole grad program)."""

        @staticmethod
        def fused_features(cfg_, params_, xyz, den_mask, app_mask):
            den = params_["basis"][0, 0] * 1e-3 * xyz[..., 0]
            app = jnp.zeros(xyz.shape[:-1] + (cfg_.app_dim,), xyz.dtype)
            return den, app

        @staticmethod
        def density_feature_fused(cfg_, params_, xyz, mask):
            return params_["basis"][0, 0] * 1e-3 * xyz[..., 0]

    def render_with(model_, cfg_, params_, rays_, *, shade_top_k,
                    use_budget=True):
        outs = []
        start = 0
        for q, K, K2, *ne in strata:
            ne = ne[0] if (ne and ne[0]) else n_samples
            sub = jax.lax.dynamic_slice_in_dim(rays_, start % batch, q)
            start += q
            out = render_rays(
                model_, cfg_, params_, mask, sub, None, FreeMasks(),
                aabb=aabb, step_size=step_size, n_samples=ne,
                is_train=False, white_bg=True, ndc_ray=False,
                shade_top_k=shade_top_k, fused=True,
                sample_budget=(K if use_budget else None),
                budget_mode="cand" if mask_on else "alive",
                alive_budget=(K2 if use_budget else None),
            )
            outs.append(out.rgb)
        return jnp.concatenate(outs)

    cfg_bf16 = dataclasses.replace(cfg, dtype="bfloat16")

    variants = {
        "fwd": jax.jit(
            lambda p, r: render_strata(p, r, shade_top_k=topk)
        ),
        "fwd_bwd": jax.jit(
            jax.grad(
                lambda p, r: jnp.sum(
                    render_strata(p, r, shade_top_k=topk)
                ),
            )
        ),
        "fwd_shade1": jax.jit(
            lambda p, r: render_strata(p, r, shade_top_k=1)
        ),
        "fwd_bwd_shade1": jax.jit(
            jax.grad(
                lambda p, r: jnp.sum(
                    render_strata(p, r, shade_top_k=1)
                ),
            )
        ),
        "fwd_nobudget": jax.jit(
            lambda p, r: render_strata(
                p, r, shade_top_k=topk, use_budget=False
            )
        ),
        "fwd_bwd_bf16mlp": jax.jit(
            jax.grad(
                lambda p, r: jnp.sum(
                    render_with(model, cfg_bf16, p, r, shade_top_k=topk)
                ),
            )
        ),
    }
    # patched variants: (name, model_cls, stub_shading?)
    patched = {
        "fwd_mlp_off": (model, True, False),
        "fwd_bwd_mlp_off": (model, True, True),
        "fwd_den_only": (_DenOnly, True, False),
        "fwd_bwd_den_only": (_DenOnly, True, True),
        "fwd_sample_only": (_SampleOnly, True, False),
        "fwd_bwd_sample_only": (_SampleOnly, True, True),
    }
    # line-sampling isolation (round 5, phase-A gap hunt): force the
    # footprint-gather path for line factors instead of the one-hot
    # matmul — if the matmul's one-hot operand is being materialized
    # (580 MB/axis at phase-A row counts) this arm shows the delta.
    import tensorf_tpu.models.tensorf as tensorf_mod

    def _lines_gather_variant(bwd):
        def run(p, r):
            return jnp.sum(render_with(model, cfg, p, r, shade_top_k=topk))
        return jax.jit(jax.grad(run) if bwd else run)

    lines_arms = {
        "fwd_lines_gather": False,
        "fwd_bwd_lines_gather": True,
    }
    if args.attrib:
        _attrib_report(variants, params, rays, args)
        return

    out = {"phase": args.phase, "model": args.model,
           "line_dtype": args.line_dtype, "shade_top_k": topk,
           "strata": strata, "n_samples": n_samples}
    for name, fn in variants.items():
        try:
            t = timed(fn, params, rays)
            out[name + "_ms"] = round(t * 1e3, 1)
            print(f"{name:18s} {t*1e3:8.1f} ms", flush=True)
        except Exception as e:
            print(f"{name:18s} FAILED {type(e).__name__}: {e}", flush=True)
    for name, (model_, stub, bwd) in patched.items():
        def base(p, r, _m=model_):
            return jnp.sum(render_with(_m, cfg, p, r, shade_top_k=topk))

        fn = jax.jit(jax.grad(base) if bwd else base)
        try:
            if stub:
                volume_mod.apply_shading = _stub_shading
            t = timed(fn, params, rays)
            out[name + "_ms"] = round(t * 1e3, 1)
            print(f"{name:18s} {t*1e3:8.1f} ms", flush=True)
        except Exception as e:
            print(f"{name:18s} FAILED {type(e).__name__}: {e}", flush=True)
        finally:
            volume_mod.apply_shading = real_apply_shading
    real_maxlen = tensorf_mod._LINE_MATMUL_MAX_LEN
    for name, bwd in lines_arms.items():
        fn = _lines_gather_variant(bwd)
        try:
            tensorf_mod._LINE_MATMUL_MAX_LEN = 0
            t = timed(fn, params, rays)
            out[name + "_ms"] = round(t * 1e3, 1)
            print(f"{name:18s} {t*1e3:8.1f} ms", flush=True)
        except Exception as e:
            print(f"{name:18s} FAILED {type(e).__name__}: {e}", flush=True)
        finally:
            tensorf_mod._LINE_MATMUL_MAX_LEN = real_maxlen
    print(json.dumps(out))


if __name__ == "__main__":
    main()
