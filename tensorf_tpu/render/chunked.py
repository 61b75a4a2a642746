"""Chunked eval-time rendering — the `OctreeRender_trilinear_fast` surface.

The reference's render driver (renderer.py:13-26) host-loops over ray
chunks and calls the model per chunk.  Here each chunk is one call into a
single cached jitted render program (fixed chunk shape; the tail chunk is
padded), so full-image rendering runs at device speed with one compile.
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# TENSORF_RENDER_TRACE=1: print per-bucket serving timings to stderr
# (tier, bucket size, chunk, lattice, ms) — the tunnel has no trace
# viewer, so this is how serving frames get attributed on the TPU.
_TRACE = bool(os.environ.get("TENSORF_RENDER_TRACE"))

from ..models.alpha_mask import COARSE_STRIDE
from ..ops.freq_mask import FreeMasks
from .volume import render_rays


@partial(
    jax.jit,
    static_argnames=(
        "model",
        "cfg",
        "step_size",
        "n_samples",
        "white_bg",
        "ndc_ray",
        "shade_top_k",
        "fused",
        "sample_budget",
        "budget_mode",
        "use_coarse_gate",
        "alive_budget",
    ),
)
def _render_eval(
    model,
    cfg,
    params,
    alpha_mask,
    rays,
    aabb,
    masks,
    *,
    step_size,
    n_samples,
    white_bg,
    ndc_ray,
    shade_top_k,
    fused,
    sample_budget,
    budget_mode="alive",
    use_coarse_gate=True,
    alive_budget=None,
):
    out = render_rays(
        model,
        cfg,
        params,
        alpha_mask,
        rays,
        None,
        masks,
        aabb=aabb,
        step_size=step_size,
        n_samples=n_samples,
        is_train=False,
        white_bg=white_bg,
        ndc_ray=ndc_ray,
        shade_top_k=shade_top_k,
        fused=fused,
        sample_budget=sample_budget,
        budget_mode=budget_mode,
        use_coarse_gate=use_coarse_gate,
        alive_budget=alive_budget,
    )
    return out.rgb, out.depth, out.num_valid_samples, out.budget_overflow_frac


def make_render_fn(
    model,
    cfg,
    *,
    step_size: float,
    n_samples: int,
    white_bg: bool,
    ndc_ray: bool,
    shade_top_k: Optional[int] = None,
    fused: bool = True,
    sample_budget: Optional[int] = None,
    budget_mode: str = "alive",
    use_coarse_gate: bool = True,
    alive_budget: Optional[int] = None,
):
    """Bind the static render configuration; returns f(params, alpha_mask,
    rays, aabb, masks) -> (rgb, depth, num_valid, overflow_frac)."""

    def fn(params, alpha_mask, rays, aabb, masks=FreeMasks()):
        return _render_eval(
            model,
            cfg,
            params,
            alpha_mask,
            rays,
            aabb,
            masks,
            step_size=step_size,
            n_samples=n_samples,
            white_bg=white_bg,
            ndc_ray=ndc_ray,
            shade_top_k=shade_top_k,
            fused=fused,
            sample_budget=sample_budget,
            budget_mode=budget_mode,
            use_coarse_gate=use_coarse_gate,
            alive_budget=alive_budget,
        )

    return fn


@partial(
    jax.jit,
    static_argnames=(
        "model",
        "cfg",
        "step_size",
        "n_samples",
        "white_bg",
        "ndc_ray",
        "shade_top_k",
        "fused",
        "sample_budget",
        "budget_mode",
        "use_coarse_gate",
        "tile",
    ),
)
def _render_frame(
    model,
    cfg,
    params,
    alpha_mask,
    rays,  # (T*tile, 6) padded
    aabb,
    masks,
    *,
    step_size,
    n_samples,
    white_bg,
    ndc_ray,
    shade_top_k,
    fused,
    sample_budget,
    budget_mode,
    use_coarse_gate,
    tile,
):
    """Whole-frame render as ONE device program: lax.map over ray tiles.

    The host-loop chunk driver costs one dispatch per chunk — through a
    tunneled chip that dominates frame time (reference surface being
    replaced: renderer.py:13-26 host loop).  Here the tile loop is compiled
    into the program, so a full frame is a single dispatch.
    """
    tiles = rays.reshape(-1, tile, 6)

    def body(r):
        out = render_rays(
            model, cfg, params, alpha_mask, r, None, masks,
            aabb=aabb, step_size=step_size, n_samples=n_samples,
            is_train=False, white_bg=white_bg, ndc_ray=ndc_ray,
            shade_top_k=shade_top_k, fused=fused,
            sample_budget=sample_budget, budget_mode=budget_mode,
            use_coarse_gate=use_coarse_gate,
        )
        return out.rgb, out.depth

    rgb, depth = jax.lax.map(body, tiles)
    return rgb.reshape(-1, 3), depth.reshape(-1)


def render_frame(
    render_cfg: dict,
    params,
    alpha_mask,
    rays,
    aabb,
    *,
    tile: int = 16384,
    masks: FreeMasks = FreeMasks(),
):
    """Render (M, 6) rays in one device dispatch; returns numpy rgb/depth.

    ``render_cfg`` holds the static kwargs of make_render_fn (model, cfg,
    step_size, n_samples, white_bg, ndc_ray, shade_top_k, fused,
    sample_budget).
    """
    rays = np.asarray(rays, dtype=np.float32)
    M = rays.shape[0]
    pad = (-M) % tile
    if pad:
        rays = np.concatenate(
            [rays, np.broadcast_to(rays[-1:], (pad, 6))], axis=0
        )
    rgb, depth = _render_frame(
        render_cfg["model"],
        render_cfg["cfg"],
        params,
        alpha_mask,
        jnp.asarray(rays),
        aabb,
        masks,
        step_size=render_cfg["step_size"],
        n_samples=render_cfg["n_samples"],
        white_bg=render_cfg["white_bg"],
        ndc_ray=render_cfg["ndc_ray"],
        shade_top_k=render_cfg.get("shade_top_k"),
        fused=render_cfg.get("fused", True),
        sample_budget=render_cfg.get("sample_budget"),
        budget_mode=render_cfg.get("budget_mode", "alive"),
        use_coarse_gate=render_cfg.get("use_coarse_gate", True),
        tile=tile,
    )
    return np.asarray(rgb[:M]), np.asarray(depth[:M])


def render_chunked(
    render_fn,
    params,
    alpha_mask,
    rays,
    aabb,
    *,
    chunk: int = 8192,
    masks: FreeMasks = FreeMasks(),
    mesh=None,
):
    """Render (M, 6) rays in fixed-size chunks; returns numpy rgb/depth.

    Pads the tail chunk so every call hits the same compiled program.
    With ``mesh`` set, each chunk's rays are sharded over the mesh's data
    axis (ray-batch DP, same layout as the train step) and GSPMD runs the
    render SPMD — params/mask/aabb ride along replicated automatically.
    """
    put = jnp.asarray
    if mesh is not None and chunk % mesh.devices.size == 0:
        from ..parallel.mesh import shard_rays

        def put(part):  # noqa: E306 - chunk-sharding placement
            return shard_rays(mesh, jnp.asarray(part))

    rays = np.asarray(rays, dtype=np.float32)
    M = rays.shape[0]
    pending = []
    for start in range(0, M, chunk):
        part = rays[start : start + chunk]
        n = part.shape[0]
        if n < chunk:
            part = np.concatenate(
                [part, np.broadcast_to(part[-1:], (chunk - n, 6))], axis=0
            )
        # dispatch every chunk asynchronously; fetch after the loop so the
        # device pipeline never stalls on host transfers
        pending.append(
            (n, render_fn(params, alpha_mask, put(part), aabb, masks))
        )
    # to_host gathers shards living on other processes (multi-host eval
    # rides the same sharded chunks; device_get alone refuses
    # non-addressable arrays) — identity single-process
    from ..parallel.mesh import to_host

    rgbs = [to_host(out[0])[:n] for n, out in pending]
    depths = [to_host(out[1])[:n] for n, out in pending]
    total_valid = int(sum(int(to_host(out[2])) for _, out in pending))
    max_overflow = max(
        (float(to_host(out[3])) for _, out in pending), default=0.0
    )
    return (
        np.concatenate(rgbs, axis=0),
        np.concatenate(depths, axis=0),
        total_valid,
        max_overflow,
    )


@partial(
    jax.jit,
    static_argnames=(
        "model",
        "cfg",
        "step_size",
        "n_samples",
        "white_bg",
        "shade_top_k",
        "fused",
        "sample_budget",
    ),
)
def _render_eval_windows(
    model,
    cfg,
    params,
    alpha_mask,
    rays_store,  # (M_pad, 6) f32, DEVICE-resident for the whole frame
    bits_store,  # (M_pad, Gb_full) uint8 packed window hits (count pass)
    idx,  # (chunk,) int32 rows of this bucket chunk
    aabb,
    masks,
    *,
    step_size,
    n_samples,
    white_bg,
    shade_top_k,
    fused,
    sample_budget,
):
    """Device-resident window-bits bucket render.

    The tunnel moves host<->device bytes at ~15 MB/s with ~50-100 ms per
    round trip (measured r5), so per-bucket programs gather their rays
    AND their candidate-window bits from frame-resident stores by a
    small int32 index upload — nothing else crosses the link.  The
    render itself never touches the full sample lattice (render_rays
    window-bits path): candidate windows come from the count pass.
    """
    rays = jnp.take(rays_store, idx, axis=0)
    G = -(-n_samples // COARSE_STRIDE)
    gb = -(-G // 8)
    bits = jax.lax.slice_in_dim(
        jnp.take(bits_store, idx, axis=0), 0, gb, axis=1
    )
    out = render_rays(
        model,
        cfg,
        params,
        alpha_mask,
        rays,
        None,
        masks,
        aabb=aabb,
        step_size=step_size,
        n_samples=n_samples,
        is_train=False,
        white_bg=white_bg,
        ndc_ray=False,
        shade_top_k=shade_top_k,
        fused=fused,
        sample_budget=sample_budget,
        budget_mode="cand",
        cand_window_bits=bits,
    )
    return out.rgb, out.depth, out.num_valid_samples, out.budget_overflow_frac


@jax.jit
def rays_from_pose(directions, c2w):
    """Device-side get_rays (ops/rays.py:57-67): camera-space directions
    (M, 3) x pose (3/4, 4) -> (M, 6) ray store.  With directions uploaded
    once per serving session, a new view costs a 48-byte pose upload
    instead of a 15 MB ray upload through the ~15 MB/s tunnel."""
    rays_d = directions @ c2w[:3, :3].T
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return jnp.concatenate([rays_o, rays_d], axis=-1)


# Chunk-size ladder shared by the serving drivers: the tier-independent
# per-chunk cost scales with chunk size, so a small bucket must not pad
# to the full chunk; few static shapes keep the compiled-program set
# bounded.
_CHUNK_LADDER = (2048, 4096, 8192, 16384, 32768)


def _next_chunk(rem: int, cap: int) -> int:
    """Smallest ladder size >= rem (<= cap) — unless that would pad by
    >1.3x, in which case the largest ladder size <= rem (the bucket then
    spans multiple chunks)."""
    sizes = [c for c in _CHUNK_LADDER if c <= cap] or [cap]
    c = next((x for x in sizes if x >= rem), sizes[-1])
    if c > rem * 1.3 and c > sizes[0]:
        c = max(x for x in sizes if x <= max(rem, sizes[0]))
    return c


# Budget ladder for stratified serving: candidate budgets are snapped UP
# to one of these static tiers so every frame reuses the same small set of
# compiled programs (32-multiples).  Spacing bounds within-tier padding at
# ~1.25x below 512 — measured per-chunk cost is ~linear in the tier
# (scripts/ablate_render.py: 145ms + 1.6ms/unit per 32k chunk), so a
# denser ladder trades a few extra cached programs for proportional
# per-ray work; the per-bucket chunk ladder keeps small buckets cheap.
BUDGET_TIERS = (32, 64, 96, 128, 160, 192, 224, 256, 320, 384, 448, 512,
                640, 768, 1024)


def render_chunked_stratified(
    model,
    cfg,
    params,
    alpha_mask,
    rays,
    aabb,
    *,
    step_size: float,
    n_samples: int,
    white_bg: bool,
    ndc_ray: bool,
    shade_top_k: Optional[int] = None,
    fused: bool = True,
    chunk: int = 8192,
    masks: FreeMasks = FreeMasks(),
    use_coarse_gate: bool = True,
    alive_stage: bool = False,
    mesh=None,
):
    """Candidate-count-stratified eval rendering (round-3 serving path).

    Serving frames are dominated by rays that hit little or nothing (the
    measured unfiltered mean candidate count is ~48-72 vs a p99.9 fixed
    budget of 416-448 — BENCH_PARAMS.json): count candidates per ray (one
    strided coarse-gate pass), sort rays by count, composite the
    zero-candidate majority to background on host, render each budget-tier
    bucket at its own static ``cand``-mode budget — exact by construction
    (tier >= every member's candidate count; eval is deterministic, no
    jitter) — and scatter results back to pixel order.  Replaces the
    reference's uniform-chunk driver economy (renderer.py:13-26) where
    torch's dynamic compaction pays per-ray cost automatically.

    Measured chunk economics on v5e (scripts/ablate_render.py): a 32k-ray
    chunk costs ~145 ms of tier-independent full-lattice work (sampling,
    gate probes, top-k compaction) + ~1.6 ms per tier unit — hence the
    zero-skip, the per-bucket chunk-size ladder (a bucket of 3k rays must
    not pad to a 32k chunk), and the coarse-only count pass (the exact
    gate quadruples count-pass rows; ``alive_stage=True`` restores the
    exact count + per-bucket alive second stage, measured marginal).
    """
    if ndc_ray:
        # The candidate-count passes march the non-NDC slab — counts would
        # be wrong for NDC rays (rays wrongly zero-skipped to background).
        # All in-repo constructors guard on `not ndc_ray`; make the
        # contract explicit for external callers by falling back to the
        # uniform-chunk driver, which is exact for NDC.
        fn = make_render_fn(
            model,
            cfg,
            step_size=step_size,
            n_samples=n_samples,
            white_bg=white_bg,
            ndc_ray=True,
            shade_top_k=shade_top_k,
            fused=fused,
            use_coarse_gate=False,
        )
        # mirror the stratified path's HBM guard: an unbudgeted render at
        # a deep lattice must not materialize a chunk*n_samples footprint
        # sized for the budgeted path
        ndc_chunk = min(chunk, 8192) if n_samples > 512 else chunk
        return render_chunked(
            fn, params, alpha_mask, rays, aabb,
            chunk=ndc_chunk, masks=masks, mesh=mesh,
        )
    # no import cycle: culling imports render.volume only
    from .culling import (
        count_ray_candidates,
        count_ray_candidates_and_alive,
        count_ray_candidates_and_chord,
        count_ray_candidates_chord_bits,
    )

    near_far = tuple(float(v) for v in cfg.near_far)
    # Device-resident window-bits serving (round 5): one-dispatch count
    # pass emits per-window hit bits; bucket programs gather rays + bits
    # from frame-resident stores and skip all full-lattice work.  Multi-
    # host mesh serving and the exact-alive second stage keep the legacy
    # host-chunked driver below.
    use_bits = use_coarse_gate and not alive_stage and mesh is None
    if use_bits:
        return _render_stratified_resident(
            model, cfg, params, alpha_mask, rays, aabb,
            step_size=step_size, n_samples=n_samples, white_bg=white_bg,
            shade_top_k=shade_top_k, fused=fused, chunk=chunk, masks=masks,
            near_far=near_far, use_coarse_gate=use_coarse_gate,
        )
    if isinstance(rays, jax.Array):
        rays = jax.device_get(rays)
    rays = np.asarray(rays, dtype=np.float32)
    M = rays.shape[0]
    chords = None
    t_count0 = time.perf_counter() if _TRACE else 0.0
    if use_coarse_gate and alive_stage:
        counts, alive_counts, _ = count_ray_candidates_and_alive(
            rays,
            alpha_mask,
            np.asarray(aabb),
            step_size,
            near_far,
            n_samples=n_samples,
            chunk=max(chunk, 32768),
        )
    elif use_coarse_gate:
        counts, chords = count_ray_candidates_and_chord(
            rays,
            alpha_mask,
            np.asarray(aabb),
            step_size,
            near_far,
            n_samples=n_samples,
            chunk=max(chunk, 32768),
        )
        alive_counts = None
    else:
        counts = count_ray_candidates(
            rays,
            alpha_mask,
            np.asarray(aabb),
            step_size,
            near_far,
            n_samples=n_samples,
            chunk=max(chunk, 32768),
            use_coarse=use_coarse_gate,
        )
        alive_counts = None
    if _TRACE:
        print(
            f"[render-trace] count_pass {M} rays "
            f"{(time.perf_counter() - t_count0) * 1e3:.1f} ms",
            file=sys.stderr, flush=True,
        )
    order = np.argsort(counts, kind="stable")
    sorted_counts = counts[order]

    tiers = [t for t in BUDGET_TIERS if t < n_samples]
    rgb_sorted = np.empty((M, 3), np.float32)
    depth_sorted = np.empty((M,), np.float32)
    total_valid = 0
    max_overflow = 0.0
    # Zero-candidate rays (the majority of a serving frame: measured p50
    # candidate count is 0, BENCH_PARAMS.json) render to pure background —
    # acc == 0, every sigma gated off — so composite them on host for free
    # instead of paying the full-lattice fixed work (sampling, gate
    # probes, compaction) a rendered chunk costs regardless of its tier.
    start = int(np.searchsorted(sorted_counts, 0, side="right"))
    if start > 0:
        sel = order[:start]
        rgb_sorted[:start] = 1.0 if white_bg else 0.0
        # depth convention of _composite: (1-acc) * rays[:, -1] with acc=0
        depth_sorted[:start] = rays[sel, -1]
    for tier in tiers + [None]:  # None = full lattice for the tail
        if start >= M:
            break
        if tier is None:
            end = M
        else:
            end = int(np.searchsorted(sorted_counts, tier, side="right"))
        if end <= start:
            continue
        # Exact-alive second stage per bucket: eval counts are deterministic
        # (no jitter), so the bucket's alive maximum — snapped UP to the
        # same static tier ladder to bound program variants — is an exact
        # stage-2 budget.  Only worth compiling when it undercuts the
        # candidate tier.
        alive_tier = None
        if tier is not None and alive_counts is not None:
            amax = int(alive_counts[order[start:end]].max())
            snapped = next((t for t in BUDGET_TIERS if t >= amax), None)
            if snapped is not None and snapped < tier:
                alive_tier = snapped
        # Chord-capped lattice: samples start at each ray's bbox ENTRY
        # (ops/rays.py::sample_along_rays), so a ray's valid samples
        # occupy indices [0, chord) — a bucket whose longest member chord
        # is C renders bit-exactly on an n_samples=C lattice, shrinking
        # ALL fixed per-chunk lattice work (sampling, gate probes, top-k)
        # by C/n_samples.  Snapped to a coarse 128-ladder to bound the
        # compiled-program set; the tier budget is dropped where the
        # capped lattice itself is at least as tight.
        n_eff = n_samples
        if chords is not None:  # (ndc_ray already returned above)
            cmax = int(chords[order[start:end]].max())
            n_eff = min(n_samples, max(128, -(-cmax // 128) * 128))
        tier_b = tier if (tier is not None and tier < n_eff) else None
        fn = make_render_fn(
            model,
            cfg,
            step_size=step_size,
            n_samples=n_eff,
            white_bg=white_bg,
            ndc_ray=ndc_ray,
            shade_top_k=shade_top_k,
            fused=fused,
            sample_budget=tier_b,
            budget_mode="cand",
            use_coarse_gate=use_coarse_gate,
            alive_budget=alive_tier,
        )
        # chunk-size ladder: the tier-independent per-chunk cost scales
        # with chunk x lattice, so a small bucket must not pad to the
        # full chunk — snap to the smallest ladder size covering the
        # bucket (>= 2048 to amortize dispatch; few static shapes keep
        # the compiled-program set bounded)
        n_b = end - start
        chunk_b = chunk
        for c in _CHUNK_LADDER[:-1]:
            if c >= chunk:
                break
            if n_b <= c:
                chunk_b = c
                break
        # memory guard: with no budget compaction the packed density
        # footprint intermediate is (chunk * n_eff) rows — cap the chunk
        # so an unbudgeted tail bucket at a large lattice cannot OOM the
        # 16 GB HBM (observed: 32k x 1075 x 64ch fusion buffer = 18 GB)
        if tier_b is None and n_eff > 512:
            chunk_b = min(chunk_b, 8192)
        t_b = time.perf_counter() if _TRACE else 0.0
        rgb_b, depth_b, nv, of = render_chunked(
            fn,
            params,
            alpha_mask,
            rays[order[start:end]],
            aabb,
            chunk=chunk_b,
            masks=masks,
            mesh=mesh,
        )
        if _TRACE:
            print(
                f"[render-trace] tier={tier} alive={alive_tier} "
                f"n={end - start} chunk={chunk_b} lattice={n_eff} "
                f"{(time.perf_counter() - t_b) * 1e3:.1f} ms",
                file=sys.stderr, flush=True,
            )
        rgb_sorted[start:end] = rgb_b
        depth_sorted[start:end] = depth_b
        total_valid += nv
        max_overflow = max(max_overflow, of)
        start = end

    inv = np.empty_like(order)
    inv[order] = np.arange(M)
    return rgb_sorted[inv], depth_sorted[inv], total_valid, max_overflow


def _render_stratified_resident(
    model,
    cfg,
    params,
    alpha_mask,
    rays,
    aabb,
    *,
    step_size: float,
    n_samples: int,
    white_bg: bool,
    shade_top_k: Optional[int],
    fused: bool,
    chunk: int,
    masks: FreeMasks,
    near_far,
    use_coarse_gate: bool,
):
    """Device-resident stratified serving (round-5 hot path).

    Per frame, the tunnel carries: the ray store up ONCE (or nothing, if
    ``rays`` is already a device array from rays_from_pose), int16
    counts/chords down, one small int32 index upload per bucket chunk,
    and rgb/depth down — ~6 MB instead of the legacy driver's ~40 MB at
    ~15 MB/s.  Dispatches: 1 count pass (lax.map over tiles) + one per
    bucket chunk, issued back-to-back and fetched AFTER the full loop so
    the ~50-100 ms per-dispatch tunnel latency overlaps device compute.
    Bucket programs consume the count pass's window bits and never touch
    the full sample lattice (render/volume.py window-bits path).
    """
    from .culling import count_ray_candidates_chord_bits

    is_dev = isinstance(rays, jax.Array)
    M = int(rays.shape[0])
    t_count0 = time.perf_counter() if _TRACE else 0.0
    counts, chords, bits_dev, rays_dev = count_ray_candidates_chord_bits(
        rays, alpha_mask, np.asarray(aabb), step_size, near_far,
        n_samples=n_samples, tile=max(chunk, 32768),
    )
    if _TRACE:
        print(
            f"[render-trace] count_pass {M} rays "
            f"{(time.perf_counter() - t_count0) * 1e3:.1f} ms",
            file=sys.stderr, flush=True,
        )
    dirz = np.asarray(rays_dev[:M, 5]) if is_dev else \
        np.asarray(rays, np.float32)[:, 5]
    order = np.argsort(counts, kind="stable")
    sorted_counts = counts[order]

    tiers = [t for t in BUDGET_TIERS if t < n_samples]
    rgb_sorted = np.empty((M, 3), np.float32)
    depth_sorted = np.empty((M,), np.float32)
    total_valid = 0
    max_overflow = 0.0
    # zero-candidate rays composite to pure background on host (see
    # render_chunked_stratified)
    start = int(np.searchsorted(sorted_counts, 0, side="right"))
    if start > 0:
        rgb_sorted[:start] = 1.0 if white_bg else 0.0
        depth_sorted[:start] = dirz[order[:start]]
    aabb_j = jnp.asarray(aabb)
    pending = []  # (sorted-offset, n_valid, tier, K_b, n_eff, t0, future)
    for tier in tiers + [None]:
        if start >= M:
            break
        if tier is None:
            end = M
        else:
            end = int(np.searchsorted(sorted_counts, tier, side="right"))
        if end <= start:
            continue
        # chord-capped lattice + tier budget, as in the legacy driver
        cmax = int(chords[order[start:end]].max())
        n_eff = min(n_samples, max(128, -(-cmax // 128) * 128))
        tier_b = tier if (tier is not None and tier < n_eff) else None
        # the window-bits program needs a COARSE_STRIDE-multiple budget;
        # with no tier undercut the lattice itself is the budget (top-G
        # of G windows — still exact, still lattice-free)
        K_b = tier_b if tier_b is not None else n_eff
        if K_b % COARSE_STRIDE != 0:
            # rare tail (n_eff == n_samples with n_samples % 4 != 0):
            # legacy host-chunked render for just this bucket
            idx_all = order[start:end]
            rows = (
                np.asarray(jnp.take(rays_dev, jnp.asarray(idx_all), axis=0))
                if is_dev else np.asarray(rays, np.float32)[idx_all]
            )
            fn = make_render_fn(
                model, cfg, step_size=step_size, n_samples=n_eff,
                white_bg=white_bg, ndc_ray=False, shade_top_k=shade_top_k,
                fused=fused, sample_budget=tier_b, budget_mode="cand",
                use_coarse_gate=use_coarse_gate,
            )
            cb = chunk if (tier_b is not None or n_eff <= 512) \
                else min(chunk, 8192)
            rgb_b, depth_b, nv, of = render_chunked(
                fn, params, alpha_mask, rows, aabb, chunk=cb, masks=masks,
            )
            rgb_sorted[start:end] = rgb_b
            depth_sorted[start:end] = depth_b
            total_valid += nv
            max_overflow = max(max_overflow, of)
            start = end
            continue
        # memory guard: (chunk x K_b) feature intermediates — deep
        # budgets cap the chunk (observed r3: 32k x 1075-row buffers OOM)
        cap = chunk if K_b <= 512 else min(chunk, 8192)
        idx_all = order[start:end]
        n_b = end - start
        lo = 0
        while lo < n_b:
            c = _next_chunk(n_b - lo, cap)
            idx = idx_all[lo : lo + c]
            n = idx.shape[0]
            if n < c:
                idx = np.concatenate(
                    [idx, np.broadcast_to(idx[-1:], (c - n,))], axis=0
                )
            t_b = time.perf_counter() if _TRACE else 0.0
            fut = _render_eval_windows(
                model, cfg, params, alpha_mask, rays_dev, bits_dev,
                jnp.asarray(idx.astype(np.int32)), aabb_j, masks,
                step_size=step_size, n_samples=n_eff, white_bg=white_bg,
                shade_top_k=shade_top_k, fused=fused, sample_budget=K_b,
            )
            pending.append((start + lo, n, tier, K_b, n_eff, c, t_b, fut))
            lo += c
        start = end
    for lo, n, tier, K_b, n_eff, c, t_b, fut in pending:
        rgb_b, depth_b, nv, of = fut
        rgb_sorted[lo : lo + n] = np.asarray(rgb_b)[:n]
        depth_sorted[lo : lo + n] = np.asarray(depth_b)[:n]
        total_valid += int(nv)
        max_overflow = max(max_overflow, float(of))
        if _TRACE:
            # dispatches overlap — per-line ms is dispatch->fetch-done
            print(
                f"[render-trace] tier={tier} K={K_b} n={n} chunk={c} "
                f"lattice={n_eff} {(time.perf_counter() - t_b) * 1e3:.1f} "
                "ms (pipelined)",
                file=sys.stderr, flush=True,
            )

    inv = np.empty_like(order)
    inv[order] = np.arange(M)
    return rgb_sorted[inv], depth_sorted[inv], total_valid, max_overflow
