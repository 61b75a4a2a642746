"""Dense-alpha extraction, alpha-mask updates, and ray-set filtering.

Counterparts of getDenseAlpha / updateAlphaMask / filtering_rays
(reference models/tensorBase.py:214-288).  The dense sweeps run as jitted
fixed-shape slice programs on device; the shape-changing decisions (new
aabb, ray subset selection) happen on host at schedule boundaries, which is
where the reference performs them too.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.alpha_mask import (
    COARSE_STRIDE,
    AlphaGridMask,
    coarse_probe_hits,
    coarse_probe_indices,
    group_padded_count,
    max_pool_3d_same,
    sample_alpha_gate,
    sample_alpha_gate_coarse,
    with_dilation,
)
from ..ops.rays import aabb_entry_exit, sample_along_rays
from .volume import feature2density, normalize_coord


@partial(jax.jit, static_argnames=("model", "cfg", "length"))
def _alpha_at(model, cfg, params, alpha_mask, xyz, aabb, den_mask, *, length):
    """alpha = 1 - exp(-sigma * length) at arbitrary points, with the
    alpha-mask pre-cull as a gate (reference compute_alpha,
    tensorBase.py:298-318)."""
    if alpha_mask is not None:
        gate = sample_alpha_gate(alpha_mask, xyz) > 0
    else:
        gate = jnp.ones(xyz.shape[:-1], dtype=bool)
    xyz_n = normalize_coord(xyz, aabb)
    feat = model.density_feature(cfg, params, xyz_n, den_mask)
    sigma = jnp.where(gate, feature2density(cfg, feat), 0.0)
    return 1.0 - jnp.exp(-sigma * length)


def compute_alpha_grid(
    model,
    cfg,
    params,
    alpha_mask,
    aabb: np.ndarray,
    grid_size: Tuple[int, int, int],
    step_size: float,
    den_mask=None,
):
    """Dense (gx, gy, gz) alpha grid + the world-space sample lattice.

    Reference getDenseAlpha (tensorBase.py:214-230): linspace(0,1) lattice
    lerped into the aabb, evaluated per x-slice.
    """
    gx, gy, gz = grid_size
    aabb_j = jnp.asarray(aabb, jnp.float32).reshape(2, 3)
    samples = jnp.stack(
        jnp.meshgrid(
            jnp.linspace(0, 1, gx),
            jnp.linspace(0, 1, gy),
            jnp.linspace(0, 1, gz),
            indexing="ij",
        ),
        axis=-1,
    )
    dense_xyz = aabb_j[0] * (1 - samples) + aabb_j[1] * samples

    rows = []
    for i in range(gx):
        a = _alpha_at(
            model,
            cfg,
            params,
            alpha_mask,
            dense_xyz[i].reshape(-1, 3),
            aabb_j,
            den_mask,
            length=float(step_size),
        )
        rows.append(np.asarray(a).reshape(gy, gz))
    return np.stack(rows, axis=0), np.asarray(dense_xyz)


def update_alpha_mask(
    model,
    cfg,
    params,
    alpha_mask,
    aabb: np.ndarray,
    grid_size: Tuple[int, int, int],
    step_size: float,
    den_mask=None,
) -> Tuple[AlphaGridMask, np.ndarray, float]:
    """Rebuild the occupancy mask and return the tight new aabb.

    Reference updateAlphaMask (tensorBase.py:232-256): clamp, transpose to
    (z, y, x), ks=3 max-pool dilation, threshold to {0,1}, new aabb from
    the nonzero extent.  Returns (mask, new_aabb (2,3), occupancy_ratio).
    """
    alpha, dense_xyz = compute_alpha_grid(
        model, cfg, params, alpha_mask, aabb, grid_size, step_size, den_mask
    )
    vol = jnp.asarray(np.clip(alpha, 0, 1).transpose(2, 1, 0))  # (z, y, x)
    vol = max_pool_3d_same(vol, ks=3)
    vol = (vol >= cfg.alpha_mask_thres).astype(jnp.float32)

    vol_np = np.asarray(vol)
    xyz_zyx = dense_xyz.transpose(2, 1, 0, 3)
    valid = xyz_zyx[vol_np > 0.5]
    if valid.size == 0:
        new_aabb = np.asarray(aabb, np.float32).reshape(2, 3)
    else:
        new_aabb = np.stack([valid.min(axis=0), valid.max(axis=0)])
    ratio = float(vol_np.sum() / vol_np.size)
    mask = with_dilation(
        AlphaGridMask(
            aabb=jnp.asarray(aabb, jnp.float32).reshape(2, 3), volume=vol
        )
    )
    return mask, new_aabb, ratio


@jax.jit
def _bbox_hit(rays, aabb):
    t_min, t_max = aabb_entry_exit(rays[:, :3], rays[:, 3:6], aabb)
    return t_max > t_min


@partial(jax.jit, static_argnames=("n_samples", "step_size", "near", "far"))
def _alpha_hit(rays, alpha_mask, aabb, *, n_samples, step_size, near, far):
    xyz, _, valid = sample_along_rays(
        rays[:, :3],
        rays[:, 3:6],
        aabb,
        near,
        far,
        step_size,
        n_samples,
        None,
    )
    alive = valid & (sample_alpha_gate(alpha_mask, xyz) > 0)
    return jnp.any(alive, axis=-1)


def _chunked_mask(fn, rays: np.ndarray, chunk: int) -> np.ndarray:
    out = []
    for start in range(0, rays.shape[0], chunk):
        part = rays[start : start + chunk]
        n = part.shape[0]
        if n < chunk:
            part = np.concatenate(
                [part, np.broadcast_to(part[-1:], (chunk - n, 6))], 0
            )
        out.append(np.asarray(fn(jnp.asarray(part)))[:n])
    return np.concatenate(out, axis=0)


def filter_rays_bbox(all_rays, all_rgbs, aabb, chunk: int = 51200):
    """Keep rays whose segment intersects the scene bbox
    (reference filtering_rays bbox_only=True, tensorBase.py:271-277)."""
    rays = np.asarray(all_rays, np.float32)
    aabb_j = jnp.asarray(aabb, jnp.float32).reshape(2, 3)
    mask = _chunked_mask(lambda r: _bbox_hit(r, aabb_j), rays, chunk)
    print(
        f"========> bbox ray filtering: kept {mask.sum()}/{mask.size} "
        f"({mask.mean():.3f})"
    )
    return rays[mask], np.asarray(all_rgbs)[mask]


def filter_rays_alpha(
    all_rays,
    all_rgbs,
    alpha_mask: AlphaGridMask,
    aabb,
    step_size: float,
    near_far=(2.0, 6.0),
    n_samples: int = 256,
    chunk: int = 51200,
):
    """Keep rays with any alive sample under the alpha mask
    (reference filtering_rays bbox_only=False, tensorBase.py:279-281)."""
    rays = np.asarray(all_rays, np.float32)
    aabb_j = jnp.asarray(aabb, jnp.float32).reshape(2, 3)
    mask = _chunked_mask(
        lambda r: _alpha_hit(
            r,
            alpha_mask,
            aabb_j,
            n_samples=n_samples,
            step_size=float(step_size),
            near=float(near_far[0]),
            far=float(near_far[1]),
        ),
        rays,
        chunk,
    )
    print(
        f"========> alpha ray filtering: kept {mask.sum()}/{mask.size} "
        f"({mask.mean():.3f})"
    )
    if mask.sum() == 0:
        # An empty training set would NaN the loss (the reference would
        # crash the same way); keep the unfiltered set and warn.
        print("========> alpha ray filtering kept nothing; skipping filter")
        return rays, np.asarray(all_rgbs)
    return rays[mask], np.asarray(all_rgbs)[mask]


@partial(
    jax.jit,
    static_argnames=("n_samples", "step_size", "near", "far", "coarse"),
)
def _candidate_counts(
    rays, alpha_mask, aabb, *, n_samples, step_size, near, far, coarse
):
    xyz, _, valid = sample_along_rays(
        rays[:, :3], rays[:, 3:6], aabb, near, far, step_size, n_samples,
        None,
    )
    if coarse:
        # group-padded: the renderer selects whole stride windows
        cand = valid & sample_alpha_gate_coarse(alpha_mask, xyz)
        return group_padded_count(cand)
    cand = valid & (sample_alpha_gate(alpha_mask, xyz) > 0)
    return jnp.sum(cand.astype(jnp.int32), axis=-1)


@partial(
    jax.jit,
    static_argnames=("n_samples", "step_size", "near", "far"),
)
def _candidate_counts_both(
    rays, alpha_mask, aabb, *, n_samples, step_size, near, far
):
    """(coarse candidate count, exact alive count, in-bbox chord count)
    per ray in one pass.

    The exact gate dominates (one gathered probe per lattice sample); the
    strided coarse probes add ~1/COARSE_STRIDE on top, so fusing both into
    one program costs ~25% over the exact count alone vs 2x for two
    passes.  Candidate counts drive stratification edges / stage-1
    budgets, alive counts size stage-2 budgets, and the chord count caps
    the per-stratum sample lattice (samples start at the bbox entry, so a
    ray's valid samples occupy indices [0, chord)).
    """
    xyz, _, valid = sample_along_rays(
        rays[:, :3], rays[:, 3:6], aabb, near, far, step_size, n_samples,
        None,
    )
    cand = valid & sample_alpha_gate_coarse(alpha_mask, xyz)
    alive = valid & (sample_alpha_gate(alpha_mask, xyz) > 0)
    return (
        group_padded_count(cand),
        jnp.sum(alive.astype(jnp.int32), axis=-1),
        jnp.sum(valid.astype(jnp.int32), axis=-1),
    )


def count_ray_candidates(
    all_rays,
    alpha_mask: AlphaGridMask,
    aabb,
    step_size: float,
    near_far=(2.0, 6.0),
    n_samples: int = 256,
    chunk: int = 51200,
    use_coarse: bool = True,
) -> np.ndarray:
    """Per-ray coarse candidate-sample counts over the ray store.

    The building block of alive-count-stratified ray batching (the
    measured 8.6x fixed-budget-vs-mean gap, BENCH_PARAMS.json): partition
    the store by these counts so each stratum renders at its own sample
    budget instead of every ray paying the p99.9 budget.  Run at
    alpha-mask events (counts are stable between mask updates).
    """
    rays = np.asarray(all_rays, np.float32)
    aabb_j = jnp.asarray(aabb, jnp.float32).reshape(2, 3)
    out = []
    for start in range(0, rays.shape[0], chunk):
        part = rays[start : start + chunk]
        n = part.shape[0]
        if n < chunk:
            part = np.concatenate(
                [part, np.broadcast_to(part[-1:], (chunk - n, 6))], 0
            )
        out.append(
            np.asarray(
                _candidate_counts(
                    jnp.asarray(part), alpha_mask, aabb_j,
                    n_samples=n_samples, step_size=float(step_size),
                    near=float(near_far[0]), far=float(near_far[1]),
                    coarse=bool(use_coarse),
                )
            )[:n]
        )
    return np.concatenate(out, axis=0)


@partial(
    jax.jit,
    static_argnames=("n_samples", "step_size", "near", "far"),
)
def _candidate_and_chord_counts(
    rays, alpha_mask, aabb, *, n_samples, step_size, near, far
):
    """(group-padded coarse candidate count, in-bbox chord count) per ray
    — PROBE-ONLY: touches one mask row per COARSE_STRIDE samples and
    never materializes the (B, N, 3) lattice.

    Valid samples are contiguous from index 0 (samples march from the
    bbox entry through a convex box), so the chord is closed-form from
    the slab test, window validity is `window_start < chord`, and probe
    positions are computed directly with the same arithmetic
    sample_along_rays uses at those indices (xyz = o + (t0 + i*step)*d).

    The closed form can disagree with the renderer's per-sample
    inside-aabb test by one sample at FP boundaries, and the serving
    consumers size tiers / chord-capped lattices / the zero-skip
    DIRECTLY from these counts — so both statistics are reported
    CONSERVATIVELY (+1 chord sample, +1 candidate window on hitting
    rays): the render can only ever pay less than promised, never more,
    keeping 'exact by construction' true at a ~1% padding cost.  Rays
    that miss the bbox report exact zeros (the zero-skip majority).
    """
    o, d = rays[:, :3], rays[:, 3:6]
    t_min, t_max = aabb_entry_exit(o, d, aabb)
    t0 = jnp.clip(t_min, near, far)
    # a ray samples the box iff the slab test hits (t_max >= t_min) AND
    # the hit interval reaches past the clipped start t0 — without the
    # first clause a miss with t_min > far would alias to a false chord
    hit = (t_max >= t_min) & (t_max >= t0)
    n_in = jnp.floor((t_max - t0) / step_size) + 2.0  # +1 FP slack
    chord = jnp.clip(
        jnp.where(hit, n_in, 0.0), 0, n_samples
    ).astype(jnp.int32)

    pidx = coarse_probe_indices(n_samples)  # static (n_probe,)
    z = t0[:, None] + jnp.asarray(pidx, o.dtype)[None, :] * step_size
    probe = o[:, None, :] + d[:, None, :] * z[..., None]
    hits = coarse_probe_hits(alpha_mask, probe)  # (B, n_probe)
    starts = jnp.asarray(
        np.arange(pidx.shape[0]) * COARSE_STRIDE, jnp.int32
    )
    wvalid = hit[:, None] & (starts[None, :] < chord[:, None])
    cand_padded = COARSE_STRIDE * jnp.sum(
        (hits & wvalid).astype(jnp.int32), axis=-1
    )
    # +1-window slack on nonzero counts (never inflate true zeros: the
    # zero-skip composite depends on them)
    cand_padded = jnp.where(
        cand_padded > 0,
        jnp.minimum(cand_padded + COARSE_STRIDE, n_samples),
        0,
    )
    return cand_padded, chord


@partial(
    jax.jit,
    static_argnames=("n_samples", "step_size", "near", "far", "tile"),
)
def _cand_chord_bits_frame(
    rays, alpha_mask, aabb, *, n_samples, step_size, near, far, tile
):
    """One-dispatch whole-frame serving count pass: lax.map over ray
    tiles of _candidate_and_chord_counts' probe logic, additionally
    emitting the per-window hit BITS (little-endian packed uint8) the
    window-bits render path consumes (render/volume.py).

    Through the tunneled chip each host dispatch costs ~50-100 ms of
    round-trip latency and host<->device bytes move at ~15 MB/s
    (measured r5) — so the count pass is one program, and counts/chords
    return as int16 (they are <= n_samples < 2^15) to halve the fetch.
    """

    def body(r):
        o, d = r[:, :3], r[:, 3:6]
        t_min, t_max = aabb_entry_exit(o, d, aabb)
        t0 = jnp.clip(t_min, near, far)
        hit = (t_max >= t_min) & (t_max >= t0)
        n_in = jnp.floor((t_max - t0) / step_size) + 2.0  # +1 FP slack
        chord = jnp.clip(
            jnp.where(hit, n_in, 0.0), 0, n_samples
        ).astype(jnp.int32)
        pidx = coarse_probe_indices(n_samples)  # static (n_probe,)
        z = t0[:, None] + jnp.asarray(pidx, o.dtype)[None, :] * step_size
        probe = o[:, None, :] + d[:, None, :] * z[..., None]
        hits = coarse_probe_hits(alpha_mask, probe)  # (B, n_probe)
        starts = jnp.asarray(
            np.arange(pidx.shape[0]) * COARSE_STRIDE, jnp.int32
        )
        wvalid = hit[:, None] & (starts[None, :] < chord[:, None])
        cand_padded = COARSE_STRIDE * jnp.sum(
            (hits & wvalid).astype(jnp.int32), axis=-1
        )
        cand_padded = jnp.where(
            cand_padded > 0,
            jnp.minimum(cand_padded + COARSE_STRIDE, n_samples),
            0,
        )
        # RAW hits (unmasked): the consumer re-applies the chord window
        # validity itself, so sliced-lattice renders stay self-consistent
        bits = jnp.packbits(hits, axis=-1, bitorder="little")
        return (
            cand_padded.astype(jnp.int16),
            chord.astype(jnp.int16),
            bits,
        )

    c, h, b = jax.lax.map(body, rays.reshape(-1, tile, 6))
    M = rays.shape[0]
    return c.reshape(M), h.reshape(M), b.reshape(M, -1)


def count_ray_candidates_chord_bits(
    all_rays,
    alpha_mask: AlphaGridMask,
    aabb,
    step_size: float,
    near_far=(2.0, 6.0),
    n_samples: int = 256,
    tile: int = 32768,
):
    """Device-resident serving count pass over a frame's rays.

    Returns (counts (M,) np.int32, chords (M,) np.int32, window-hit bits
    (M_pad, Gb) uint8 ON DEVICE, rays (M_pad, 6) f32 ON DEVICE) — the
    bits and rays stay resident so per-bucket render programs gather
    their rows by small int32 index uploads instead of re-uploading rays
    through the ~15 MB/s tunnel (render/chunked.py).  ``all_rays`` may
    already be a device array (the pose-resident path)."""
    if isinstance(all_rays, jax.Array):
        rays_dev = all_rays.astype(jnp.float32)
        M = int(rays_dev.shape[0])
        pad = (-M) % tile
        if pad:
            rays_dev = jnp.concatenate(
                [rays_dev, jnp.broadcast_to(rays_dev[-1:], (pad, 6))], 0
            )
    else:
        rays = np.asarray(all_rays, np.float32)
        M = rays.shape[0]
        pad = (-M) % tile
        if pad:
            rays = np.concatenate(
                [rays, np.broadcast_to(rays[-1:], (pad, 6))], 0
            )
        rays_dev = jnp.asarray(rays)
    aabb_j = jnp.asarray(aabb, jnp.float32).reshape(2, 3)
    c, h, bits = _cand_chord_bits_frame(
        rays_dev, alpha_mask, aabb_j,
        n_samples=n_samples, step_size=float(step_size),
        near=float(near_far[0]), far=float(near_far[1]),
        tile=min(tile, int(rays_dev.shape[0])),
    )
    counts = np.asarray(c)[:M].astype(np.int32)
    chords = np.asarray(h)[:M].astype(np.int32)
    return counts, chords, bits, rays_dev


def count_ray_candidates_and_chord(
    all_rays,
    alpha_mask: AlphaGridMask,
    aabb,
    step_size: float,
    near_far=(2.0, 6.0),
    n_samples: int = 256,
    chunk: int = 51200,
):
    """Chunked (candidate, in-bbox chord) counts over a ray set — the
    serving-side statistics pair: candidates pick the budget tier, the
    chord caps the bucket's sample lattice (render/chunked.py)."""
    rays = np.asarray(all_rays, np.float32)
    aabb_j = jnp.asarray(aabb, jnp.float32).reshape(2, 3)
    cands, chords = [], []
    for start in range(0, rays.shape[0], chunk):
        part = rays[start : start + chunk]
        n = part.shape[0]
        if n < chunk:
            part = np.concatenate(
                [part, np.broadcast_to(part[-1:], (chunk - n, 6))], 0
            )
        c, h = _candidate_and_chord_counts(
            jnp.asarray(part), alpha_mask, aabb_j,
            n_samples=n_samples, step_size=float(step_size),
            near=float(near_far[0]), far=float(near_far[1]),
        )
        cands.append(np.asarray(c)[:n])
        chords.append(np.asarray(h)[:n])
    return np.concatenate(cands, axis=0), np.concatenate(chords, axis=0)


@partial(
    jax.jit,
    static_argnames=("n_samples", "step_size", "near", "far"),
)
def _inbbox_counts(rays, aabb, *, n_samples, step_size, near, far):
    _, _, valid = sample_along_rays(
        rays[:, :3], rays[:, 3:6], aabb, near, far, step_size, n_samples,
        None,
    )
    # group-padded: the mask-free budget compaction also selects whole
    # stride windows (render/volume.py)
    return group_padded_count(valid)


def count_ray_inbbox(
    all_rays,
    aabb,
    step_size: float,
    near_far=(2.0, 6.0),
    n_samples: int = 256,
    chunk: int = 51200,
) -> np.ndarray:
    """Per-ray in-bbox lattice sample counts (no alpha mask needed).

    The mask-free analog of count_ray_candidates for the prefilter phase:
    before the first alpha-mask event every in-bbox sample is alive, so
    the per-ray chord length through the bbox IS the candidate count.  It
    depends only on the (static) ray geometry and aabb — one chunked pass
    at startup stratifies the whole warm-up phase (reference economy:
    tensorBase.py:336-344 pays each ray its own in-bbox sample count).
    """
    rays = np.asarray(all_rays, np.float32)
    aabb_j = jnp.asarray(aabb, jnp.float32).reshape(2, 3)
    out = []
    for start in range(0, rays.shape[0], chunk):
        part = rays[start : start + chunk]
        n = part.shape[0]
        if n < chunk:
            part = np.concatenate(
                [part, np.broadcast_to(part[-1:], (chunk - n, 6))], 0
            )
        out.append(
            np.asarray(
                _inbbox_counts(
                    jnp.asarray(part), aabb_j,
                    n_samples=n_samples, step_size=float(step_size),
                    near=float(near_far[0]), far=float(near_far[1]),
                )
            )[:n]
        )
    return np.concatenate(out, axis=0)


def count_ray_candidates_and_alive(
    all_rays,
    alpha_mask: AlphaGridMask,
    aabb,
    step_size: float,
    near_far=(2.0, 6.0),
    n_samples: int = 256,
    chunk: int = 51200,
):
    """Per-ray (coarse candidate, exact alive, in-bbox chord) counts over
    the ray store — one fused device pass (see _candidate_counts_both).
    Candidate counts drive the stratification edges / stage-1 budgets;
    alive counts size the per-stratum exact-alive stage-2 budgets; chord
    counts cap the per-stratum sample lattice."""
    rays = np.asarray(all_rays, np.float32)
    aabb_j = jnp.asarray(aabb, jnp.float32).reshape(2, 3)
    cands, alives, chords = [], [], []
    for start in range(0, rays.shape[0], chunk):
        part = rays[start : start + chunk]
        n = part.shape[0]
        if n < chunk:
            part = np.concatenate(
                [part, np.broadcast_to(part[-1:], (chunk - n, 6))], 0
            )
        c, a, h = _candidate_counts_both(
            jnp.asarray(part), alpha_mask, aabb_j,
            n_samples=n_samples, step_size=float(step_size),
            near=float(near_far[0]), far=float(near_far[1]),
        )
        cands.append(np.asarray(c)[:n])
        alives.append(np.asarray(a)[:n])
        chords.append(np.asarray(h)[:n])
    return (
        np.concatenate(cands, axis=0),
        np.concatenate(alives, axis=0),
        np.concatenate(chords, axis=0),
    )


def _budget_hint(max_count: int) -> int:
    """Candidate budget for a stratum: its max count + jitter slack, padded
    to a 32-multiple (train-time stratified jitter moves samples within
    their lattice bin, so live counts can exceed the deterministic count by
    a few per surface crossing; overflow monitoring + auto-raise remain the
    backstop)."""
    return int(max(32, -(-(int(max_count) + 8) // 32) * 32))


def count_histogram(counts: np.ndarray, length: Optional[int] = None
                    ) -> np.ndarray:
    """int64 histogram ``hist[v] = #rays with count v``.  ``length`` fixes
    the array length (``length + 1`` bins) so per-host histograms can be
    summed element-wise across processes (multi-host stratification sync).
    """
    counts = np.asarray(counts, np.int64)
    if length is not None:
        # ``length`` must be an exact length, not bincount's lower bound:
        # group-PADDED count sources can exceed n_samples (padding rounds
        # up to the coarse stride), and a single such ray on one host
        # would desynchronize the element-wise host_allsum.  Clipping is
        # conservative — the ray lands in the top budget class.
        counts = np.clip(counts, 0, length)
    minlength = (length + 1) if length is not None else 0
    return np.bincount(counts, minlength=minlength).astype(np.int64)


def _hist_quantile(hist: np.ndarray, q: float) -> float:
    """``np.quantile`` (linear interpolation) of the integer population a
    histogram describes, without materializing it."""
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"Quantiles must be in the range [0, 1], got {q}")
    cum = np.cumsum(hist)
    n = int(cum[-1])
    pos = q * (n - 1)
    lo = int(np.floor(pos))
    hi = int(np.ceil(pos))
    v_lo = int(np.searchsorted(cum, lo + 1))  # sorted element at index lo
    v_hi = int(np.searchsorted(cum, hi + 1))
    return v_lo + (pos - lo) * (v_hi - v_lo)


def _optimal_edges(hist: np.ndarray, max_strata: int = 6,
                   stratum_penalty: float = 0.01):
    """Budget-class partition minimizing the expected per-ray budget.

    Every ray in a stratum pays the stratum's (padded) max budget, so the
    per-step sample cost is E[stratum budget]; quantile edges are
    arbitrary — the optimal contiguous partition over the ~n_samples/32
    padded-budget classes is exact via a tiny DP.  ``stratum_penalty``
    charges each extra stratum 1% of total cost (a sub-batch render has
    some fixed per-call cost), which also picks the stratum COUNT.

    Operates on a count histogram (see count_histogram) so multi-host runs
    can feed the globally summed histogram and derive identical edges on
    every process.  Returns upper-inclusive count edges (ascending, last ==
    max observed count).
    """
    hist = np.asarray(hist, np.int64)
    values = np.nonzero(hist)[0].astype(np.int64)
    vfreq = hist[values]
    vclasses = np.maximum(32, -((values + 8) // -32) * 32)  # _budget_hint
    uniq = np.unique(vclasses)
    freq = np.asarray(
        [int(vfreq[vclasses == c].sum()) for c in uniq], np.int64
    )
    m = uniq.size
    if m == 1:
        return [int(values.max())]
    pref = np.concatenate([[0], np.cumsum(freq)])
    S_max = min(max_strata, m)
    INF = float("inf")
    # dp[s][j]: min cost of covering classes [0, j) with s strata
    dp = [[INF] * (m + 1) for _ in range(S_max + 1)]
    choice = [[0] * (m + 1) for _ in range(S_max + 1)]
    dp[0][0] = 0.0
    for s in range(1, S_max + 1):
        for j in range(1, m + 1):
            for i in range(j):
                if dp[s - 1][i] == INF:
                    continue
                c = dp[s - 1][i] + (pref[j] - pref[i]) * float(uniq[j - 1])
                if c < dp[s][j]:
                    dp[s][j] = c
                    choice[s][j] = i
    total = float(vfreq.sum())
    best_s = min(
        range(1, S_max + 1),
        key=lambda s: dp[s][m] / total * (1.0 + stratum_penalty * s),
    )
    # recover class boundaries -> count edges
    cuts = []
    j = m
    for s in range(best_s, 0, -1):
        cuts.append(j)
        j = choice[s][j]
    cuts = sorted(set(cuts))
    edges = []
    for j in cuts:
        b = uniq[j - 1]  # stratum budget class
        # the largest actual count in this class
        edges.append(int(values[vclasses <= b].max()))
    edges[-1] = int(values.max())
    return sorted(set(edges))


def stratify_edges(hist: np.ndarray, quantiles=None,
                   min_frac: float = 0.01):
    """Stratum plan from a count histogram: (lo, hi] count intervals,
    per-stratum population sizes, and padded budget hints.

    A pure function of the histogram — processes that share a (summed)
    histogram derive IDENTICAL strata structure, budgets, and quotas, which
    multi-host SPMD requires (every process must compile the same step
    program; the host-local ray stores differ).  Single-host
    ``stratify_rays`` is a thin wrapper.

    ``quantiles=None`` (default) uses the cost-optimal DP partition
    (_optimal_edges); a quantile tuple forces explicit edges.  Strata
    smaller than ``min_frac`` of the population merge into their higher
    neighbor, and adjacent strata with equal budgets merge (a sub-batch
    render has fixed per-call cost; slivers aren't worth one).
    """
    hist = np.asarray(hist, np.int64)
    values = np.nonzero(hist)[0]
    assert values.size, "empty count histogram"
    vmax = int(values.max())
    if quantiles is None:
        bnds = _optimal_edges(hist)
    else:
        edges = sorted({int(_hist_quantile(hist, q)) for q in quantiles})
        bnds = edges + [vmax]
    cum = np.cumsum(hist)

    def size_of(lo: int, hi: int) -> int:  # population with count in (lo, hi]
        top = int(cum[min(hi, cum.size - 1)])
        bot = int(cum[lo]) if lo >= 0 else 0
        return top - bot

    raw = []
    lo = -1
    for e in bnds:
        if size_of(lo, e):
            raw.append([lo, e])
        lo = e
    # merge slivers upward (the last stratum merges downward)
    min_n = max(1, int(min_frac * int(cum[-1])))
    bounds = []
    for b in raw:
        bounds.append(b)
        if len(bounds) >= 2 and size_of(*bounds[-2]) < min_n:
            prev = bounds.pop(-2)
            bounds[-1][0] = prev[0]
    if len(bounds) >= 2 and size_of(*bounds[-1]) < min_n:
        last = bounds.pop(-1)
        bounds[-1][1] = last[1]

    def max_in(lo: int, hi: int) -> int:
        return int(values[(values > lo) & (values <= hi)].max())

    budgets = [_budget_hint(max_in(*b)) for b in bounds]
    # adjacent strata that rounded to the SAME budget gain nothing from
    # separate sub-batches — merge
    i = 0
    while i + 1 < len(bounds):
        if budgets[i] == budgets[i + 1]:
            bounds[i][1] = bounds[i + 1][1]
            bounds.pop(i + 1)
            budgets.pop(i)
        else:
            i += 1
    sizes = [size_of(*b) for b in bounds]
    return [tuple(b) for b in bounds], sizes, budgets


def strata_from_bounds(counts: np.ndarray, bounds):
    """Index arrays of the rays whose count falls in each (lo, hi] bound."""
    counts = np.asarray(counts)
    return [
        np.nonzero((counts > lo) & (counts <= hi))[0] for lo, hi in bounds
    ]


def stratify_rays(counts: np.ndarray, quantiles=None,
                  min_frac: float = 0.01):
    """Partition ray indices into strata by candidate count (single-host
    wrapper over stratify_edges).  Returns (list of index arrays
    low->high, list of per-stratum candidate budget hints)."""
    counts = np.asarray(counts)
    bounds, _, budgets = stratify_edges(
        count_histogram(counts), quantiles=quantiles, min_frac=min_frac
    )
    return strata_from_bounds(counts, bounds), budgets


def stratify_rays_joint(cand_counts: np.ndarray, alive_counts: np.ndarray,
                        quantiles=None, min_frac: float = 0.01):
    """Alive-primary stratification: strata partitioned by EXACT-ALIVE
    count, with per-stratum two-stage budgets.

    The wide per-sample rows (density footprint gather + its backward
    scatter, the step's dominant traffic) run at the stage-2 alive budget
    K2, while the stage-1 candidate compaction moves only cheap 64B rows
    (measured ~8x cheaper per row, SCATTER_RECHECK_r03.txt / bench_ops) —
    so the DP partition should minimize E[K2], not E[K1].  Partitioning by
    alive count does exactly that; each stratum's K1 is then the measured
    candidate maximum *within* the stratum, so BOTH compaction stages are
    exact by construction (no overflow at the measuring mask state).

    Returns (strata, cand_budgets K1, alive_budgets K2); alive budget is
    None where it does not undercut the stratum's candidate budget (single
    stage).  Reference economy matched: tensorBase.py:360-375 pays each
    ray's own alive count on every per-sample op.
    """
    alive_counts = np.asarray(alive_counts)
    cand_counts = np.asarray(cand_counts)
    strata, alive_budgets = stratify_rays(
        alive_counts, quantiles=quantiles, min_frac=min_frac
    )
    cand_budgets = [_budget_hint(cand_counts[sel].max()) for sel in strata]
    out_alive = [
        a if a < c else None for a, c in zip(alive_budgets, cand_budgets)
    ]
    return strata, cand_budgets, out_alive
