"""Fixed-shape masked volume renderer — the hot inner function.

TPU re-design of TensorBase.forward (reference models/tensorBase.py:321-395).
The reference's dynamic-shape boolean compaction (``xyz[ray_valid]``,
``rgb[app_mask]``) is replaced by masked computation over the full
(B, n_samples) lattice: dead samples contribute exactly zero density /
radiance through `where` gates, keeping every shape static so the whole
render + AD step compiles to one XLA program.

Culling cascade (same three stages as the reference, as gates):
  1. bbox validity from the fixed-count stratified sampler,
  2. alpha-mask occupancy gate (when a mask exists),
  3. shading only where weight > ray_march_weight_thres — either as a
     multiplicative gate over all samples, or (``shade_top_k``) by gathering
     the top-K weights per ray and shading that fixed-size subset, which
     recovers the reference's "skip dead samples" economy without dynamic
     shapes.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models.alpha_mask import (
    COARSE_STRIDE,
    AlphaGridMask,
    sample_alpha_gate,
    sample_alpha_gate_coarse,
)
from ..models.config import ModelConfig
from ..models.shading import apply_shading
from ..ops.freq_mask import FreeMasks
from ..ops.rays import (
    aabb_entry_exit,
    lattice_z,
    sample_along_rays,
    sample_along_rays_ndc,
    sample_lattice,
)
from ..ops.render_math import raw2alpha


# Re-derive z/xyz/dists from selected lattice indices instead of packing
# and gathering them through compaction (bit-identical on the affine
# non-NDC lattice; ~100 MB/step less pack/gather traffic at phase-C
# shapes).  Module-level so the equivalence test can pin derived ==
# gathered on the same inputs.
_DERIVED_COMPACTION = True


def normalize_coord(xyz: jax.Array, aabb: jax.Array) -> jax.Array:
    """World -> [-1, 1] grid coords (reference tensorBase.py:130-131)."""
    inv = 2.0 / (aabb[1] - aabb[0])
    return (xyz - aabb[0]) * inv - 1.0


def feature2density(cfg: ModelConfig, feat: jax.Array) -> jax.Array:
    """softplus(x + density_shift) or relu (reference tensorBase.py:291-295)."""
    if cfg.fea2dense_act == "softplus":
        return jax.nn.softplus(feat + cfg.density_shift)
    if cfg.fea2dense_act == "relu":
        return jax.nn.relu(feat)
    raise ValueError(f"unknown fea2dense_act {cfg.fea2dense_act}")


class RenderOutput(NamedTuple):
    rgb: jax.Array  # (B, 3)
    depth: jax.Array  # (B,)
    acc: jax.Array  # (B,)
    weights: jax.Array  # (B, N)
    sigma: jax.Array  # (B, N)
    z_vals: jax.Array  # (B, N)
    num_valid_samples: jax.Array  # scalar
    # Fraction of rays whose budget-candidate count exceeded sample_budget
    # (0.0 when no budget is active).  Nonzero means the fixed-budget
    # compaction dropped candidates and the render may under-integrate —
    # the train loop surfaces this as `budget_overflow_frac` (the exactness
    # condition of the reference's boolean compaction, tensorBase.py:360-375).
    # (defaults are python floats, NOT jnp scalars: a jnp default would
    # initialize the jax backend at module import — fatal when the
    # tunneled device is wedged; floats weak-type to f32 under jit)
    budget_overflow_frac: jax.Array = 0.0
    # Mean per-ray alive (exact-gated, in-bbox) sample count — the measured
    # occupancy statistic bench.py's phase model is calibrated against.
    mean_alive_samples: jax.Array = 0.0


def render_rays(
    model,
    cfg: ModelConfig,
    params,
    alpha_mask: Optional[AlphaGridMask],
    rays: jax.Array,
    key: Optional[jax.Array],
    masks: FreeMasks,
    *,
    aabb: jax.Array,
    step_size: float,
    n_samples: int,
    is_train: bool,
    white_bg: bool,
    ndc_ray: bool,
    shade_top_k: Optional[int] = None,
    fused: bool = True,
    sample_budget: Optional[int] = None,
    budget_mode: str = "alive",
    use_coarse_gate: bool = True,
    alive_budget: Optional[int] = None,
    cand_window_bits: Optional[jax.Array] = None,
) -> RenderOutput:
    """Volume-render a batch of rays (B, 6) -> RenderOutput.

    ``model`` is a FieldModel namespace from FIELD_MODELS; ``masks`` the
    per-step FreeNeRF bundle; ``key`` drives stratified jitter and the
    train-time random white-background flip (None => deterministic eval).

    ``cand_window_bits`` (B, Gb) uint8 — little-endian packed per-window
    coarse-gate hits from the serving count pass (culling.py::
    count_ray_candidates_chord_bits; bit g = coarse probe hit of stride
    window g).  When given, the renderer never touches the full lattice:
    candidate windows come from the bits (masked by the closed-form
    chord), samples re-materialize from the selected indices, and the
    exact gate runs on just the K kept samples.  The probe position
    arithmetic is shared with sample_along_rays bit-for-bit, so the
    window set equals the in-render coarse gate's up to the one
    conservative chord-slack window the count pass already budgets for.
    Requires non-NDC cand-mode budget rendering with an alpha mask and a
    COARSE_STRIDE-multiple budget.
    """
    B = rays.shape[0]
    rays_o, viewdirs = rays[:, :3], rays[:, 3:6]
    near, far = cfg.near_far

    if key is not None:
        k_strat, k_bg = jax.random.split(key)
    else:
        k_strat = k_bg = None

    # Fixed-budget sample compaction — the TPU analog of the reference's
    # boolean compaction (tensorBase.py:360-375): keep the nearest
    # `sample_budget` candidate samples per ray (depth order preserved).
    # Exact whenever the budget covers every candidate (skipped samples
    # have sigma == 0 and each kept sample retains its original lattice
    # spacing, so transmittance is unchanged); `budget_overflow_frac`
    # reports the rays where it doesn't.
    #
    # Candidate selection uses the strided *coarse* occupancy pre-gate
    # (1 gathered row per COARSE_STRIDE samples instead of 1 per sample);
    # the exact gate then runs on just the kept samples, so the final
    # sigma gating matches the unbudgeted path (tensorBase.py:349-354).
    def _compact(xyz, z_vals, dists, keep, K, n_from):
        """Keep the nearest K `keep` samples per ray (depth order), via one
        flat row gather (XLA's batched take_along_axis gather runs ~4x
        slower per row on TPU — scripts/bench_ops.py)."""
        order = jnp.arange(n_from, dtype=jnp.int32)
        score = keep.astype(jnp.int32) * (2 * n_from - order)
        _, sel = jax.lax.top_k(score, K)  # keep-and-near first
        sel = jnp.sort(sel, axis=-1)  # restore depth order
        packed = jnp.concatenate(
            [
                xyz,
                z_vals[..., None],
                dists[..., None],
                keep.astype(xyz.dtype)[..., None],
            ],
            axis=-1,
        ).reshape(B * n_from, 6)
        flat = (
            jnp.arange(B, dtype=jnp.int32)[:, None] * n_from + sel
        ).reshape(-1)
        took = jnp.take(packed, flat, axis=0).reshape(B, K, 6)
        return took[..., :3], took[..., 3], took[..., 4], took[..., 5] > 0.5

    def _compact_grouped(xyz, z_vals, dists, keep, K, n_from):
        """Group-granular variant of _compact: select whole COARSE_STRIDE
        sample windows instead of individual samples.

        The coarse candidate gate is window-constant by construction
        (sample_alpha_gate_coarse probes once per stride window and
        repeats), and `ray_valid` clips at most the two chord-end windows
        — so candidate runs are stride-aligned up to <= 2*(STRIDE-1)
        boundary samples per ray.  Selecting windows shrinks the top-k
        score problem by STRIDE^2 (N/4 keys, K/4 selections — measured
        ~6-10 ms of a mask-era step on v5e) at the cost of <= 6 padding
        samples per ray, which the count functions charge by returning
        group-PADDED counts (budgets therefore still cover every kept
        sample: compaction stays exact, monitored by the same overflow
        statistic, here at group granularity).

        Returns (xyz, z_vals, dists, kept, padded_count) — kept is the
        PER-SAMPLE keep flag gathered alongside, so padding samples stay
        gated off downstream.

        INVARIANT: the window grouping here (index-0-aligned reshape to
        (B, G, COARSE_STRIDE)) must match models/alpha_mask.py::
        group_padded_count, the statistic budgets and serving tiers are
        sized from — if either grouping rule changes, change both.
        """
        S = COARSE_STRIDE
        G = -(-n_from // S)
        tail = G * S - n_from
        keep_p = jnp.pad(keep, ((0, 0), (0, tail)))
        gkeep = keep_p.reshape(B, G, S).any(axis=-1)
        padded_count = S * jnp.sum(gkeep.astype(jnp.int32), axis=-1)
        order = jnp.arange(G, dtype=jnp.int32)
        score = gkeep.astype(jnp.int32) * (2 * G - order)
        _, gsel = jax.lax.top_k(score, K // S)  # keep-and-near first
        gsel = jnp.sort(gsel, axis=-1)  # restore depth order
        sel = (
            gsel[..., None] * S + jnp.arange(S, dtype=jnp.int32)
        ).reshape(B, K)
        packed = jnp.concatenate(
            [
                xyz,
                z_vals[..., None],
                dists[..., None],
                keep.astype(xyz.dtype)[..., None],
            ],
            axis=-1,
        )
        if tail:
            # lattice-tail padding rows carry keep=0 so a selected padded
            # window never contributes a live sample
            packed = jnp.pad(packed, ((0, 0), (0, tail), (0, 0)))
        packed = packed.reshape(B * G * S, 6)
        flat = (
            jnp.arange(B, dtype=jnp.int32)[:, None] * (G * S) + sel
        ).reshape(-1)
        took = jnp.take(packed, flat, axis=0).reshape(B, K, 6)
        return (
            took[..., :3],
            took[..., 3],
            took[..., 4],
            took[..., 5] > 0.5,
            padded_count,
        )

    def _select_windows_g(gkeep, K):
        """Window-granular top-k selection from a WINDOW keep mask
        (B, G) — the core of _select_windows, also fed directly by the
        serving window-bits path (gkeep straight from the count pass).

        Returns (sel (B, K) int32 lattice indices, win_alive (B, K) bool,
        padded_count); K must be a COARSE_STRIDE multiple.

        win_alive rides along the window sort packed into the low bit of
        the sort key (windows are < 2^15, so gsel*2+alive sorts in gsel
        order), avoiding a post-sort re-gather of the top-k values.
        """
        S = COARSE_STRIDE
        G = gkeep.shape[1]
        padded_count = S * jnp.sum(gkeep.astype(jnp.int32), axis=-1)
        order = jnp.arange(G, dtype=jnp.int32)
        score = gkeep.astype(jnp.int32) * (2 * G - order)
        vals, gsel = jax.lax.top_k(score, K // S)  # keep-and-near first
        code = jnp.sort(gsel * 2 + (vals > 0), axis=-1)  # depth order
        gsel = code >> 1
        galive = (code & 1) > 0
        sel = (
            gsel[..., None] * S + jnp.arange(S, dtype=jnp.int32)
        ).reshape(B, K)
        win_alive = jnp.broadcast_to(
            galive[..., None], (B, K // S, S)
        ).reshape(B, K)
        return sel, win_alive, padded_count

    def _select_windows(keep, K, n_from):
        """Window-granular top-k selection WITHOUT the row gather.

        Same window grouping/scoring as _compact_grouped, but returns only
        (sel, win_alive, padded_count) — on the affine non-NDC lattice the
        caller re-derives z/xyz/dists from `sel` bit-exactly (ops/rays.py::
        lattice_z), so the (B, N, 6) pack + (B*K) row gather of
        _compact_grouped (~100 MB/step of pure pack/gather traffic at
        phase-C shapes) disappears; only the top-k remains.
        """
        S = COARSE_STRIDE
        G = -(-n_from // S)
        tail = G * S - n_from
        keep_p = jnp.pad(keep, ((0, 0), (0, tail)))
        gkeep = keep_p.reshape(B, G, S).any(axis=-1)
        return _select_windows_g(gkeep, K)

    def _derive_at(sel, win_alive):
        """Bit-exact re-materialization of (xyz, z_vals, dists, kept) at
        selected lattice indices (see _select_windows).  Only valid on the
        affine non-NDC lattice."""
        t_min, u = sample_lattice(
            rays_o, viewdirs, aabb, near, far, k_strat
        )
        idxf = sel.astype(rays_o.dtype)
        z_sel = lattice_z(t_min, u, idxf, step_size)
        z_next = lattice_z(t_min, u, idxf + 1.0, step_size)
        d_sel = jnp.where(
            sel < n_samples - 1, z_next - z_sel, jnp.zeros_like(z_sel)
        )
        xyz_sel = rays_o[:, None, :] + viewdirs[:, None, :] * (
            z_sel[..., None]
        )
        inb = ~jnp.any((xyz_sel < aabb[0]) | (xyz_sel > aabb[1]), axis=-1)
        # sel < n_samples: the straddling last window's tail indices lie
        # beyond the lattice — the gather path's padding rows carried
        # keep=0 for those, so mask them here too (they can be in-bbox
        # on short chords).
        kept = win_alive & inb & (sel < n_samples)
        return xyz_sel, z_sel, d_sel, kept

    def _compact_derived(cand, K):
        """Window selection + bit-exact re-materialization: returns
        (xyz, z_vals, dists, kept, padded_count) at the K selected lattice
        indices with zero pack/gather traffic."""
        sel, win_alive, pc = _select_windows(cand, K, n_samples)
        xyz_sel, z_sel, d_sel, kept = _derive_at(sel, win_alive)
        return xyz_sel, z_sel, d_sel, kept, pc

    n_eff = n_samples
    overflow_frac = jnp.float32(0.0)
    use_budget = sample_budget is not None and sample_budget < n_samples
    exact_gated = False
    if cand_window_bits is not None:
        if (
            ndc_ray
            or alpha_mask is None
            or sample_budget is None
            or sample_budget > n_samples
            or sample_budget % COARSE_STRIDE != 0
            or budget_mode != "cand"
        ):
            raise ValueError(
                "cand_window_bits requires non-NDC cand-mode budget "
                "rendering with an alpha mask and a COARSE_STRIDE-"
                "multiple budget <= n_samples"
            )
        # Serving window-bits path: the count pass already probed every
        # stride window — candidate selection here is pure arithmetic
        # (closed-form chord + unpack), so the (B, N, 3) lattice, its
        # per-sample in-bbox test, and the coarse probe gathers all
        # disappear from the per-bucket program.  The chord formula is
        # the count pass's own (+2 FP slack), so its window set is a
        # conservative superset of the in-render per-sample validity;
        # extra boundary windows are exact-gated off downstream and the
        # tier (sized from the +1-window-padded count) covers them.
        S = COARSE_STRIDE
        K = sample_budget
        t_minr, t_maxr = aabb_entry_exit(rays_o, viewdirs, aabb)
        t0 = jnp.clip(t_minr, near, far)
        hitb = (t_maxr >= t_minr) & (t_maxr >= t0)
        n_in = jnp.floor((t_maxr - t0) / step_size) + 2.0
        chord = jnp.clip(
            jnp.where(hitb, n_in, 0.0), 0, n_samples
        ).astype(jnp.int32)
        ghits = (
            jnp.unpackbits(cand_window_bits, axis=-1, bitorder="little") > 0
        )  # (B, Gb*8) — trailing pad windows masked below
        starts = jnp.arange(ghits.shape[1], dtype=jnp.int32) * S
        gkeep = (
            ghits
            & hitb[:, None]
            & (starts[None, :] < chord[:, None])
            & (starts[None, :] < n_samples)
        )
        sel, win_alive, pc = _select_windows_g(gkeep, K)
        xyz, z_vals, dists, kept = _derive_at(sel, win_alive)
        ray_valid = kept & (sample_alpha_gate(alpha_mask, xyz) > 0)
        overflow_frac = jnp.mean((pc > K).astype(jnp.float32))
        exact_gated = True
        n_eff = K
        use_budget = False
    elif ndc_ray:
        xyz, z_vals, ray_valid = sample_along_rays_ndc(
            rays_o, viewdirs, aabb, near, far, n_samples, k_strat
        )
        dists = jnp.concatenate(
            [z_vals[:, 1:] - z_vals[:, :-1], jnp.zeros_like(z_vals[:, :1])],
            axis=-1,
        )
        rays_norm = jnp.linalg.norm(viewdirs, axis=-1, keepdims=True)
        dists = dists * rays_norm
        viewdirs = viewdirs / rays_norm
    else:
        xyz, z_vals, ray_valid = sample_along_rays(
            rays_o, viewdirs, aabb, near, far, step_size, n_samples, k_strat
        )
        dists = jnp.concatenate(
            [z_vals[:, 1:] - z_vals[:, :-1], jnp.zeros_like(z_vals[:, :1])],
            axis=-1,
        )
    if use_budget:
        K = sample_budget
        if alpha_mask is not None and not use_coarse_gate:
            # Coarse pre-gate precondition violated (coarse_gate_valid:
            # NDC rays or step > half a mask voxel, ADVICE r2): select
            # candidates with the EXACT gate — one compaction, no second
            # gate pass, never drops an exact-alive sample under budget.
            alive = ray_valid & (sample_alpha_gate(alpha_mask, xyz) > 0)
            overflow_frac = jnp.mean(
                (jnp.sum(alive.astype(jnp.int32), axis=-1) > K).astype(
                    jnp.float32
                )
            )
            xyz, z_vals, dists, ray_valid = _compact(
                xyz, z_vals, dists, alive, K, n_samples
            )
            exact_gated = True
        elif alpha_mask is not None and budget_mode == "cand":
            # Single-stage CANDIDATE budget: K bounds the coarse candidate
            # count per ray (the statistic alive-count stratification
            # partitions the ray store by — per-stratum budgets are
            # stratum candidate maxima, so compaction is exact by
            # construction).  Keep the K nearest candidates, then run the
            # exact gate on just those K rows; vs the two-stage "alive"
            # mode this skips the K+224 intermediate entirely.  The
            # selection runs at stride-window granularity when K allows
            # (the coarse gate is window-constant, see _compact_grouped).
            cand = ray_valid & sample_alpha_gate_coarse(alpha_mask, xyz)
            if K % COARSE_STRIDE == 0 and not ndc_ray \
                    and _DERIVED_COMPACTION:
                # Derived compaction: select windows, then re-materialize
                # z/xyz/dists/valid at the selected indices from the affine
                # lattice — bit-identical to gathering them (identical
                # expressions, same jitter key; dists reproduce the full-
                # lattice z-diff, zero at the lattice end), with no
                # (B, N, 6) pack and no row gather.
                xyz, z_vals, dists, kept, pc = _compact_derived(cand, K)
                over1 = pc > K
            elif K % COARSE_STRIDE == 0:
                xyz, z_vals, dists, kept, pc = _compact_grouped(
                    xyz, z_vals, dists, cand, K, n_samples
                )
                over1 = pc > K
            else:
                over1 = jnp.sum(cand.astype(jnp.int32), axis=-1) > K
                xyz, z_vals, dists, kept = _compact(
                    xyz, z_vals, dists, cand, K, n_samples
                )
            ray_valid = kept & (sample_alpha_gate(alpha_mask, xyz) > 0)
            if alive_budget is not None and alive_budget < K:
                # Exact-alive second stage: the dilated coarse shells keep
                # ~1.3-2x more rows than survive the exact gate, so compact
                # once more to the (measured per-stratum) exact-alive
                # budget — every downstream per-sample gather/scatter
                # (density footprint fwd + bwd, the step's widest rows)
                # then runs at the alive count, not the candidate count.
                # Exact whenever K2 covers each ray's exact-alive set;
                # overflow of either stage reports combined.
                K2 = alive_budget
                over2 = (
                    jnp.sum(ray_valid.astype(jnp.int32), axis=-1) > K2
                )
                xyz, z_vals, dists, ray_valid = _compact(
                    xyz, z_vals, dists, ray_valid, K2, K
                )
                overflow_frac = jnp.mean((over1 | over2).astype(jnp.float32))
                K = K2
            else:
                overflow_frac = jnp.mean(over1.astype(jnp.float32))
            exact_gated = True
        elif alpha_mask is not None:
            # Two-stage compaction: the coarse candidate shells (dilated
            # occupancy) are ~2x thicker than the exact-alive set, so
            # first coarse-compact to K1 cheaply, exact-gate just those K1
            # rows, then compact to the K exact-alive budget — all the
            # expensive per-sample work downstream runs at K, not at the
            # candidate count.  Exact whenever neither stage overflows
            # (reported combined in budget_overflow_frac).
            # candidates exceed exact-alive by roughly the dilated shell
            # thickness per surface crossing — an additive margin, not a
            # multiplicative one (a 2.5x K1 becomes needlessly large once
            # the budget auto-raises)
            K1 = min(n_samples, K + 224)
            cand = ray_valid & sample_alpha_gate_coarse(alpha_mask, xyz)
            over1 = jnp.sum(cand.astype(jnp.int32), axis=-1) > K1
            xyz, z_vals, dists, cand1 = _compact(
                xyz, z_vals, dists, cand, K1, n_samples
            )
            alive = cand1 & (sample_alpha_gate(alpha_mask, xyz) > 0)
            over2 = jnp.sum(alive.astype(jnp.int32), axis=-1) > K
            overflow_frac = jnp.mean((over1 | over2).astype(jnp.float32))
            xyz, z_vals, dists, ray_valid = _compact(
                xyz, z_vals, dists, alive, K, K1
            )
            exact_gated = True
        else:
            # mask-free (prefilter) budget: candidates are the contiguous
            # in-bbox run, so window selection applies here too
            cand = ray_valid
            if K % COARSE_STRIDE == 0 and not ndc_ray \
                    and _DERIVED_COMPACTION:
                xyz, z_vals, dists, ray_valid, pc = _compact_derived(
                    cand, K
                )
                overflow_frac = jnp.mean((pc > K).astype(jnp.float32))
            elif K % COARSE_STRIDE == 0 and not ndc_ray:
                xyz, z_vals, dists, ray_valid, pc = _compact_grouped(
                    xyz, z_vals, dists, cand, K, n_samples
                )
                overflow_frac = jnp.mean((pc > K).astype(jnp.float32))
            else:
                overflow_frac = jnp.mean(
                    (jnp.sum(cand.astype(jnp.int32), axis=-1) > K).astype(
                        jnp.float32
                    )
                )
                xyz, z_vals, dists, ray_valid = _compact(
                    xyz, z_vals, dists, cand, K, n_samples
                )
        n_eff = K

    # Stage-2 cull: alpha-mask occupancy as a gate (tensorBase.py:349-354)
    # — already applied exactly inside the budget compaction above.
    if alpha_mask is not None and not exact_gated:
        ray_valid = ray_valid & (sample_alpha_gate(alpha_mask, xyz) > 0)

    mean_alive = jnp.mean(jnp.sum(ray_valid.astype(jnp.float32), axis=-1))

    xyz_n = normalize_coord(xyz, aabb)  # (B, n_eff, 3)

    if fused:
        if shade_top_k is not None and shade_top_k < n_eff:
            # Split fused path: density-only packed gather over the full
            # lattice, then appearance gathered ONLY for the top-K weights
            # per ray.  In the mask era weights concentrate on surfaces, so
            # this cuts the appearance gather *and its backward scatter* —
            # the step's most expensive rows — by n_eff/K.  Exact whenever
            # K covers every above-threshold sample (tensorBase.py:370);
            # shade_overflow is reported through num_valid_samples.
            den_feat = model.density_feature_fused(
                cfg, params, xyz_n.reshape(-1, 3), masks.den
            )
            sigma = jnp.where(
                ray_valid,
                feature2density(cfg, den_feat.reshape(B, n_eff)),
                0.0,
            )
            _, weight, _ = raw2alpha(sigma, dists * cfg.distance_scale)
            app_gate = weight > cfg.ray_march_weight_thres
            num_valid = jnp.sum(app_gate.astype(jnp.int32))

            K = shade_top_k
            w_sel, idx = jax.lax.top_k(weight, K)
            xyz_sel = jnp.take_along_axis(xyz_n, idx[..., None], axis=1)
            gate_sel = w_sel > cfg.ray_march_weight_thres
            app_feat_sel = model.app_feature_fused(
                cfg, params, xyz_sel.reshape(-1, 3), masks.app
            )
            view_sel = jnp.broadcast_to(viewdirs[:, None, :], (B, K, 3))
            rgb_s = apply_shading(
                cfg,
                params["render"],
                xyz_sel.reshape(-1, 3),
                view_sel.reshape(-1, 3),
                app_feat_sel.reshape(B * K, -1),
                masks,
            ).reshape(B, K, 3)
            rgb_s = jnp.where(gate_sel[..., None], rgb_s, 0.0)
            rgb_map = jnp.sum(w_sel[..., None] * rgb_s, axis=-2)
        else:
            # One packed gather pass for density + appearance, shading
            # everything behind the weight gate.
            den_feat, app_feat = model.fused_features(
                cfg, params, xyz_n.reshape(-1, 3), masks.den, masks.app
            )
            sigma = jnp.where(
                ray_valid,
                feature2density(cfg, den_feat.reshape(B, n_eff)),
                0.0,
            )
            _, weight, _ = raw2alpha(sigma, dists * cfg.distance_scale)
            app_gate = weight > cfg.ray_march_weight_thres
            num_valid = jnp.sum(app_gate.astype(jnp.int32))
            view_full = jnp.broadcast_to(viewdirs[:, None, :], (B, n_eff, 3))
            rgb_s = apply_shading(
                cfg,
                params["render"],
                xyz_n.reshape(-1, 3),
                view_full.reshape(-1, 3),
                app_feat,
                masks,
            ).reshape(B, n_eff, 3)
            rgb_s = jnp.where(app_gate[..., None], rgb_s, 0.0)
            rgb_map = jnp.sum(weight[..., None] * rgb_s, axis=-2)
        return _composite(
            cfg, rgb_map, weight, sigma, z_vals, rays, k_bg, num_valid,
            is_train=is_train, white_bg=white_bg,
            budget_overflow_frac=overflow_frac, mean_alive_samples=mean_alive,
        )

    n_samples = n_eff
    feat = model.density_feature(
        cfg, params, xyz_n.reshape(-1, 3), masks.den
    ).reshape(B, n_samples)
    sigma = jnp.where(ray_valid, feature2density(cfg, feat), 0.0)

    _, weight, _ = raw2alpha(sigma, dists * cfg.distance_scale)

    # Stage-3 cull: shade only where the compositing weight matters
    # (tensorBase.py:370-375).
    app_gate = weight > cfg.ray_march_weight_thres
    num_valid = jnp.sum(app_gate.astype(jnp.int32))

    if shade_top_k is not None and shade_top_k < n_samples:
        K = shade_top_k
        w_sel, idx = jax.lax.top_k(weight, K)  # (B, K)
        xyz_sel = jnp.take_along_axis(xyz_n, idx[..., None], axis=1)
        gate_sel = w_sel > cfg.ray_march_weight_thres
        view_sel = jnp.broadcast_to(viewdirs[:, None, :], (B, K, 3))
        app_feat = model.app_feature(
            cfg, params, xyz_sel.reshape(-1, 3), masks.app
        )
        rgb_s = apply_shading(
            cfg,
            params["render"],
            xyz_sel.reshape(-1, 3),
            view_sel.reshape(-1, 3),
            app_feat,
            masks,
        ).reshape(B, K, 3)
        rgb_s = jnp.where(gate_sel[..., None], rgb_s, 0.0)
        rgb_map = jnp.sum(w_sel[..., None] * rgb_s, axis=-2)
    else:
        view_full = jnp.broadcast_to(viewdirs[:, None, :], (B, n_samples, 3))
        app_feat = model.app_feature(
            cfg, params, xyz_n.reshape(-1, 3), masks.app
        )
        rgb_s = apply_shading(
            cfg,
            params["render"],
            xyz_n.reshape(-1, 3),
            view_full.reshape(-1, 3),
            app_feat,
            masks,
        ).reshape(B, n_samples, 3)
        rgb_s = jnp.where(app_gate[..., None], rgb_s, 0.0)
        rgb_map = jnp.sum(weight[..., None] * rgb_s, axis=-2)

    return _composite(
        cfg, rgb_map, weight, sigma, z_vals, rays, k_bg, num_valid,
        is_train=is_train, white_bg=white_bg,
        budget_overflow_frac=overflow_frac, mean_alive_samples=mean_alive,
    )


def _composite(
    cfg, rgb_map, weight, sigma, z_vals, rays, k_bg, num_valid, *,
    is_train: bool, white_bg: bool,
    budget_overflow_frac=0.0,
    mean_alive_samples=0.0,
) -> RenderOutput:
    acc = jnp.sum(weight, axis=-1)

    # White background; at train time a random 50% flip when the dataset
    # background is not white (tensorBase.py:380).
    if white_bg:
        rgb_map = rgb_map + (1.0 - acc[..., None])
    elif is_train and k_bg is not None:
        flip = (jax.random.uniform(k_bg, ()) < 0.5).astype(rgb_map.dtype)
        rgb_map = rgb_map + flip * (1.0 - acc[..., None])

    rgb_map = jnp.clip(rgb_map, 0.0, 1.0)

    depth = jax.lax.stop_gradient(
        jnp.sum(weight * z_vals, axis=-1) + (1.0 - acc) * rays[:, -1]
    )

    return RenderOutput(
        rgb=rgb_map,
        depth=depth,
        acc=acc,
        weights=weight,
        sigma=sigma,
        z_vals=z_vals,
        num_valid_samples=num_valid,
        budget_overflow_frac=budget_overflow_frac,
        mean_alive_samples=mean_alive_samples,
    )
