"""Round-3 alive-count stratification: exactness of the candidate-budget
("cand") compaction mode, quota allocation, the stratified sampler, the
stratified train step, and the stratified serving renderer.

The contract under test: stratification is a pure scheduling optimization —
per-sample math must equal the unbudgeted fixed-shape render whenever each
bucket's budget covers its members' candidate counts (the reference's
dynamic boolean compaction guarantee, tensorBase.py:360-375, achieved with
static shapes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorf_tpu.models import FIELD_MODELS, ModelConfig
from tensorf_tpu.models.alpha_mask import (
    AlphaGridMask,
    coarse_gate_valid,
    with_dilation,
)
from tensorf_tpu.ops.freq_mask import FreeMasks
from tensorf_tpu.render.chunked import (
    make_render_fn,
    render_chunked,
    render_chunked_stratified,
)
from tensorf_tpu.render.culling import count_ray_candidates, stratify_rays
from tensorf_tpu.render.volume import render_rays
from tensorf_tpu.train.sampler import StratifiedSampler, allocate_quotas

CFG = ModelConfig(
    model_name="TensorVMSplit",
    density_n_comp=(4, 4, 4),
    app_n_comp=(6, 6, 6),
    app_dim=9,
    shading_mode="MLP_Fea",
    pos_pe=2,
    view_pe=2,
    fea_pe=2,
    feature_c=32,
    density_shift=-3.0,
)
GRID = (12, 12, 12)
AABB = jnp.asarray([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]])
STEP = 0.05
NS = 128


def _rays(rng, n):
    o = rng.normal(size=(n, 3))
    o = 4.0 * o / np.linalg.norm(o, axis=-1, keepdims=True)
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    return np.concatenate([o, d], -1).astype(np.float32)


@pytest.fixture(scope="module")
def setup():
    model = FIELD_MODELS[CFG.model_name]
    params = model.init(jax.random.PRNGKey(0), CFG, GRID)
    # half-occupied mask -> a real mix of candidate counts across rays
    rng = np.random.default_rng(7)
    vol = (rng.uniform(size=(10, 10, 10)) < 0.35).astype(np.float32)
    mask = with_dilation(AlphaGridMask(aabb=AABB, volume=jnp.asarray(vol)))
    return model, params, mask


def test_cand_budget_mode_exact_when_budget_covers_counts(setup, rng):
    """cand-mode compaction at budget >= per-ray candidate count must equal
    the unbudgeted masked render bit-for-bit (same gates, same samples)."""
    model, params, mask = setup
    rays = _rays(rng, 64)
    counts = count_ray_candidates(
        rays, mask, np.asarray(AABB), STEP, (2.0, 6.0), n_samples=NS
    )
    budget = int(max(32, -(-int(counts.max()) // 32) * 32))
    assert budget < NS, "test needs head-room between budget and lattice"

    kw = dict(
        aabb=AABB, step_size=STEP, n_samples=NS,
        is_train=False, white_bg=True, ndc_ray=False,
    )
    full = render_rays(
        model, CFG, params, mask, jnp.asarray(rays), None, FreeMasks(), **kw
    )
    strat = render_rays(
        model, CFG, params, mask, jnp.asarray(rays), None, FreeMasks(),
        sample_budget=budget, budget_mode="cand", **kw
    )
    assert float(strat.budget_overflow_frac) == 0.0
    np.testing.assert_allclose(
        np.asarray(strat.rgb), np.asarray(full.rgb), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(strat.depth), np.asarray(full.depth), rtol=1e-4, atol=1e-4
    )
    # and the overflow monitor actually fires when the budget is too small
    tiny = render_rays(
        model, CFG, params, mask, jnp.asarray(rays), None, FreeMasks(),
        sample_budget=32, budget_mode="cand", **kw
    )
    if int(counts.max()) > 32:
        assert float(tiny.budget_overflow_frac) > 0.0


def test_alive_second_stage_exact_when_budget_covers_counts(setup, rng):
    """cand-mode + exact-alive stage-2 compaction at alive_budget >= each
    ray's exact-alive count must equal the unbudgeted masked render; a too
    small stage-2 budget must trip the overflow monitor."""
    from tensorf_tpu.render.culling import count_ray_candidates_and_alive

    model, params, mask = setup
    rays = _rays(rng, 64)
    cand, alive, _ = count_ray_candidates_and_alive(
        rays, mask, np.asarray(AABB), STEP, (2.0, 6.0), n_samples=NS
    )
    budget = int(max(32, -(-int(cand.max()) // 32) * 32))
    alive_budget = int(max(32, -(-int(alive.max()) // 32) * 32))
    assert budget < NS and alive_budget <= budget
    # make the stage-2 compaction non-trivial when the geometry allows
    kw = dict(
        aabb=AABB, step_size=STEP, n_samples=NS,
        is_train=False, white_bg=True, ndc_ray=False,
    )
    full = render_rays(
        model, CFG, params, mask, jnp.asarray(rays), None, FreeMasks(), **kw
    )
    two = render_rays(
        model, CFG, params, mask, jnp.asarray(rays), None, FreeMasks(),
        sample_budget=budget, budget_mode="cand",
        alive_budget=alive_budget, **kw
    )
    assert float(two.budget_overflow_frac) == 0.0
    np.testing.assert_allclose(
        np.asarray(two.rgb), np.asarray(full.rgb), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(two.depth), np.asarray(full.depth), rtol=1e-4, atol=1e-4
    )
    if int(alive.max()) > 32:
        tiny = render_rays(
            model, CFG, params, mask, jnp.asarray(rays), None, FreeMasks(),
            sample_budget=budget, budget_mode="cand", alive_budget=32, **kw
        )
        assert float(tiny.budget_overflow_frac) > 0.0


def test_stratified_step_with_alive_budgets_finite(setup, rng):
    """The from-store stratified step accepts per-stratum alive budgets and
    reports zero overflow when they cover the drawn rays' alive counts."""
    from tensorf_tpu.render.culling import (
        _budget_hint,
        count_ray_candidates_and_alive,
    )
    from tensorf_tpu.train.losses import LossWeights
    from tensorf_tpu.train.optim import make_optimizer
    from tensorf_tpu.train.step import TrainStatics, make_train_step

    model, params, mask = setup
    store = _rays(np.random.default_rng(5), 256)
    rgbs = np.random.default_rng(6).uniform(size=(256, 3)).astype(np.float32)
    cand, alive, _ = count_ray_candidates_and_alive(
        store, mask, np.asarray(AABB), STEP, (2.0, 6.0), n_samples=NS
    )
    strata, budgets = stratify_rays(cand, quantiles=(0.5,))
    budgets = [b if b < NS else None for b in budgets]
    alive_budgets = []
    for sel, b in zip(strata, budgets):
        hint = _budget_hint(alive[sel].max())
        alive_budgets.append(hint if (b is not None and hint < b) else None)
    d = np.random.default_rng(8)
    ids = tuple(
        np.asarray(s[d.integers(0, s.size, size=16)], np.int32)
        for s in strata
    )
    optimizer, opt_state = make_optimizer(params, 0.02, 1e-3, 0.999)
    fn = make_train_step(
        model, CFG, TrainStatics(
            n_samples=NS, step_size=STEP, white_bg=True, ndc_ray=False,
            total_steps=100, lr_factor=0.999,
            weights=LossWeights(l1=8e-5),
            from_store=True, strata_budgets=tuple(budgets),
            strata_alive_budgets=tuple(alive_budgets),
        ), optimizer,
    )
    p1, _, m = fn(
        jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy, opt_state),
        mask, AABB, jnp.asarray(store), jnp.asarray(rgbs),
        tuple(jnp.asarray(i) for i in ids),
        jnp.asarray(0, jnp.int32), jax.random.PRNGKey(0),
    )
    assert np.isfinite(float(m["total_loss"]))
    # deterministic-count slack (+8, pad 32) absorbs the train-time jitter
    # here; the monitor must stay quiet
    assert float(m["budget_overflow_frac"]) == 0.0


def test_exact_gate_fallback_matches_unbudgeted(setup, rng):
    """use_coarse_gate=False (NDC / coarse-step configs, ADVICE r2) selects
    candidates with the exact gate; result must still match unbudgeted."""
    model, params, mask = setup
    rays = _rays(rng, 48)
    kw = dict(
        aabb=AABB, step_size=STEP, n_samples=NS,
        is_train=False, white_bg=True, ndc_ray=False,
    )
    full = render_rays(
        model, CFG, params, mask, jnp.asarray(rays), None, FreeMasks(), **kw
    )
    # exact-alive counts are <= coarse candidate counts, so the coarse
    # budget bound works here too
    counts = count_ray_candidates(
        rays, mask, np.asarray(AABB), STEP, (2.0, 6.0), n_samples=NS,
        use_coarse=False,
    )
    budget = int(max(32, -(-int(counts.max()) // 32) * 32))
    out = render_rays(
        model, CFG, params, mask, jnp.asarray(rays), None, FreeMasks(),
        sample_budget=budget, use_coarse_gate=False, **kw
    )
    assert float(out.budget_overflow_frac) == 0.0
    np.testing.assert_allclose(
        np.asarray(out.rgb), np.asarray(full.rgb), rtol=1e-5, atol=1e-5
    )


def test_coarse_gate_valid_conditions():
    vol = jnp.zeros((9, 9, 9), jnp.float32)
    mask = AlphaGridMask(aabb=AABB, volume=vol)  # voxel = 3/8 = 0.375
    assert coarse_gate_valid(None, 1.0, False)
    assert not coarse_gate_valid(mask, 0.05, True)  # NDC breaks it
    assert coarse_gate_valid(mask, 0.18, False)  # step <= voxel/2
    assert not coarse_gate_valid(mask, 0.25, False)  # step > voxel/2


def test_allocate_quotas_proportional_and_aligned():
    sizes = [5000, 3000, 1500, 500]
    quotas = allocate_quotas(sizes, 1024, round_to=8)
    assert sum(quotas) == 1024
    assert all(q % 8 == 0 and q >= 8 for q in quotas)
    # proportionality within rounding: quota/batch tracks size/total
    for q, s in zip(quotas, sizes):
        assert abs(q / 1024 - s / 10000) < 0.02
    # a tiny stratum still gets its minimum
    quotas = allocate_quotas([10000, 8], 512, round_to=8)
    assert quotas[1] == 8 and sum(quotas) == 512


def test_stratify_rays_budgets_cover_members(rng):
    counts = np.concatenate([
        np.zeros(700, np.int64),
        rng.integers(1, 60, 200),
        rng.integers(60, 400, 100),
    ])
    strata, budgets = stratify_rays(counts, quantiles=(0.5, 0.8, 0.95))
    got = np.concatenate(strata)
    assert np.sort(got).tolist() == list(range(counts.size))  # a partition
    for sel, b in zip(strata, budgets):
        assert counts[sel].max() <= b  # budget covers every member
        assert b % 32 == 0
    # slivers are merged away
    assert all(s.size >= max(1, int(0.01 * counts.size)) for s in strata)


def test_stratify_rays_joint_budgets_cover_both_counts(rng):
    """Alive-primary joint strata: a partition, alive budgets tight on the
    stratum's alive max, candidate budgets covering the stratum's candidate
    max (both stages exact by construction)."""
    from tensorf_tpu.render.culling import stratify_rays_joint

    alive = np.concatenate([
        np.zeros(600, np.int64),
        rng.integers(1, 50, 250),
        rng.integers(50, 300, 150),
    ])
    # candidates exceed alive by a variable dilated-shell margin
    cand = alive + rng.integers(0, 120, alive.size)
    strata, cand_budgets, alive_budgets = stratify_rays_joint(
        cand, alive, quantiles=(0.5, 0.8, 0.95)
    )
    got = np.concatenate(strata)
    assert np.sort(got).tolist() == list(range(alive.size))  # a partition
    for sel, cb, ab in zip(strata, cand_budgets, alive_budgets):
        assert cand[sel].max() <= cb and cb % 32 == 0
        if ab is not None:
            assert alive[sel].max() <= ab < cb and ab % 32 == 0
    # the joint partition's stage-2 economy: expected alive budget sits at
    # or below the single-statistic candidate partition's expected budget
    c_strata, c_budgets = stratify_rays(cand, quantiles=(0.5, 0.8, 0.95))
    e_joint = sum(
        (ab if ab is not None else cb) * s.size
        for s, cb, ab in zip(strata, cand_budgets, alive_budgets)
    )
    e_cand = sum(b * s.size for s, b in zip(c_strata, c_budgets))
    assert e_joint <= e_cand


def test_joint_strata_render_exact(setup, rng):
    """Rendering each joint stratum at its (cand, alive) budgets equals the
    unbudgeted masked render on that stratum."""
    from tensorf_tpu.render.culling import (
        count_ray_candidates_and_alive,
        stratify_rays_joint,
    )

    model, params, mask = setup
    rays = _rays(rng, 128)
    cand, alive, _ = count_ray_candidates_and_alive(
        rays, mask, np.asarray(AABB), STEP, (2.0, 6.0), n_samples=NS
    )
    strata, cand_budgets, alive_budgets = stratify_rays_joint(
        cand, alive, quantiles=(0.5,)
    )
    kw = dict(
        aabb=AABB, step_size=STEP, n_samples=NS,
        is_train=False, white_bg=True, ndc_ray=False,
    )
    for sel, cb, ab in zip(strata, cand_budgets, alive_budgets):
        sub = jnp.asarray(rays[sel])
        full = render_rays(
            model, CFG, params, mask, sub, None, FreeMasks(), **kw
        )
        out = render_rays(
            model, CFG, params, mask, sub, None, FreeMasks(),
            sample_budget=(cb if cb < NS else None), budget_mode="cand",
            alive_budget=ab, **kw
        )
        assert float(out.budget_overflow_frac) == 0.0
        np.testing.assert_allclose(
            np.asarray(out.rgb), np.asarray(full.rgb), rtol=1e-5, atol=1e-5
        )


def test_inbbox_strata_render_exact(setup, rng):
    """Mask-free (prefilter-phase) stratification: rendering each in-bbox
    stratum at its chord-count budget equals the unbudgeted render — the
    phase-A analog of the candidate-budget exactness contract."""
    from tensorf_tpu.render.culling import count_ray_inbbox

    model, params, _ = setup
    rays = _rays(rng, 128)
    counts = count_ray_inbbox(
        rays, np.asarray(AABB), STEP, (2.0, 6.0), n_samples=NS
    )
    assert counts.max() > counts.min(), "need count spread for strata"
    strata, budgets = stratify_rays(counts, quantiles=(0.5,))
    kw = dict(
        aabb=AABB, step_size=STEP, n_samples=NS,
        is_train=False, white_bg=True, ndc_ray=False,
    )
    for sel, b in zip(strata, budgets):
        assert counts[sel].max() <= b
        sub = jnp.asarray(rays[sel])
        full = render_rays(
            model, CFG, params, None, sub, None, FreeMasks(), **kw
        )
        out = render_rays(
            model, CFG, params, None, sub, None, FreeMasks(),
            sample_budget=(b if b < NS else None), budget_mode="cand", **kw
        )
        assert float(out.budget_overflow_frac) == 0.0
        np.testing.assert_allclose(
            np.asarray(out.rgb), np.asarray(full.rgb), rtol=1e-5, atol=1e-5
        )
        # chord-capped lattice with NO budget: samples start at the bbox
        # entry, so rendering on an n_samples=b lattice keeps every
        # in-bbox sample — the compaction-free phase-A production path
        capped = render_rays(
            model, CFG, params, None, sub, None, FreeMasks(),
            **{**kw, "n_samples": min(b, NS)},
        )
        np.testing.assert_allclose(
            np.asarray(capped.rgb), np.asarray(full.rgb),
            rtol=1e-5, atol=1e-5,
        )


def test_count_ray_inbbox_matches_render_valid(rng):
    """count_ray_inbbox equals the group-PADDED per-ray valid-sample count
    (the statistic the window-granular compaction pays), up to one stride
    window of FP boundary jitter a different batch shape can introduce for
    samples landing exactly on a bbox face (_budget_hint's +8 slack exists
    for exactly this)."""
    from tensorf_tpu.models.alpha_mask import COARSE_STRIDE
    from tensorf_tpu.ops.rays import sample_along_rays
    from tensorf_tpu.render.culling import count_ray_inbbox

    rays = _rays(rng, 96)
    counts = count_ray_inbbox(
        rays, np.asarray(AABB), STEP, (2.0, 6.0), n_samples=NS, chunk=40
    )
    r = jnp.asarray(rays)
    _, _, valid = sample_along_rays(
        r[:, :3], r[:, 3:6], AABB, 2.0, 6.0, STEP, NS, None
    )
    from tensorf_tpu.models.alpha_mask import group_padded_count

    S = COARSE_STRIDE
    direct = np.asarray(group_padded_count(valid))
    assert np.abs(counts - direct).max() <= S
    # padded counts bound the raw counts from above
    raw = np.asarray(jnp.sum(valid.astype(jnp.int32), axis=-1))
    assert (counts + 1 >= raw).all()


def test_stratified_sampler_draws_from_own_stratum():
    strata = [np.arange(0, 100), np.arange(100, 160), np.arange(160, 200)]
    quotas = [16, 8, 8]
    s = StratifiedSampler(strata, quotas, seed=3)
    for _ in range(30):
        ids = s.nextids()
        assert tuple(len(i) for i in ids) == (16, 8, 8)
        assert (ids[0] < 100).all()
        assert ((ids[1] >= 100) & (ids[1] < 160)).all()
        assert ((ids[2] >= 160) & (ids[2] < 200)).all()


def test_stratified_train_step_matches_plain_loss(setup, rng):
    """One stratified from-store step must produce the same loss and
    gradient step as the plain step on the concatenated batch, when
    budgets are exact (quota-weighted scalar losses == concat-batch mean)."""
    from tensorf_tpu.train.losses import LossWeights
    from tensorf_tpu.train.optim import make_optimizer
    from tensorf_tpu.train.step import TrainStatics, make_train_step

    model, params, mask = setup
    store = _rays(np.random.default_rng(5), 256)
    rgbs = np.random.default_rng(6).uniform(size=(256, 3)).astype(np.float32)
    counts = count_ray_candidates(
        store, mask, np.asarray(AABB), STEP, (2.0, 6.0), n_samples=NS
    )
    strata, budgets = stratify_rays(counts, quantiles=(0.5,))
    budgets = [b if b < NS else None for b in budgets]
    # one fixed draw per stratum
    d = np.random.default_rng(8)
    ids = tuple(
        np.asarray(s[d.integers(0, s.size, size=16)], np.int32)
        for s in strata
    )

    common = dict(
        n_samples=NS, step_size=STEP, white_bg=True, ndc_ray=False,
        total_steps=100, lr_factor=0.999,
        weights=LossWeights(l1=8e-5, tv_density=0.01, tv_app=0.01),
    )
    optimizer, opt_state = make_optimizer(params, 0.02, 1e-3, 0.999)

    strat_fn = make_train_step(
        model, CFG, TrainStatics(
            from_store=True, strata_budgets=tuple(budgets), **common
        ), optimizer,
    )
    p1, _, m1 = strat_fn(
        jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy, opt_state),
        mask, AABB, jnp.asarray(store), jnp.asarray(rgbs),
        tuple(jnp.asarray(i) for i in ids),
        jnp.asarray(0, jnp.int32), jax.random.PRNGKey(0),
    )
    assert float(m1["budget_overflow_frac"]) == 0.0

    # plain step on the SAME rays; is_train randomness (stratified jitter,
    # bg flip) differs per sub-batch key, so compare on the loss scale with
    # a deterministic scene: use the white_bg=True path (no bg flip) and
    # check mse agreement to the jitter tolerance via eval-mode renders
    # instead for the strict check below.
    plain_fn = make_train_step(
        model, CFG, TrainStatics(from_store=True, **common), optimizer
    )
    cat = np.concatenate(ids)
    p2, _, m2 = plain_fn(
        jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy, opt_state),
        mask, AABB, jnp.asarray(store), jnp.asarray(rgbs),
        jnp.asarray(cat, np.int32),
        jnp.asarray(0, jnp.int32), jax.random.PRNGKey(0),
    )
    # same rays, same model: losses agree to stratified-jitter noise
    assert abs(float(m1["mse"]) - float(m2["mse"])) < 2e-2
    assert np.isfinite(float(m1["total_loss"]))
    # regularizer terms are batch-independent -> exactly equal
    np.testing.assert_allclose(
        float(m1["reg_l1"]), float(m2["reg_l1"]), rtol=1e-6
    )


def test_probe_only_counts_match_full_lattice(setup, rng):
    """The probe-only serving count pass (closed-form chord + direct probe
    positions) must reproduce the full-lattice computation up to the one
    stride window / one sample of FP boundary slack its consumers carry."""
    from tensorf_tpu.models.alpha_mask import (
        COARSE_STRIDE,
        group_padded_count,
        sample_alpha_gate_coarse,
    )
    from tensorf_tpu.ops.rays import sample_along_rays
    from tensorf_tpu.render.culling import count_ray_candidates_and_chord

    model, params, mask = setup
    rays = _rays(rng, 256)
    cand, chord = count_ray_candidates_and_chord(
        rays, mask, np.asarray(AABB), STEP, (2.0, 6.0), n_samples=NS
    )
    r = jnp.asarray(rays)
    xyz, _, valid = sample_along_rays(
        r[:, :3], r[:, 3:6], AABB, 2.0, 6.0, STEP, NS, None
    )
    full_cand = np.asarray(
        group_padded_count(valid & sample_alpha_gate_coarse(mask, xyz))
    )
    full_chord = np.asarray(jnp.sum(valid.astype(jnp.int32), axis=-1))
    # conservative by construction: the probe-only pass must never
    # under-report what the renderer pays (tiers/lattices/zero-skip are
    # sized directly from it), and over-reports by at most the built-in
    # +1-window / +1-sample FP slack
    assert (np.minimum(cand, NS) >= full_cand).all()
    assert (cand <= full_cand + 2 * COARSE_STRIDE).all()
    assert (chord >= full_chord).all()
    assert (chord <= full_chord + 2).all()
    # zero-skip soundness: reported zero must imply render-side zero
    assert (full_cand[cand == 0] == 0).all()


def test_stratified_chord_cap_exact(setup, rng):
    """Chord-capped bucket lattices: with n_samples far above the longest
    bbox chord, the stratified driver renders buckets on a smaller capped
    lattice — must still equal the full-lattice uniform render bit-for-bit
    (samples start at the bbox entry, so indices >= chord are invalid)."""
    model, params, mask = setup
    rays = _rays(rng, 200)
    NS_BIG = 256  # scene diag / STEP ~= 104 samples -> cap engages at 128
    fn = make_render_fn(
        model, CFG, step_size=STEP, n_samples=NS_BIG, white_bg=True,
        ndc_ray=False,
    )
    rgb_u, depth_u, _, _ = render_chunked(
        fn, params, mask, rays, AABB, chunk=128
    )
    rgb_s, depth_s, _, overflow = render_chunked_stratified(
        model, CFG, params, mask, rays, AABB,
        step_size=STEP, n_samples=NS_BIG, white_bg=True, ndc_ray=False,
        chunk=128,
    )
    assert overflow == 0.0
    np.testing.assert_allclose(rgb_s, rgb_u, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(depth_s, depth_u, rtol=1e-4, atol=1e-4)


def test_render_chunked_stratified_matches_uniform(setup, rng):
    """The serving-side stratified renderer must reproduce the uniform
    chunked renderer exactly (deterministic eval, per-tier budgets cover
    counts by construction)."""
    model, params, mask = setup
    rays = _rays(rng, 300)
    # include rays that miss the scene entirely (zero candidates): the
    # stratified driver composites those to background on host — the
    # measured-majority fast path of a serving frame
    miss = _rays(rng, 40)
    miss[:, 3:6] = -miss[:, 3:6]  # point away from the scene
    rays = np.concatenate([rays, miss], axis=0)
    from tensorf_tpu.render.culling import count_ray_candidates

    counts = count_ray_candidates(
        rays, mask, np.asarray(AABB), STEP, (2.0, 6.0), n_samples=NS
    )
    assert (counts == 0).any(), "test needs zero-candidate rays"
    fn = make_render_fn(
        model, CFG, step_size=STEP, n_samples=NS, white_bg=True,
        ndc_ray=False,
    )
    rgb_u, depth_u, _, _ = render_chunked(
        fn, params, mask, rays, AABB, chunk=128
    )
    rgb_s, depth_s, _, overflow = render_chunked_stratified(
        model, CFG, params, mask, rays, AABB,
        step_size=STEP, n_samples=NS, white_bg=True, ndc_ray=False,
        chunk=128,
    )
    assert overflow == 0.0
    np.testing.assert_allclose(rgb_s, rgb_u, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(depth_s, depth_u, rtol=1e-4, atol=1e-4)


def test_allocate_quotas_clamped_to_stratum_size():
    """ADVICE r3: a quota must not exceed its stratum's (rounded) size —
    the residual redistributes to strata with headroom; if the batch
    exceeds total capacity, the largest stratum absorbs the rest (the
    sampler tiles permutations, preserving the compiled sub-batch shape)."""
    # advisor's example: residual previously overflowed the largest stratum
    quotas = allocate_quotas([900, 100], 1000, round_to=8)
    assert sum(quotas) == 1000
    assert all(q % 8 == 0 for q in quotas)
    # capacity (896 + 96) < batch: the overflow lands on the largest
    assert quotas[0] >= 896 and quotas[1] <= 96
    # a case with headroom: no stratum exceeds its rounded size
    quotas = allocate_quotas([512, 512, 64], 512, round_to=8)
    assert sum(quotas) == 512
    for q, s in zip(quotas, [512, 512, 64]):
        assert q <= max(8, s // 8 * 8)


def test_simple_sampler_tiles_tiny_store():
    """A stratum smaller than its quota oversamples by tiling fresh
    permutations — the id array shape stays fixed (no retrace)."""
    from tensorf_tpu.train.sampler import SimpleSampler

    s = SimpleSampler(5, 16, seed=0)
    for _ in range(3):
        ids = s.nextids()
        assert ids.shape == (16,)
        assert set(ids.tolist()) == set(range(5))  # covers the store


def test_multinomial_shares_distribution():
    """_multinomial_shares: non-negative, sums to 1, correct mean, and the
    variance of a multinomial composition (noise-matched stratification)."""
    import jax
    import jax.numpy as jnp

    from tensorf_tpu.train.step import _multinomial_shares

    probs = (0.55, 0.3, 0.1, 0.05)
    n = 2048.0
    draws = np.stack([
        np.asarray(jnp.stack(
            _multinomial_shares(jax.random.PRNGKey(k), n, probs)
        ))
        for k in range(200)
    ])
    assert (draws >= 0).all()
    np.testing.assert_allclose(draws.sum(1), 1.0, atol=1e-6)
    # counts are integers/n
    np.testing.assert_allclose(draws * n, np.round(draws * n), atol=1e-3)
    p = np.asarray(probs)
    np.testing.assert_allclose(draws.mean(0), p, atol=0.01)
    # multinomial share variance p(1-p)/n, loose CI at 200 draws
    np.testing.assert_allclose(
        draws.var(0), p * (1 - p) / n, rtol=0.35
    )


def test_noise_matched_step_unbiased_and_varying(setup, rng):
    """strata_noise_match: per-key loss weights vary (composition noise)
    while the average over keys matches the fixed-weight loss."""
    from tensorf_tpu.train.losses import LossWeights
    from tensorf_tpu.train.optim import make_optimizer
    from tensorf_tpu.train.step import TrainStatics, make_train_step

    model, params, mask = setup
    store = _rays(np.random.default_rng(5), 256)
    rgbs = np.random.default_rng(6).uniform(size=(256, 3)).astype(np.float32)
    counts = count_ray_candidates(
        store, mask, np.asarray(AABB), STEP, (2.0, 6.0), n_samples=NS
    )
    strata, budgets = stratify_rays(counts, quantiles=(0.5,))
    budgets = [b if b < NS else None for b in budgets]
    d = np.random.default_rng(8)
    ids = tuple(
        np.asarray(s[d.integers(0, s.size, size=16)], np.int32)
        for s in strata
    )
    shares = tuple(s.size / float(counts.size) for s in strata)

    common = dict(
        n_samples=NS, step_size=STEP, white_bg=True, ndc_ray=False,
        total_steps=100, lr_factor=0.999, weights=LossWeights(),
        from_store=True, strata_budgets=tuple(budgets),
        strata_loss_weights=shares,
    )
    optimizer, opt_state = make_optimizer(params, 0.02, 1e-3, 0.999)
    fixed_fn = make_train_step(
        model, CFG, TrainStatics(**common), optimizer
    )
    match_fn = make_train_step(
        model, CFG, TrainStatics(strata_noise_match=True, **common),
        optimizer,
    )

    def mse_of(fn, k):
        _, _, m = fn(
            jax.tree.map(jnp.copy, params),
            jax.tree.map(jnp.copy, opt_state),
            mask, AABB, jnp.asarray(store), jnp.asarray(rgbs),
            tuple(jnp.asarray(i) for i in ids),
            jnp.asarray(0, jnp.int32), jax.random.PRNGKey(k),
        )
        return float(m["mse"])

    ref = mse_of(fixed_fn, 0)
    vals = np.asarray([mse_of(match_fn, k) for k in range(40)])
    assert np.std(vals) > 0  # composition noise present
    # per-stratum render is key-jittered too, so compare means loosely
    assert abs(np.mean(vals) - ref) < 0.15 * abs(ref) + 1e-4


def test_derived_compaction_equals_gathered(setup, rng):
    """Round-5: the derived grouped compaction (re-materialize z/xyz/dists
    from selected lattice indices, volume.py::_select_windows) must equal
    the gather-based _compact_grouped bit-for-bit — train mode (jittered
    lattice) and eval mode, all RenderOutput fields."""
    import tensorf_tpu.render.volume as volume_mod

    model, params, mask = setup
    rays = jnp.asarray(_rays(rng, 64))
    kw = dict(
        aabb=AABB, step_size=STEP, n_samples=NS,
        white_bg=True, ndc_ray=False,
        sample_budget=64, budget_mode="cand",
    )
    for is_train, key, m in [
        (False, None, mask),
        (True, jax.random.PRNGKey(3), mask),
        (True, jax.random.PRNGKey(5), None),  # mask-free prefilter branch
    ]:
        outs = []
        for flag in (True, False):
            old = volume_mod._DERIVED_COMPACTION
            volume_mod._DERIVED_COMPACTION = flag
            try:
                outs.append(render_rays(
                    model, CFG, params, m, rays, key, FreeMasks(),
                    is_train=is_train, **kw
                ))
            finally:
                volume_mod._DERIVED_COMPACTION = old
        a, b = outs
        for name in RenderOutputFields:
            va, vb = getattr(a, name), getattr(b, name)
            np.testing.assert_array_equal(
                np.asarray(va), np.asarray(vb),
                err_msg=f"{name} differs (is_train={is_train})",
            )


RenderOutputFields = (
    "rgb", "depth", "acc", "weights", "sigma", "z_vals",
    "num_valid_samples", "budget_overflow_frac", "mean_alive_samples",
)
