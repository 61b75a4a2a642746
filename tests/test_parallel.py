"""Multi-device tests on the virtual 8-device CPU mesh: sharded train step,
replication, and the driver entry contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorf_tpu.parallel.mesh import (
    make_mesh,
    pad_to_multiple,
    replicate,
    shard_rays,
)


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_pad_to_multiple():
    arr = np.arange(10 * 3, dtype=np.float32).reshape(10, 3)
    padded, n = pad_to_multiple(arr, 8)
    assert padded.shape == (16, 3)
    assert n == 10
    np.testing.assert_array_equal(padded[:10], arr)


def test_sharded_train_step_matches_single_device(rng):
    """Ray-batch DP: same math, sharded over 8 devices."""
    from tensorf_tpu.models import FIELD_MODELS, ModelConfig
    from tensorf_tpu.train import (
        LossWeights,
        TrainStatics,
        make_optimizer,
        make_train_step,
    )

    cfg = ModelConfig(
        model_name="TensorVMSplit",
        density_n_comp=(2, 2, 2),
        app_n_comp=(2, 2, 2),
        app_dim=6,
        shading_mode="MLP_Fea",
        pos_pe=2,
        view_pe=2,
        fea_pe=2,
        feature_c=16,
        density_shift=-3.0,
    )
    model = FIELD_MODELS[cfg.model_name]
    params = model.init(jax.random.PRNGKey(0), cfg, (8, 8, 8))
    optimizer, opt_state = make_optimizer(params, 0.02, 1e-3, 1.0)
    statics = TrainStatics(
        n_samples=16,
        step_size=0.2,
        white_bg=True,
        ndc_ray=False,
        total_steps=10,
        lr_factor=1.0,
        weights=LossWeights(l1=8e-5),
    )
    step_fn = make_train_step(model, cfg, statics, optimizer)

    o = rng.normal(size=(64, 3))
    o = 4.0 * o / np.linalg.norm(o, axis=-1, keepdims=True)
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    rays = np.concatenate([o, d], -1).astype(np.float32)
    rgbs = rng.uniform(size=(64, 3)).astype(np.float32)
    aabb = jnp.asarray([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]])
    key = jax.random.PRNGKey(7)

    # the step donates params/opt_state, so keep a host copy for the
    # second (sharded) invocation
    params_host = jax.device_get(params)

    # single-device result
    p1, _, m1 = step_fn(
        params, opt_state, None, aabb, jnp.asarray(rays), jnp.asarray(rgbs),
        jnp.asarray(0), key,
    )

    # sharded result
    mesh = make_mesh()
    optimizer2, opt_state2 = make_optimizer(params_host, 0.02, 1e-3, 1.0)
    step_fn2 = make_train_step(model, cfg, statics, optimizer2)
    params_r = replicate(mesh, params_host)
    opt_r = replicate(mesh, opt_state2)
    p8, _, m8 = step_fn2(
        params_r,
        opt_r,
        None,
        aabb,
        shard_rays(mesh, jnp.asarray(rays)),
        shard_rays(mesh, jnp.asarray(rgbs)),
        jnp.asarray(0),
        key,
    )

    np.testing.assert_allclose(
        float(m1["mse"]), float(m8["mse"]), rtol=1e-5, atol=1e-6
    )
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_graft_entry_contract():
    """entry() compiles; dryrun_multichip(8) runs a sharded step."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    rgb, depth = jax.jit(fn)(*args)
    assert rgb.shape == (1024, 3)
    assert depth.shape == (1024,)

    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_full_schedule_multidevice_matches_single(tmp_path):
    """The riskiest multi-device path: reconstruction() through shrink +
    upsample events (param shapes change mid-run -> re-replication +
    re-trace, train/loop.py) on the 8-device mesh, vs the identical run on
    one device.  Final test PSNR must be reasonable and equivalent
    (VERDICT r1 #5)."""
    from functools import partial

    from tensorf_tpu.config.schema import TrainConfig
    from tensorf_tpu.data import dataset_dict
    from tensorf_tpu.data.synthetic import make_synthetic_blender_scene
    from tensorf_tpu.eval.evaluation import psnrs_calculate
    from tensorf_tpu.train.loop import reconstruction
    from tensorf_tpu.utils.ckpt import load_checkpoint
    from tensorf_tpu.models import FIELD_MODELS
    from tensorf_tpu.models.config import GridGeometry
    from tensorf_tpu.eval.evaluation import RendererHandle

    scene = str(tmp_path / "scene")
    make_synthetic_blender_scene(scene, n_train=8, n_test=2, wh=(32, 32))

    def run(n_devices, tag):
        cfg = TrainConfig(
            expname=f"dp{tag}",
            basedir=str(tmp_path / f"log{tag}"),
            datadir=scene,
            dataset_name="blender",
            model_name="TensorVMSplit",
            shadingMode="MLP_Fea",
            n_iters=120,
            batch_size=512,
            N_voxel_init=20**3,
            N_voxel_final=32**3,
            upsamp_list=[60],
            update_AlphaMask_list=[80],
            n_lamb_sigma=[4, 4, 4],
            n_lamb_sh=[8, 8, 8],
            data_dim_color=9,
            featureC=32,
            pos_pe=2,
            view_pe=2,
            fea_pe=2,
            lr_init=0.05,
            lr_basis=2e-3,
            density_shift=-3.0,
            L1_weight_inital=8e-5,
            L1_weight_rest=4e-5,
            vis_every=0,
            train_vis_every=0,
            render_test=0,
            progress_refresh_rate=60,
            n_devices=n_devices,
        )
        orig = dataset_dict["blender"]
        dataset_dict["blender"] = partial(orig, wh=(32, 32))
        try:
            ckpt = reconstruction(cfg)
        finally:
            dataset_dict["blender"] = orig
        model_cfg, params, aabb, grid_size, mask, _ = load_checkpoint(ckpt)
        geometry = GridGeometry.create(aabb, grid_size, model_cfg.step_ratio)
        ds = orig(scene, split="test", is_stack=True, wh=(32, 32))
        handle = RendererHandle(
            model=FIELD_MODELS[model_cfg.model_name],
            cfg=model_cfg, params=params, alpha_mask=mask,
            aabb=jnp.asarray(geometry.aabb_np),
            step_size=geometry.step_size, n_samples=geometry.n_samples,
            white_bg=True, ndc_ray=False,
        )
        # the shrink event must have changed the grid from the init size
        assert tuple(grid_size) != (20, 20, 20), grid_size
        return float(np.mean(psnrs_calculate(handle, ds, chunk=512)))

    psnr_1 = run(1, "a")
    psnr_8 = run(8, "b")
    # both runs trained through shrink + upsample; the sharded one must
    # match the single-device result (identical math modulo psum ordering)
    assert psnr_8 > 14.0, psnr_8
    assert abs(psnr_1 - psnr_8) < 0.75, (psnr_1, psnr_8)


def test_host_ray_pool(monkeypatch):
    """Multi-host layout: the store stays identical everywhere; each host
    gets a disjoint strided ID pool covering the store, and its per-step
    share of the global batch."""
    from tensorf_tpu.parallel import mesh as pmesh

    # single process: no pool, full batch
    pool, b = pmesh.host_ray_pool(100, 64)
    assert pool is None and b == 64

    # simulated 4-host run: disjoint strided pools covering every id
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    pools = []
    for p in range(4):
        monkeypatch.setattr(jax, "process_index", lambda p=p: p)
        pool, b = pmesh.host_ray_pool(100, 64)
        assert b == 16
        np.testing.assert_array_equal(pool, np.arange(100)[p::4])
        pools.append(pool)
    total = np.concatenate(pools)
    assert total.size == 100 and np.unique(total).size == 100

    # global batch must divide by host count
    with pytest.raises(ValueError):
        pmesh.host_ray_pool(100, 63)


def test_simple_sampler_pool():
    """Pool-restricted SimpleSampler only emits pool ids, covers the pool
    across an epoch, and keeps the batch shape fixed when oversampling."""
    from tensorf_tpu.train.sampler import SimpleSampler

    pool = np.arange(100, dtype=np.int64)[1::4]  # host 1 of 4
    s = SimpleSampler(100, 8, seed=3, pool=pool)
    seen = set()
    for _ in range(10):
        ids = s.nextids()
        assert ids.shape == (8,)
        assert np.all(np.isin(ids, pool))
        seen.update(ids.tolist())
    assert seen == set(pool.tolist())

    # oversampling a tiny pool tiles permutations at a fixed shape
    tiny = np.asarray([7, 11, 13], np.int64)
    s = SimpleSampler(100, 8, seed=0, pool=tiny)
    ids = s.nextids()
    assert ids.shape == (8,) and np.all(np.isin(ids, tiny))


def test_sharded_serving_matches_single_device(rng):
    """Ray-batch DP serving: the stratified eval renderer with chunk rays
    sharded over the 8-device mesh must reproduce the single-device
    render (GSPMD replicates params/mask; only the rays are sharded)."""
    from tensorf_tpu.models import FIELD_MODELS, ModelConfig
    from tensorf_tpu.models.alpha_mask import AlphaGridMask, with_dilation
    from tensorf_tpu.render.chunked import render_chunked_stratified

    cfg = ModelConfig(
        model_name="TensorVMSplit", density_n_comp=(4, 4, 4),
        app_n_comp=(6, 6, 6), app_dim=9, shading_mode="MLP_Fea",
        pos_pe=2, view_pe=2, fea_pe=2, feature_c=32, density_shift=-3.0,
    )
    model = FIELD_MODELS[cfg.model_name]
    aabb = jnp.asarray([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]])
    params = model.init(jax.random.PRNGKey(0), cfg, (12, 12, 12))
    vol = (np.random.default_rng(7).uniform(size=(10, 10, 10)) < 0.35)
    mask = with_dilation(
        AlphaGridMask(aabb=aabb, volume=jnp.asarray(vol.astype(np.float32)))
    )
    o = rng.normal(size=(300, 3))
    o = 4.0 * o / np.linalg.norm(o, axis=-1, keepdims=True)
    rays = np.concatenate(
        [o, -o / np.linalg.norm(o, axis=-1, keepdims=True)], -1
    ).astype(np.float32)

    kw = dict(
        step_size=0.05, n_samples=128, white_bg=True, ndc_ray=False,
        chunk=128,
    )
    rgb_1, depth_1, _, _ = render_chunked_stratified(
        model, cfg, params, mask, rays, aabb, **kw
    )
    mesh = make_mesh()
    rgb_8, depth_8, _, _ = render_chunked_stratified(
        model, cfg, params, mask, rays, aabb, mesh=mesh, **kw
    )
    np.testing.assert_allclose(rgb_8, rgb_1, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(depth_8, depth_1, rtol=1e-4, atol=1e-4)


def test_host_reductions_identity_and_gathered(monkeypatch):
    """host_allsum / host_allmax: identity single-process; element-wise
    sum/max of the per-process gather under multi-host."""
    from tensorf_tpu.parallel import mesh as pmesh

    v = np.asarray([1, 2, 3], np.int64)
    np.testing.assert_array_equal(pmesh.host_allsum(v), v)
    np.testing.assert_array_equal(pmesh.host_allmax(v), v)

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    import jax.experimental.multihost_utils as mh

    monkeypatch.setattr(
        mh, "process_allgather", lambda x: np.stack([x, x * 3])
    )
    np.testing.assert_array_equal(pmesh.host_allsum(v), v * 4)
    np.testing.assert_array_equal(pmesh.host_allmax(v), v * 3)


def test_multihost_stratify_statics_agree():
    """Multi-host SPMD invariant (ADVICE r3 medium, redesigned r4): every
    host computes the SAME stratum plan over the bit-identical full store,
    so the compiled statics (edges/budgets/quotas/lattices) agree by
    construction; per-host DRAWS localize each global stratum to the
    host's disjoint id pool (train/sampler.py::localize_strata), borrowing
    lower-count pool rays when a pool slice is empty."""
    from tensorf_tpu.render.culling import stratify_rays
    from tensorf_tpu.train.sampler import allocate_quotas, localize_strata

    rng = np.random.default_rng(3)
    n_samples = 96
    counts = np.concatenate([
        np.zeros(1500, np.int64),
        rng.integers(1, 40, 1600),
        rng.integers(40, n_samples + 1, 900),
    ])
    rng.shuffle(counts)

    # the plan is a pure function of the identical counts: same strata,
    # budgets, quotas on every host
    strata, budgets = stratify_rays(counts)
    quotas = allocate_quotas([s.size for s in strata], 256, 8)
    n_proc = 4
    local_quotas = [q // n_proc for q in quotas]
    assert sum(local_quotas) * n_proc == 256

    pools = [np.arange(counts.size, dtype=np.int64)[p::n_proc]
             for p in range(n_proc)]
    all_locals = []
    for pool in pools:
        loc = localize_strata(strata, counts, pool, n_samples)
        assert len(loc) == len(strata)
        for sel, lsel, b in zip(strata, loc, budgets):
            assert lsel.size > 0
            # local draws stay inside the pool and fit the stratum budget
            assert np.all(np.isin(lsel, pool))
            assert counts[lsel].max() <= b
        all_locals.append(loc)
    # non-borrowed local slices partition each global stratum disjointly
    for i, sel in enumerate(strata):
        union = np.concatenate([
            np.intersect1d(all_locals[p][i], sel) for p in range(n_proc)
        ])
        np.testing.assert_array_equal(np.sort(union), np.sort(sel))

    # adversarial pool: a host whose pool misses a stratum borrows
    # lower-count pool rays that still fit the budget
    order = np.argsort(counts)
    low_pool = order[:50]  # only the lowest-count rays
    loc = localize_strata(strata, counts, low_pool, n_samples)
    for lsel, b in zip(loc, budgets):
        assert lsel.size > 0
        assert np.all(np.isin(lsel, low_pool))
        assert counts[lsel].max() <= b
