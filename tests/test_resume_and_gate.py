"""Checkpoint-resume path and alpha-gate semantics tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from tensorf_tpu.models.alpha_mask import (
    AlphaGridMask,
    sample_alpha,
    sample_alpha_gate,
    with_dilation,
)


def test_gate_is_conservative_superset_of_trilinear(rng):
    """nearest(max_pool3(volume)) must never cull where trilinear > 0."""
    vol = (rng.uniform(size=(12, 14, 16)) < 0.08).astype(np.float32)
    mask = with_dilation(
        AlphaGridMask(
            aabb=jnp.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]]),
            volume=jnp.asarray(vol),
        )
    )
    xyz = jnp.asarray(rng.uniform(-1, 1, size=(5000, 3)).astype(np.float32))
    tri = np.asarray(sample_alpha(mask, xyz)) > 0
    gate = np.asarray(sample_alpha_gate(mask, xyz)) > 0
    # everywhere the reference (trilinear) keeps a sample, the gate keeps it
    assert not np.any(tri & ~gate)
    # outside the mask aabb the gate is closed
    far = jnp.asarray([[2.0, 0.0, 0.0], [0.0, -3.0, 0.0]])
    assert not np.asarray(sample_alpha_gate(mask, far)).any()


def test_reconstruction_resume_from_checkpoint(tmp_path, rng):
    """ckpt_path resume rebuilds the model (incl. grid size + alpha mask)
    and continues training (reference train.py:220-225)."""
    from functools import partial

    from tensorf_tpu.config.schema import TrainConfig
    from tensorf_tpu.data import dataset_dict
    from tensorf_tpu.data.synthetic import make_synthetic_blender_scene
    from tensorf_tpu.train.loop import reconstruction
    from tensorf_tpu.utils.ckpt import load_checkpoint

    scene = str(tmp_path / "scene")
    make_synthetic_blender_scene(scene, n_train=4, n_test=1, wh=(24, 24))

    common = dict(
        basedir=str(tmp_path / "log"),
        datadir=scene,
        dataset_name="blender",
        model_name="TensorVMSplit",
        shadingMode="MLP_Fea",
        batch_size=256,
        N_voxel_init=16**3,
        N_voxel_final=20**3,
        upsamp_list=[20],
        update_AlphaMask_list=[30],
        n_lamb_sigma=[2, 2, 2],
        n_lamb_sh=[2, 2, 2],
        data_dim_color=6,
        featureC=16,
        pos_pe=2,
        view_pe=2,
        fea_pe=2,
        density_shift=-3.0,
        vis_every=1000,
        train_vis_every=1000,
        render_test=0,
        progress_refresh_rate=100,
        n_devices=1,
    )
    orig = dataset_dict["blender"]
    dataset_dict["blender"] = partial(orig, wh=(24, 24))
    try:
        ckpt = reconstruction(
            TrainConfig(expname="seed_run", n_iters=40, **common)
        )
        cfg2, params2, aabb2, grid2, mask2, _ = load_checkpoint(ckpt)
        assert grid2 == (20, 20, 20)  # upsample happened before save
        assert mask2 is not None  # alpha mask persisted

        ckpt2 = reconstruction(
            TrainConfig(
                expname="resumed_run",
                n_iters=10,
                ckpt_path=ckpt,
                upsamp_list=[],
                update_AlphaMask_list=[],
                **{k: v for k, v in common.items()
                   if k not in ("upsamp_list", "update_AlphaMask_list")},
            )
        )
        cfg3, params3, aabb3, grid3, mask3, _ = load_checkpoint(ckpt2)
        assert grid3 == grid2
        assert mask3 is not None
        # training actually moved the params
        moved = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(
                jax.tree.leaves(params2), jax.tree.leaves(params3)
            )
        )
        assert moved
    finally:
        dataset_dict["blender"] = orig


def test_count_and_stratify_rays():
    """Stratification building blocks: per-ray candidate counts cover the
    exact-alive counts (conservative), and strata partition the store with
    budgets covering each stratum's max."""
    import jax
    import jax.numpy as jnp

    from tensorf_tpu.models.alpha_mask import AlphaGridMask, with_dilation
    from tensorf_tpu.ops.rays import sample_along_rays
    from tensorf_tpu.models.alpha_mask import sample_alpha_gate
    from tensorf_tpu.render.culling import count_ray_candidates, stratify_rays

    rng = np.random.default_rng(3)
    G = 24
    z, y, x = np.meshgrid(*[np.linspace(-1.5, 1.5, G)] * 3, indexing="ij")
    vol = (np.sqrt(x * x + y * y + z * z) < 0.8).astype(np.float32)
    aabb = np.asarray([[-1.5] * 3, [1.5] * 3], np.float32)
    mask = with_dilation(
        AlphaGridMask(aabb=jnp.asarray(aabb), volume=jnp.asarray(vol))
    )

    o = rng.normal(size=(512, 3))
    o = 4.0 * o / np.linalg.norm(o, axis=-1, keepdims=True)
    rays = np.concatenate(
        [o, -o / np.linalg.norm(o, axis=-1, keepdims=True)], -1
    ).astype(np.float32)

    counts = count_ray_candidates(
        rays, mask, aabb, step_size=0.06, n_samples=100, chunk=128
    )
    assert counts.shape == (512,)

    # conservative: candidates >= exact alive per ray
    xyz, _, valid = sample_along_rays(
        jnp.asarray(rays[:, :3]), jnp.asarray(rays[:, 3:6]),
        jnp.asarray(aabb), 2.0, 6.0, 0.06, 100, None,
    )
    alive = np.asarray(valid & (sample_alpha_gate(mask, xyz) > 0)).sum(-1)
    assert np.all(counts >= alive)

    strata, budgets = stratify_rays(counts, quantiles=(0.5, 0.9))
    got = np.sort(np.concatenate(strata))
    np.testing.assert_array_equal(got, np.arange(512))  # exact partition
    for sel, b in zip(strata, budgets):
        assert counts[sel].max() <= b
        assert b % 32 == 0


def test_watchdog_fires_and_respects_beats_and_cache(tmp_path):
    """Wedge watchdog (r3 incident automation): fires after the timeout
    with no beats, does NOT fire while beats arrive, and treats recent
    compile-cache writes as progress (long remote compiles never
    false-fire)."""
    import time

    from tensorf_tpu.utils.watchdog import Watchdog

    fired = []

    # no beats -> fires (on_stall captured instead of os._exit)
    wd = Watchdog(0.3, on_stall=fired.append, poll_s=0.05).start()
    time.sleep(0.8)
    wd.stop()
    assert fired and fired[0] > 0.3

    # steady beats -> never fires
    fired.clear()
    wd = Watchdog(0.3, on_stall=fired.append, poll_s=0.05).start()
    for _ in range(10):
        wd.beat()
        time.sleep(0.1)
    wd.stop()
    assert not fired

    # stalled beats but fresh cache writes -> no fire; stale cache -> fire
    fired.clear()
    cache = tmp_path / "jax_cache"
    cache.mkdir()
    wd = Watchdog(
        0.4, on_stall=fired.append, poll_s=0.05, cache_dirs=[str(cache)]
    ).start()
    for i in range(8):  # ~0.8s stall, covered by cache writes
        (cache / f"entry{i}").write_text("x")
        time.sleep(0.1)
    assert not fired
    time.sleep(0.9)  # now both beat and cache are stale
    wd.stop()
    assert fired

    # timeout 0 disables (never starts a thread)
    wd = Watchdog(0.0, on_stall=fired.append).start()
    assert wd._thread is None
    wd.stop()


def test_resume_continues_mid_run(tmp_path, capsys):
    """--resume 1: a killed run continues from its newest resumable
    checkpoint — iteration, optimizer state, schedule position, and the
    alpha-filtered ray store all restored (VERDICT r3 #7; the reference
    can only reload params and restart the schedule)."""
    from functools import partial

    from tensorf_tpu.config.schema import TrainConfig
    from tensorf_tpu.data import dataset_dict
    from tensorf_tpu.data.synthetic import make_synthetic_blender_scene
    from tensorf_tpu.train.loop import reconstruction
    from tensorf_tpu.utils.ckpt import load_checkpoint, load_opt_leaves

    scene = str(tmp_path / "scene")
    make_synthetic_blender_scene(scene, n_train=4, n_test=1, wh=(24, 24))

    common = dict(
        basedir=str(tmp_path / "log"),
        datadir=scene,
        dataset_name="blender",
        model_name="TensorVMSplit",
        shadingMode="MLP_Fea",
        batch_size=256,
        N_voxel_init=16**3,
        N_voxel_final=20**3,
        upsamp_list=[20],
        update_AlphaMask_list=[22, 28],
        save_ckpt_every=[30],
        n_lamb_sigma=[2, 2, 2],
        n_lamb_sh=[2, 2, 2],
        data_dim_color=6,
        featureC=16,
        pos_pe=2,
        view_pe=2,
        fea_pe=2,
        density_shift=-3.0,
        vis_every=1000,
        train_vis_every=1000,
        render_test=0,
        progress_refresh_rate=100,
        n_devices=1,
        expname="wedge_run",
    )
    orig = dataset_dict["blender"]
    dataset_dict["blender"] = partial(orig, wh=(24, 24))
    try:
        # "wedged" run: dies right after the periodic ckpt at iter 30
        ckpt = reconstruction(TrainConfig(n_iters=31, **common))
        assert load_opt_leaves(ckpt) is not None  # resumable final ckpt
        capsys.readouterr()

        # relaunch with --resume: same logfolder, full horizon
        ckpt2 = reconstruction(TrainConfig(n_iters=45, resume=1, **common))
        out = capsys.readouterr().out
        assert "[resume] continuing at iteration 31" in out
        assert "[resume] optimizer state restored" in out
        assert "[resume] store re-filtered" in out  # past both mask events
        # schedule events must NOT re-fire after resume
        assert "upsampled to" not in out
        assert "alpha mask updated" not in out

        cfg3, params3, aabb3, grid3, mask3, extra3 = load_checkpoint(ckpt2)
        assert grid3 == (20, 20, 20)  # upsampled grid carried through
        assert mask3 is not None
        assert extra3["iteration"] == 44

        # resume of a FINISHED run skips straight to finalization
        capsys.readouterr()
        ckpt3 = reconstruction(TrainConfig(n_iters=45, resume=1, **common))
        out = capsys.readouterr().out
        assert "continuing at iteration 45" in out
        assert "Iteration" not in out  # no training steps ran
    finally:
        dataset_dict["blender"] = orig


def test_supervisor_relaunches_on_wedged_exit(monkeypatch, capsys):
    """train.py --auto_resume N: relaunch with --resume 1 while the child
    exits EXIT_WEDGED, then stop on success; give up after N attempts."""
    import train as train_cli
    from tensorf_tpu.utils.watchdog import EXIT_WEDGED

    calls = []

    def fake_call(cmd):
        calls.append(cmd)
        # wedge twice, then succeed
        return EXIT_WEDGED if len(calls) <= 2 else 0

    monkeypatch.setattr("subprocess.call", fake_call)
    rc = train_cli._supervise(["--config", "x.txt"], retries=3)
    assert rc == 0 and len(calls) == 3
    assert "--resume" not in " ".join(calls[0])
    assert "--resume" in " ".join(calls[1])
    # the child must never re-supervise
    for c in calls:
        i = c.index("--auto_resume")
        assert c[i + 1] == "0"

    calls.clear()
    monkeypatch.setattr("subprocess.call", lambda cmd: (
        calls.append(cmd) or EXIT_WEDGED
    ))
    rc = train_cli._supervise(["--config", "x.txt"], retries=2)
    assert rc == EXIT_WEDGED and len(calls) == 3  # initial + 2 retries


def test_resume_finds_prior_date_logfolder(tmp_path):
    """--resume relaunched after local midnight reuses the newest prior
    date-stamped folder for the expname instead of a fresh empty one."""
    from tensorf_tpu.config.schema import TrainConfig
    from tensorf_tpu.train.loop import _make_logfolder

    base = tmp_path / "log"
    prior = base / "2020-01-01" / "exp"
    prior.mkdir(parents=True)
    (prior / "0k_exp.npz").write_bytes(b"x")
    cfg = TrainConfig(basedir=str(base), expname="exp", resume=1)
    assert _make_logfolder(cfg) == str(prior)

    # without --resume a fresh date-stamped folder is created as before
    cfg2 = TrainConfig(basedir=str(base), expname="exp", resume=0)
    assert _make_logfolder(cfg2) != str(prior)


def test_checkpoint_write_is_atomic(tmp_path):
    """save_checkpoint must never leave a partial file at the final path
    (tmp + os.replace)."""
    import numpy as np

    from tensorf_tpu.models import FIELD_MODELS, ModelConfig
    from tensorf_tpu.utils.ckpt import load_checkpoint, save_checkpoint

    cfg = ModelConfig(model_name="TensorVMSplit")
    import jax

    params = FIELD_MODELS["TensorVMSplit"].init(
        jax.random.PRNGKey(0), cfg, (8, 8, 8)
    )
    path = str(tmp_path / "ck.npz")
    orig_replace = __import__("os").replace
    seen = []

    import os as _os
    real = _os.replace

    def spy(src, dst):
        seen.append((src, dst))
        return real(src, dst)

    _os.replace = spy
    try:
        save_checkpoint(
            path, cfg, params, np.zeros((2, 3), np.float32), (8, 8, 8)
        )
    finally:
        _os.replace = real
    assert seen and seen[0][1] == path and seen[0][0].endswith(".tmp.npz")
    load_checkpoint(path)  # round-trips


def test_multihost_resume_disagreement_falls_back(monkeypatch, tmp_path):
    """When hosts see different newest iterations, every process starts
    fresh (identical statics) instead of resuming divergently."""
    # exercise just the agreement arithmetic the loop uses
    import numpy as np

    from tensorf_tpu.parallel import mesh as pmesh

    # single-process host_allmax is identity -> agreement
    v = np.asarray([17], np.int64)
    mx = int(pmesh.host_allmax(v)[0])
    mn = -int(pmesh.host_allmax(-v)[0])
    assert mx == mn == 17

    # simulate host disagreement: allmax sees {17, 12}
    def fake_allmax(x):
        vals = np.stack([x, np.where(x < 0, -12, 12)])
        return vals.max(axis=0)

    monkeypatch.setattr(pmesh, "host_allmax", fake_allmax)
    mx = int(pmesh.host_allmax(v)[0])
    mn = -int(pmesh.host_allmax(-v)[0])
    assert mx == 17 and mn == 12 and mx != mn  # -> fresh start branch


def test_sampler_state_roundtrip():
    """get_state/set_state continue the draw stream bit-exactly, for both
    sampler kinds (the bit-exact-resume building block)."""
    from tensorf_tpu.train.sampler import SimpleSampler, StratifiedSampler

    a = SimpleSampler(1000, 64, seed=7)
    for _ in range(5):
        a.nextids()
    meta, ids = a.get_state()
    b = SimpleSampler(1000, 64, seed=999)  # wrong seed on purpose
    b.set_state(meta, ids)
    for _ in range(30):  # crosses an epoch reshuffle
        np.testing.assert_array_equal(a.nextids(), b.nextids())

    strata = [np.arange(0, 300), np.arange(300, 900), np.arange(900, 1000)]
    sa = StratifiedSampler(strata, [32, 24, 8], seed=3)
    for _ in range(4):
        sa.nextids()
    meta, strata_arrays, idss = sa.get_state()
    sb = StratifiedSampler(strata_arrays, meta["quotas"], seed=555)
    sb.set_state(meta, idss)
    for _ in range(40):
        for x, y in zip(sa.nextids(), sb.nextids()):
            np.testing.assert_array_equal(x, y)


def test_resume_is_bit_exact(tmp_path, capsys, monkeypatch):
    """A killed-and-resumed run reproduces the clean run's final state
    BIT-EXACTLY: per-step keys are stateless (fold_in(base, iteration))
    and resumable checkpoints carry the live stratification plan +
    sampler RNG/permutation states (loop.restore_sampling_state).  The
    r4 CLI kill/resume drive measured 31.93 dB resumed vs 32.07 clean
    under the old reseed path; this pins the gap at exactly zero."""
    from functools import partial

    import jax

    from tensorf_tpu.config.schema import TrainConfig
    from tensorf_tpu.data import dataset_dict
    from tensorf_tpu.data.synthetic import make_synthetic_blender_scene
    from tensorf_tpu.train import loop as loop_mod
    from tensorf_tpu.utils.ckpt import load_checkpoint, load_opt_leaves

    scene = str(tmp_path / "scene")
    make_synthetic_blender_scene(scene, n_train=4, n_test=1, wh=(24, 24))

    common = dict(
        basedir=str(tmp_path / "log"),
        datadir=scene,
        dataset_name="blender",
        model_name="TensorVMSplit",
        shadingMode="MLP_Fea",
        batch_size=256,
        n_iters=45,
        N_voxel_init=16**3,
        N_voxel_final=20**3,
        upsamp_list=[20],
        update_AlphaMask_list=[22, 28],
        save_ckpt_every=[30],
        n_lamb_sigma=[2, 2, 2],
        n_lamb_sh=[2, 2, 2],
        data_dim_color=6,
        featureC=16,
        pos_pe=2,
        view_pe=2,
        fea_pe=2,
        density_shift=-3.0,
        vis_every=1000,
        # history rows at 10/20/30/40 — rows 10..30 predate the kill and
        # must survive into the resumed run's history.npz (continuity)
        train_vis_every=10,
        render_test=0,
        progress_refresh_rate=100,
        n_devices=1,
    )
    orig = dataset_dict["blender"]
    dataset_dict["blender"] = partial(orig, wh=(24, 24))

    class _Killed(Exception):
        pass

    class _KillAtBeat:
        """Watchdog stand-in that dies at the Nth beat.  The watchdog is
        armed at reconstruction() entry (r5: setup-phase coverage), so the
        loop beats start after 3 setup beats — beat #35 = the top of
        iteration 31, right after the periodic ckpt at 30."""

        kill_at = None

        def __init__(self, *a, **k):
            self.n = 0

        def start(self):
            return self

        def beat(self):
            self.n += 1
            if self.kill_at is not None and self.n == self.kill_at:
                raise _Killed()

        def stop(self):
            pass

    try:
        clean = reconstruction_path = loop_mod.reconstruction(
            TrainConfig(expname="exact_clean", **common)
        )

        monkeypatch.setattr(loop_mod, "Watchdog", _KillAtBeat)
        _KillAtBeat.kill_at = 35
        try:
            loop_mod.reconstruction(
                TrainConfig(expname="exact_resume", **common)
            )
            raise AssertionError("kill did not fire")
        except _Killed:
            pass
        _KillAtBeat.kill_at = None
        capsys.readouterr()
        resumed = loop_mod.reconstruction(
            TrainConfig(expname="exact_resume", resume=1, **common)
        )
        out = capsys.readouterr().out
        assert "continuing at iteration 31" in out
        assert "sampling state restored" in out

        cfg_a, pa, aabb_a, grid_a, mask_a, ex_a = load_checkpoint(clean)
        cfg_b, pb, aabb_b, grid_b, mask_b, ex_b = load_checkpoint(resumed)
        assert grid_a == grid_b and cfg_a == cfg_b
        np.testing.assert_array_equal(aabb_a, aabb_b)
        la, lb = jax.tree_util.tree_leaves(pa), jax.tree_util.tree_leaves(pb)
        assert len(la) == len(lb)
        for x, y in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        np.testing.assert_array_equal(
            np.asarray(mask_a.volume), np.asarray(mask_b.volume)
        )
        # observability continuity: the resumed run's history.npz spans
        # the WHOLE run (rows 10..30 were written before the kill)
        hist = np.load(
            os.path.join(os.path.dirname(resumed), "history.npz")
        )
        assert list(hist["iteration"]) == [10, 20, 30, 40]
    finally:
        dataset_dict["blender"] = orig
        _KillAtBeat.kill_at = None
