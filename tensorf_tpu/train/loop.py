"""Training driver: the full few-shot TensoRF pipeline on TPU.

Counterpart of ``reconstruction`` (reference train.py:168-544) implementing
the *intended* schedule semantics (the reference's post-return blocks,
train.py:450-485, which encode upstream TensoRF's coarse-to-fine behavior —
SURVEY.md §2.11):

  * alpha-mask updates at ``update_AlphaMask_list`` (aabb shrink at the
    first event, alpha-based ray re-filtering at the second),
  * geometric voxel upsampling at ``upsamp_list`` with optimizer re-init
    (``lr_upsample_reset``),
  * periodic checkpoints at ``save_ckpt_every``,
  * L1 weight switching to ``L1_weight_rest`` after the first alpha-mask
    update (upstream TensoRF behavior),
  * FreeNeRF masks + occlusion regularization.

TPU structure: shape-changing events are segment boundaries; each segment
runs one jitted train step (re-traced on the new shapes).  Ray batches are
sharded over a 1-D device mesh (params replicated, grads psum'd by GSPMD).
"""

from __future__ import annotations

import os
import shutil
import time
from collections import defaultdict
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.schema import TrainConfig, model_config_from
from ..data import dataset_dict
from ..eval.evaluation import (
    RendererHandle,
    evaluation,
    evaluation_path,
    psnrs_calculate,
)
from ..eval.mesh import convert_alpha_samples_to_ply
from ..eval.vis import create_gif, save_rendered_image_per_train
from ..models.config import (
    GridGeometry,
    cal_n_samples,
    n_to_reso,
    n_voxel_schedule,
)
from ..models.tensorf import FIELD_MODELS
from ..ops.freq_mask import free_masks
from ..parallel.mesh import (
    global_ids_from_local,
    host_allmax,
    host_ray_pool,
    make_mesh,
    replicate,
    shard_rays,
)
from ..models.alpha_mask import coarse_gate_valid
from ..render.culling import (
    _budget_hint,
    compute_alpha_grid,
    count_ray_candidates,
    count_ray_candidates_and_alive,
    count_ray_candidates_and_chord,
    count_ray_inbbox,
    filter_rays_alpha,
    filter_rays_bbox,
    stratify_rays,
    stratify_rays_joint,
    update_alpha_mask,
)
from ..utils.ckpt import (
    load_aux,
    load_checkpoint,
    load_opt_leaves,
    save_checkpoint,
)
from ..utils.watchdog import Watchdog
from .losses import LossWeights
from .optim import make_optimizer
from .sampler import (
    SimpleSampler,
    StratifiedSampler,
    allocate_quotas,
    localize_strata,
)
from .step import TrainStatics, make_train_step


def _make_logfolder(cfg: TrainConfig) -> str:
    """basedir/<YYYY-MM-DD>/<expname> with Asia/Ho_Chi_Minh date
    (reference train.py:193-200)."""
    from datetime import datetime
    from zoneinfo import ZoneInfo

    date = datetime.now(ZoneInfo("Asia/Ho_Chi_Minh")).strftime("%Y-%m-%d")
    logfolder = f"{cfg.basedir}/{date}/{cfg.expname}"
    if cfg.resume and not os.path.exists(logfolder):
        # --resume relaunched after local midnight: the date-stamped path
        # moved, but the run to continue lives under an earlier date —
        # reuse the newest prior folder for this expname instead of
        # silently starting a fresh run in an empty one
        import glob

        prior = sorted(
            (
                p for p in glob.glob(f"{cfg.basedir}/*/{cfg.expname}")
                if os.path.isdir(p)
            ),
            key=os.path.getmtime,
        )
        if prior:
            logfolder = prior[-1]
            print(f"[resume] continuing in prior logfolder {logfolder}")
    if cfg.overwrt and not cfg.resume and os.path.exists(logfolder):
        shutil.rmtree(logfolder)
    os.makedirs(logfolder, exist_ok=True)
    for sub in ("imgs_vis", "imgs_rgba", "rgba"):
        os.makedirs(f"{logfolder}/{sub}", exist_ok=True)
    return logfolder


def _latest_ckpt(logfolder: str):
    """Newest .npz checkpoint in the logfolder (mtime order) that carries a
    resume position, for ``--resume 1`` wedge recovery.  Returns
    ``(path, iteration)`` or ``None`` (the iteration rides along so the
    multi-host agreement check does not re-open the file)."""
    import glob
    import json

    cands = sorted(
        glob.glob(f"{logfolder}/*.npz"), key=os.path.getmtime, reverse=True
    )
    for path in cands:
        if os.path.basename(path) == "history.npz":
            continue
        try:
            data = np.load(path, allow_pickle=False)
            kwargs = json.loads(bytes(data["kwargs"]).decode())
            extra = kwargs.get("extra") or {}
            if "iteration" in extra:
                return path, int(extra["iteration"])
        except Exception:
            continue
    return None


def _summary_writer(logfolder: str, enabled: bool = True):
    class _Null:
        def add_scalar(self, *a, **k):
            pass

        def close(self):
            pass

    if not enabled:
        return _Null()
    try:
        from tensorboardX import SummaryWriter

        return SummaryWriter(logfolder)
    except Exception:
        return _Null()


def _gift_dataset(dataset_cls, cfg: TrainConfig, split: str):
    """Single-view datasets for progress GIFs (reference train.py:176-177);
    only loaders with few-shot support accept them."""
    try:
        return dataset_cls(
            cfg.datadir,
            split=split,
            downsample=cfg.downsample_train,
            num_images=[26],
            is_stack=True,
        )
    except Exception:
        return None


class TrainerState:
    """Mutable cross-segment state (the role `tensorf` + locals play in the
    reference loop)."""

    def __init__(self):
        self.params = None
        self.opt_state = None
        self.alpha_mask = None
        self.geometry: Optional[GridGeometry] = None
        self.n_samples: int = 0


def reconstruction(cfg: TrainConfig) -> str:
    # wedge watchdog (r3 incident automation), armed BEFORE any device
    # contact: the r5 flagship relaunch wedged inside setup (bbox-filter
    # dispatch at backend init — no train-loop beat had ever happened, so
    # the r4 in-loop watchdog placement would hang forever).  Setup
    # milestones beat it below; compile-cache writes count as progress so
    # long remote compiles never false-fire.  On stall it exits resumable
    # (code 17) — relaunch with --resume 1.
    watchdog = Watchdog(
        cfg.wedge_timeout_s,
        tag=cfg.expname,
        resume_hint="python train.py ... --resume 1",
        # only THIS run's compile cache counts as progress — NOT the
        # pytest conftest's /tmp/jax_cache, whose writes from a concurrent
        # CPU test process would indefinitely suppress wedge detection
        cache_dirs=[
            d for d in dict.fromkeys((
                os.environ.get("JAX_COMPILATION_CACHE_DIR"),
                "/tmp/jax_cache_tpu",
            )) if d
        ],
    ).start()

    if cfg.distributed:
        # multi-host: one process per host joins the global device mesh;
        # XLA collectives then ride ICI within slices / DCN across hosts
        # (SURVEY.md §2.10 TPU-native plan).  On TPU pods/SLURM the args
        # auto-detect; elsewhere (incl. the real 2-process CPU/gloo smoke
        # run, scripts/multihost_smoke.py) they come from TFTPU_* env vars.
        kw = {}
        if os.environ.get("TFTPU_COORDINATOR"):
            kw = dict(
                coordinator_address=os.environ["TFTPU_COORDINATOR"],
                num_processes=int(os.environ["TFTPU_NUM_PROCESSES"]),
                process_id=int(os.environ["TFTPU_PROCESS_ID"]),
            )
        jax.distributed.initialize(**kw)

    model_cfg = model_config_from(cfg)
    model = FIELD_MODELS[cfg.model_name]

    # ---- datasets (train.py:172-180) ----
    dataset_cls = dataset_dict[cfg.dataset_name]
    train_dataset = dataset_cls(
        cfg.datadir,
        split="train",
        downsample=cfg.downsample_train,
        num_images=cfg.resolved_train_images(),
    )
    test_dataset = dataset_cls(
        cfg.datadir,
        split="test",
        downsample=cfg.downsample_train,
        num_images=cfg.resolved_test_images(),
        is_stack=True,
    )
    train_gift = _gift_dataset(dataset_cls, cfg, "train")
    test_gift = _gift_dataset(dataset_cls, cfg, "test")
    watchdog.beat()  # setup milestone: datasets loaded (host-side)

    white_bg = train_dataset.white_bg
    near_far = tuple(float(v) for v in train_dataset.near_far)
    ndc_ray = bool(cfg.ndc_ray)
    model_cfg = model_cfg.replace(near_far=near_far)

    if jax.process_count() > 1:
        # process 0 prepares the logfolder first (it may rmtree on
        # --overwrt); the barrier keeps other hosts from racing the delete
        # with their own makedirs
        from jax.experimental import multihost_utils

        if jax.process_index() == 0:
            logfolder = _make_logfolder(cfg)
        multihost_utils.sync_global_devices("tftpu:logfolder")
        if jax.process_index() != 0:
            cfg.overwrt = False
            logfolder = _make_logfolder(cfg)
    else:
        logfolder = _make_logfolder(cfg)
    # only process 0 writes event files (all hosts compute identical
    # scalars from replicated outputs — duplicate writers would interleave)
    writer = _summary_writer(logfolder, enabled=jax.process_index() == 0)

    # ---- resolution schedule (train.py:204-215) ----
    aabb = np.asarray(train_dataset.scene_bbox, np.float32).reshape(2, 3)
    grid_size = n_to_reso(cfg.N_voxel_init, aabb)
    n_voxel_list = n_voxel_schedule(
        cfg.N_voxel_init, cfg.N_voxel_final, len(cfg.upsamp_list)
    )

    state = TrainerState()
    key = jax.random.PRNGKey(cfg.seed)
    # per-step randomness is STATELESS — fold_in(base, iteration) — so a
    # resumed run replays the exact key stream a clean run would have used
    # at the same iterations (bit-exact resume; `key` above only seeds init)
    base_key = jax.random.PRNGKey(cfg.seed)

    # ---- model init / resume (train.py:218-247) ----
    # --resume 1: wedge recovery — continue the run in this logfolder from
    # its newest periodic checkpoint (iteration, optimizer state, and
    # schedule position restored; the reference can only reload params)
    resume_extra = None
    if cfg.resume and not cfg.ckpt_path:
        found = _latest_ckpt(logfolder)
        if jax.process_count() > 1:
            # multi-host SPMD: every process must make the SAME resume
            # decision from the SAME iteration, else start_iter (a static
            # baked into the compiled step) diverges and collectives
            # mismatch.  ALL hosts join the reduction (a host without a
            # checkpoint contributes -1); agree only when every host sees
            # the same newest iteration, else everyone starts fresh.
            my_it = found[1] if found else -1
            v = np.asarray([my_it], np.int64)
            mx = int(host_allmax(v)[0])
            mn = -int(host_allmax(-v)[0])
            if mx != mn or mn < 0:
                if found:
                    print(
                        f"[resume] hosts disagree on newest iteration "
                        f"({mn} vs {mx}) — fresh start on all hosts"
                    )
                found = None
        if found:
            cfg.ckpt_path = found[0]
            print(f"[resume] newest checkpoint: {found[0]}")
        else:
            print(f"[resume] no checkpoint under {logfolder} — fresh start")
    if cfg.ckpt_path:
        model_cfg, state.params, aabb, grid_size, state.alpha_mask, ck_extra = (
            load_checkpoint(cfg.ckpt_path)
        )
        model = FIELD_MODELS[model_cfg.model_name]
        print(f"resumed from {cfg.ckpt_path} (grid {grid_size})")
        if cfg.resume and ck_extra and "iteration" in ck_extra:
            resume_extra = ck_extra
    else:
        key, sub = jax.random.split(key)
        state.params = model.init(sub, model_cfg, grid_size)

    state.geometry = GridGeometry.create(aabb, grid_size, cfg.step_ratio)
    state.n_samples = min(
        int(cfg.nSamples), cal_n_samples(grid_size, cfg.step_ratio)
    )
    start_iter = 0
    lr_scale_cur = 1.0
    if resume_extra is not None:
        start_iter = int(resume_extra["iteration"]) + 1
        # n_samples is NOT derivable from the grid alone (shrink events
        # change geometry without touching it) — restore the saved value
        state.n_samples = int(resume_extra.get("n_samples", state.n_samples))
        lr_scale_cur = float(resume_extra.get("lr_scale", 1.0))
        print(
            f"[resume] continuing at iteration {start_iter} "
            f"(n_samples {state.n_samples}, lr_scale {lr_scale_cur:g})"
        )

    # ---- optimizer (train.py:263-273) ----
    if cfg.lr_decay_iters > 0:
        lr_factor = cfg.lr_decay_target_ratio ** (1 / cfg.lr_decay_iters)
    else:
        lr_factor = cfg.lr_decay_target_ratio ** (1 / cfg.n_iters)
    print(
        f"lr decay {cfg.lr_decay_target_ratio} "
        f"{cfg.lr_decay_iters if cfg.lr_decay_iters > 0 else cfg.n_iters}"
    )

    optimizer, state.opt_state = make_optimizer(
        state.params,
        cfg.lr_init * lr_scale_cur,
        cfg.lr_basis * lr_scale_cur,
        lr_factor,
    )
    if resume_extra is not None:
        # restore optimizer state by leaf order against the fresh treedef
        # (moments + the schedule step count, so LR decay continues where
        # it left off)
        leaves = load_opt_leaves(cfg.ckpt_path)
        if leaves is not None:
            fresh_leaves, treedef = jax.tree_util.tree_flatten(
                state.opt_state
            )
            if len(leaves) == len(fresh_leaves) and all(
                a.shape == b.shape for a, b in zip(leaves, fresh_leaves)
            ):
                state.opt_state = jax.tree_util.tree_unflatten(
                    treedef, leaves
                )
                print("[resume] optimizer state restored")
            else:
                print(
                    "[resume] optimizer state mismatch — reinitialized "
                    f"({len(leaves)} vs {len(fresh_leaves)} leaves)"
                )

    # ---- device mesh (ray-batch DP; params replicated) ----
    mesh = make_mesh(cfg.n_devices)
    n_dev = mesh.devices.size
    if n_dev > 1:
        state.params = replicate(mesh, state.params)
        state.opt_state = replicate(mesh, state.opt_state)
        if state.alpha_mask is not None:
            # a ckpt-loaded mask lives on the default local device; step
            # inputs must be global arrays under multi-process SPMD
            state.alpha_mask = replicate(mesh, state.alpha_mask)
        print(f"data-parallel over {n_dev} devices: {mesh}")

    n_proc = jax.process_count()

    def put_batch(arr):
        """Device id batch: single-process -> shard the local array over
        the mesh; multi-process -> each host contributes its local draw to
        the GLOBAL sharded batch (mesh.py::global_ids_from_local)."""
        if n_proc > 1:
            return global_ids_from_local(mesh, np.asarray(arr))
        return shard_rays(mesh, jnp.asarray(arr)) if n_dev > 1 else jnp.asarray(arr)

    def put_rep(x):
        """Replicate a (host or single-device) value over the global mesh.
        Multi-process jit inputs must be global jax.Arrays; single-process
        keeps today's cheap local placement."""
        return replicate(mesh, x) if n_proc > 1 else jnp.asarray(x)

    def put_store(arr):
        """Device-resident (replicated) copy of a ray/rgb store: batches
        are then gathered ON DEVICE from int32 ids — the per-step host
        upload shrinks from the ray rows to a few KB of indices (VERDICT
        r2 #4: the per-step host gather + tunnel H2D was the measured
        ~150 ms/iter gap between the benched step and the real loop)."""
        a = jnp.asarray(arr)
        return replicate(mesh, a) if n_dev > 1 else a

    # ---- ray pre-filtering + sampler (train.py:288-292) ----
    allrays = np.asarray(train_dataset.all_rays, np.float32)
    allrgbs = np.asarray(train_dataset.all_rgbs, np.float32)
    if not ndc_ray:
        # transparent --resume continuation filters on the DATASET bbox
        # (what the original run used before any shrink); a --ckpt restart
        # keeps the reference's semantics (filter on the loaded aabb)
        store_aabb = (
            np.asarray(train_dataset.scene_bbox, np.float32).reshape(2, 3)
            if resume_extra is not None else aabb
        )
        allrays, allrgbs = filter_rays_bbox(allrays, allrgbs, store_aabb)
    watchdog.beat()  # setup milestone: first device dispatch survived
    # multi-host: the store stays bit-identical (and mesh-replicated) on
    # every host — host disjointness lives in ID space: host p samples only
    # ids p::n_proc of its per-step share of the global batch, so the
    # global batch is a disjoint union of per-host draws and all
    # stratification statics derive from identical full-store counts on
    # every process (identical compiled step programs by construction).
    host_pool, local_batch = host_ray_pool(allrays.shape[0], cfg.batch_size)

    def pool_of(n_rays: int):
        """This host's id pool after a store rebuild of size n_rays."""
        return host_ray_pool(n_rays, cfg.batch_size)[0]
    if (
        resume_extra is not None
        and not ndc_ray
        and state.alpha_mask is not None
        and len(cfg.update_AlphaMask_list) > 1
        and start_iter > cfg.update_AlphaMask_list[1]
    ):
        # the original run re-filtered the store at the second alpha-mask
        # event; reproduce that state from the restored mask
        allrays, allrgbs = filter_rays_alpha(
            allrays,
            allrgbs,
            state.alpha_mask,
            state.geometry.aabb_np,
            state.geometry.step_size,
            near_far,
        )
        print(f"[resume] store re-filtered to {allrays.shape[0]} rays")
        host_pool = pool_of(allrays.shape[0])
    sampler = SimpleSampler(
        allrays.shape[0],
        local_batch,
        cfg.seed + start_iter + jax.process_index(),
        pool=host_pool,
    )
    store_rays_d = put_store(allrays)
    store_rgbs_d = put_store(allrgbs)

    l1_weight = cfg.L1_weight_inital
    ratio = cfg.mask_ratio_list[0] if cfg.mask_ratio_list else 1.0
    if resume_extra is not None:
        # schedule position: weights/ratios as of the saved iteration, and
        # the upsample schedule advanced past already-applied events
        l1_weight = float(resume_extra.get("l1_weight", l1_weight))
        ratio = float(resume_extra.get("ratio", ratio))
        n_voxel_list = n_voxel_list[
            sum(1 for i in cfg.upsamp_list if i < start_iter):
        ]

    # Budget state with self-verification: each active budget auto-raises
    # (next multiple of 32, capped at the lattice) whenever its overflow
    # fraction shows the compaction dropping candidate samples — the
    # exactness contract of the fixed-shape compaction (VERDICT r1 #3;
    # reference semantics tensorBase.py:360-375).  Which budget is "active"
    # follows the phase (ADVICE r2: raise the one actually in effect):
    #   * strata_budgets when stratification is live (list, per stratum),
    #   * run_budget in an unstratified mask era,
    #   * prefilter_run in the mask-free phase.
    run_budget = cfg.sample_budget if cfg.sample_budget > 0 else 0
    prefilter_run = cfg.prefilter_budget if cfg.prefilter_budget > 0 else 0
    if resume_extra is not None:
        # auto-raised budgets carry over (re-raising would waste retraces)
        run_budget = int(resume_extra.get("run_budget", run_budget))
        prefilter_run = int(
            resume_extra.get("prefilter_run", prefilter_run)
        )
    strata_budgets: Optional[list] = None  # None = unstratified
    strata_alive_budgets: Optional[list] = None  # stage-2 exact-alive caps
    strata_n_samples: Optional[tuple] = None  # per-stratum chord lattices
    strata_loss_w: Optional[list] = None  # store-share loss weights
    overflow_strikes = [0]  # per active budget (len = n_strata or 1)

    # quota rounding keeps every per-stratum sub-batch evenly divisible
    # across the device mesh (split boundaries align with shards) AND
    # across processes: the smallest multiple of n_dev that is >= 8
    # (identical to max(8, n_dev) for power-of-two meshes) makes every
    # quota a multiple of n_dev, so q/n_proc is integral and itself a
    # multiple of the per-host device count — max(8, n_dev) alone breaks
    # at e.g. 3 hosts x 2 devices (quotas multiple of 8, not of 3)
    quota_round = n_dev * -(-8 // n_dev)

    def coarse_ok() -> bool:
        return coarse_gate_valid(
            state.alpha_mask, state.geometry.step_size, ndc_ray
        )

    def build_statics() -> TrainStatics:
        return TrainStatics(
            n_samples=state.n_samples,
            step_size=state.geometry.step_size,
            white_bg=white_bg,
            ndc_ray=ndc_ray,
            total_steps=cfg.n_iters,
            lr_factor=lr_factor,
            weights=LossWeights(
                ortho=cfg.Ortho_weight if "VM" in cfg.model_name else 0.0,
                l1=l1_weight,
                tv_density=cfg.TV_weight_density,
                tv_app=cfg.TV_weight_app,
                occ=cfg.occ_reg_loss_mult if (cfg.occ_reg or cfg.occ_reg_loss_mult > 0) else 0.0,
                occ_range=cfg.occ_reg_range,
                occ_wb_range=cfg.occ_wb_range,
                occ_wb_prior=bool(cfg.occ_wb_prior),
            ),
            free_reg=bool(cfg.free_reg),
            free_decomp=bool(cfg.free_decomp),
            freq_reg_ratio=float(cfg.freq_reg_ratio) * float(ratio),
            max_visible=(
                cfg.max_vis_freq_ratio if cfg.max_vis_freq_ratio > 0 else None
            ),
            # top-K appearance compaction only once the mask era starts:
            # pre-mask weights are diffuse (many samples above the shading
            # threshold), so a small K would truncate real contributions;
            # after the mask, weight mass concentrates on surfaces and K
            # covers every above-threshold sample.  prefilter_shade_top_k
            # (>0) opts the pre-mask era into a (typically larger) K —
            # the static analog of the reference's iter-0 weight
            # threshold (tensorBase.py:367-371).
            shade_top_k=(
                cfg.shade_top_k
                if cfg.shade_top_k > 0 and state.alpha_mask is not None
                else (
                    cfg.prefilter_shade_top_k
                    if cfg.prefilter_shade_top_k > 0
                    and state.alpha_mask is None
                    else None
                )
            ),
            fused=bool(cfg.fused_gathers),
            use_coarse_gate=coarse_ok(),
            from_store=True,
            strata_budgets=(
                tuple(strata_budgets) if strata_budgets is not None else None
            ),
            strata_alive_budgets=(
                tuple(strata_alive_budgets)
                if strata_alive_budgets is not None
                else None
            ),
            strata_n_samples=(
                tuple(strata_n_samples)
                if strata_n_samples is not None
                else None
            ),
            strata_loss_weights=(
                tuple(strata_loss_w) if strata_loss_w is not None else None
            ),
            strata_noise_match=bool(cfg.stratify_noise_match),
            # the per-ray budget only becomes exact once the alpha mask
            # culls most samples; before that every in-box sample is alive
            # and a budget would truncate rays mid-scene — unless the user
            # opts into a (monitored) mask-free `prefilter_budget` sized to
            # cover typical in-bbox chords (budget_overflow_frac reports
            # any truncation either way)
            sample_budget=(
                run_budget
                if (
                    state.alpha_mask is not None
                    and 0 < run_budget < state.n_samples
                )
                else (
                    prefilter_run
                    if (
                        state.alpha_mask is None
                        and 0 < prefilter_run < state.n_samples
                    )
                    else None
                )
            ),
        )

    def restratify(iteration: int) -> bool:
        """(Re)partition the ray store by per-ray candidate count and swap
        in the stratified sampler + per-stratum budgets (round-3 headline;
        reference economy matched: tensorBase.py:360-375 pays each ray's
        own alive count).  Returns True when stratification is active."""
        nonlocal sampler, strata_budgets, strata_alive_budgets
        nonlocal strata_n_samples, strata_loss_w, overflow_strikes

        def deactivate():
            # fall back to the plain sampler consistently: a stale
            # stratified sampler/budget pair must never outlive a store
            # refilter (treedef/shape mismatch with the step signature)
            nonlocal sampler, strata_budgets, strata_alive_budgets
            nonlocal strata_n_samples, strata_loss_w, overflow_strikes
            if strata_budgets is not None:
                strata_budgets = None
                strata_alive_budgets = None
                strata_n_samples = None
                strata_loss_w = None
                overflow_strikes = [0]
                sampler = SimpleSampler(
                    allrays.shape[0],
                    local_batch,
                    cfg.seed + iteration + jax.process_index(),
                    pool=host_pool,
                )

        if not cfg.stratify or ndc_ray:
            deactivate()
            return False
        if state.alpha_mask is None:
            # Mask-free prefilter phase: before the first alpha-mask event
            # every in-bbox sample is alive, so the per-ray bbox chord
            # length is the exact candidate count — stratify the store by
            # it so phase-A sub-batches pay ~the mean in-bbox count
            # instead of every ray paying the p99.9 prefilter budget
            # (counts depend only on static geometry: one pass, no mask).
            if not bool(cfg.stratify_prefilter):
                deactivate()
                return False
            counts = count_ray_inbbox(
                allrays,
                state.geometry.aabb_np,
                state.geometry.step_size,
                near_far,
                n_samples=state.n_samples,
            )
            # the in-bbox count IS the chord: the capped lattice alone
            # reproduces the budget compaction (samples start at the bbox
            # entry), so phase-A strata render unbudgeted at their chord
            # lattice — no top-k, no compaction row traffic at all
            chord_counts = counts
            alive_counts = None
        elif coarse_ok():
            if bool(cfg.stratify_alive):
                # alive-primary A/B path: needs the exact-gate alive
                # counts (one gathered row per lattice sample)
                counts, alive_counts, chord_counts = (
                    count_ray_candidates_and_alive(
                        allrays,
                        state.alpha_mask,
                        state.geometry.aabb_np,
                        state.geometry.step_size,
                        near_far,
                        n_samples=state.n_samples,
                    )
                )
            else:
                # production path: candidate strata + chord lattices only
                # — the probe-only pass touches one mask row per
                # COARSE_STRIDE samples and no (B, N, 3) lattice, ~5x
                # cheaper per schedule event on multi-million-ray stores
                counts, chord_counts = count_ray_candidates_and_chord(
                    allrays,
                    state.alpha_mask,
                    state.geometry.aabb_np,
                    state.geometry.step_size,
                    near_far,
                    n_samples=state.n_samples,
                )
                alive_counts = None
        else:
            # without a valid coarse gate the step selects candidates with
            # the exact gate (one stage) — no second compaction to size
            counts = count_ray_candidates(
                allrays,
                state.alpha_mask,
                state.geometry.aabb_np,
                state.geometry.step_size,
                near_far,
                n_samples=state.n_samples,
                use_coarse=False,
            )
            alive_counts = None
            chord_counts = None
        quantiles = (
            tuple(cfg.strata_quantiles) if cfg.strata_quantiles else None
        )
        if n_proc > 1:
            # alive-primary joint stratification is a single-host A/B tool
            # (default off, measured negative in r3)
            alive_counts = None
        if alive_counts is not None and bool(cfg.stratify_alive):
            # Alive-primary joint stratification: strata partitioned by
            # exact-alive count (what the expensive wide rows pay), each
            # stratum's candidate budget from its measured candidate max —
            # both compaction stages exact by construction.  Sizing stage 2
            # by per-stratum alive max over CANDIDATE strata instead leaves
            # it inert (the max ≈ the candidate budget in every stratum:
            # BENCH_PARAMS r3 alive_budgets came out all-zero).
            strata, budgets, alive_hints = stratify_rays_joint(
                counts, alive_counts, quantiles=quantiles
            )
        else:
            # Single- AND multi-host: the store is bit-identical on every
            # process (host disjointness is in ID space — host_ray_pool),
            # so this full-store plan IS the global plan: every host
            # derives the same edges/budgets/quotas and compiles the same
            # step program by construction (r3's histogram-sync path
            # — host_allsum of per-shard histograms — is superseded by
            # the identical-store invariant; stratify_edges remains the
            # shared pure-function core).
            strata, budgets = stratify_rays(counts, quantiles=quantiles)
            alive_hints = None
        quota_sizes = [s.size for s in strata]
        if len(strata) * quota_round > cfg.batch_size:
            print(f"[{iteration}] stratify skipped (batch too small)")
            deactivate()
            return False
        # GLOBAL quotas (= compiled sub-batch shapes); quota_round is a
        # multiple of the device count, so each quota splits evenly over
        # devices and over processes (n_proc divides n_dev)
        quotas = allocate_quotas(quota_sizes, cfg.batch_size, quota_round)
        strata_budgets = [
            b if b < state.n_samples else None for b in budgets
        ]
        # Per-stratum lattice caps: samples start at the bbox entry, so a
        # stratum whose longest member chord is C renders exactly on an
        # n_samples=C lattice — the fixed lattice work (sampling, probes,
        # window top-k) shrinks by C/n_samples per stratum.
        if chord_counts is not None:
            # lattice caps are static too; identical full-store strata on
            # every host make them identical without any cross-host max
            chord_max = np.asarray(
                [int(chord_counts[sel].max()) for sel in strata], np.int64
            )
            strata_n_samples = tuple(
                min(state.n_samples, _budget_hint(int(c)))
                for c in chord_max
            )
        else:
            strata_n_samples = None
        # Stage-2 exact-alive budgets only where they undercut the (still
        # active) candidate budget — the compaction's own row traffic must
        # be amortized
        if alive_hints is not None:
            strata_alive_budgets = [
                a if (a is not None and b is not None and a < b) else None
                for a, b in zip(alive_hints, strata_budgets)
            ]
            if not any(a is not None for a in strata_alive_budgets):
                strata_alive_budgets = None
        else:
            strata_alive_budgets = None
        overflow_strikes = [0] * len(strata)
        # store-share loss weights: quotas are rounded/floored to mesh
        # multiples, so per-ray inclusion probability deviates from
        # uniform on small strata — weighting each stratum's loss by its
        # STORE share keeps the gradient estimator exactly the uniform-
        # sampling expectation the reference optimizes (train.py:44-56)
        total_sz = float(sum(quota_sizes))
        strata_loss_w = [s / total_sz for s in quota_sizes]
        if n_proc > 1:
            # localize: host p draws quota/n_proc ids per stratum from the
            # pool slice of the (global) stratum; global_ids_from_local
            # concatenates the per-host draws back into the compiled
            # global sub-batch shapes
            sampler = StratifiedSampler(
                localize_strata(strata, counts, host_pool, state.n_samples),
                [q // n_proc for q in quotas],
                cfg.seed + iteration + jax.process_index(),
            )
        else:
            sampler = StratifiedSampler(
                strata, quotas, cfg.seed + iteration + jax.process_index()
            )
        alive_note = (
            f", mean alive {alive_counts.mean():.1f}"
            if alive_counts is not None
            else ""
        )
        print(
            f"[{iteration}] stratified ray store: sizes "
            f"{[s.size for s in strata]}, quotas {quotas}, "
            f"budgets {strata_budgets}, alive budgets "
            f"{strata_alive_budgets}, lattices "
            f"{list(strata_n_samples) if strata_n_samples else None} "
            f"(lattice {state.n_samples}, "
            f"mean cand {counts.mean():.1f}, p99.9 "
            f"{np.quantile(counts, 0.999):.0f}{alive_note})"
        )
        return True

    def restore_sampling_state() -> bool:
        """Bit-exact resume (single-host): restore the live stratification
        plan + sampler RNG/permutation states saved by save_ckpt, instead
        of re-deriving strata from CURRENT params (which differ from the
        event-time params a clean run stratified on) and reseeding.
        Returns False — caller restratifies — when the ckpt predates this
        feature, the store changed shape, or the run is multi-host."""
        nonlocal sampler, strata_budgets, strata_alive_budgets
        nonlocal strata_n_samples, strata_loss_w, overflow_strikes
        if resume_extra is None or n_proc > 1:
            return False
        meta = resume_extra.get("sampler")
        if not meta:
            return False
        try:
            aux = load_aux(cfg.ckpt_path)
            if meta["kind"] == "stratified":
                n = len(meta["samplers"])
                strata = [
                    np.asarray(aux[f"sampler/strata/{i}"], np.int64)
                    for i in range(n)
                ]
                if any(
                    s.size and int(s.max()) >= allrays.shape[0]
                    for s in strata
                ):
                    raise ValueError("saved strata exceed the ray store")
                quotas = [int(q) for q in meta["quotas"]]
                if sum(quotas) != local_batch:
                    raise ValueError("saved quotas do not sum to the batch")
                smp = StratifiedSampler(strata, quotas, cfg.seed)
                smp.set_state(meta, [
                    aux.get(f"sampler/ids/{i}") for i in range(n)
                ])
            else:
                smp = SimpleSampler(
                    allrays.shape[0], local_batch, cfg.seed, pool=host_pool
                )
                smp.set_state(meta, aux.get("sampler/ids"))
            sampler = smp
            strata_budgets = resume_extra.get("strata_budgets")
            strata_alive_budgets = resume_extra.get("strata_alive_budgets")
            sns = resume_extra.get("strata_n_samples")
            strata_n_samples = tuple(sns) if sns else None
            strata_loss_w = resume_extra.get("strata_loss_w")
            overflow_strikes = list(
                resume_extra.get("overflow_strikes", [0])
            )
            kind = meta["kind"]
            print(f"[resume] sampling state restored ({kind}) — bit-exact")
            return True
        except (KeyError, ValueError) as e:
            print(f"[resume] sampling-state restore failed ({e}); "
                  "restratifying instead")
            return False

    # partition the store up front: by in-bbox chord counts in the
    # prefilter phase, by mask candidate counts when resumed mid-schedule
    # (or restored verbatim from the ckpt for bit-exact resume)
    if start_iter < cfg.n_iters:
        if not restore_sampling_state():
            restratify(start_iter)
        step_fn = make_train_step(
            model, model_cfg, build_statics(), optimizer
        )
    else:
        # resume of a FINISHED run: skip straight to finalization — no
        # count pass / step compile (renewed wedge exposure for zero work)
        step_fn = None

    def make_handle() -> RendererHandle:
        return RendererHandle(
            model=model,
            cfg=model_cfg,
            params=state.params,
            alpha_mask=state.alpha_mask,
            aabb=jnp.asarray(state.geometry.aabb_np),
            step_size=state.geometry.step_size,
            n_samples=state.n_samples,
            white_bg=white_bg,
            ndc_ray=ndc_ray,
            shade_top_k=cfg.shade_top_k if cfg.shade_top_k > 0 else None,
            fused=bool(cfg.fused_gathers),
            use_coarse_gate=coarse_ok(),
            # serving-side stratification has its own per-bucket budgets;
            # the fixed budget only applies on the uniform fallback path
            stratified=bool(cfg.stratify_render) and not ndc_ray,
            # eval rides the same ray-batch DP mesh as training
            mesh=mesh if n_dev > 1 else None,
            sample_budget=(
                run_budget
                if (
                    state.alpha_mask is not None
                    and 0 < run_budget < state.n_samples
                )
                else None
            ),
        )

    def save_ckpt(path: str, iteration: Optional[int] = None):
        """``iteration`` set -> a resumable checkpoint: schedule position +
        optimizer state ride along (--resume 1 wedge recovery).

        Multi-host: only process 0 writes (params are replicated, so the
        content is identical everywhere; concurrent same-path writes on a
        shared filesystem could corrupt the file resume depends on)."""
        if jax.process_index() != 0:
            return
        extra = None
        opt = None
        aux = None
        if iteration is not None:
            extra = {
                "iteration": int(iteration),
                "n_samples": int(state.n_samples),
                "l1_weight": float(l1_weight),
                "ratio": float(ratio),
                "lr_scale": float(lr_scale_cur),
                "run_budget": int(run_budget),
                "prefilter_run": int(prefilter_run),
            }
            opt = jax.device_get(state.opt_state)
            if n_proc == 1:
                # single-host bit-exact resume: the live stratification
                # plan + sampler RNG/permutation states ride along, so
                # --resume 1 replays the clean run's draw stream exactly
                # (multi-host keeps the reseed path: per-host sampler
                # state can't live in the one ckpt process 0 writes)
                extra["strata_budgets"] = strata_budgets
                extra["strata_alive_budgets"] = strata_alive_budgets
                extra["strata_n_samples"] = (
                    list(strata_n_samples)
                    if strata_n_samples is not None else None
                )
                extra["strata_loss_w"] = strata_loss_w
                extra["overflow_strikes"] = list(overflow_strikes)
                aux = {}
                if isinstance(sampler, StratifiedSampler):
                    meta, strata_arrays, idss = sampler.get_state()
                    extra["sampler"] = {"kind": "stratified", **meta}
                    for i, s in enumerate(strata_arrays):
                        aux[f"sampler/strata/{i}"] = s
                    for i, ids in enumerate(idss):
                        if ids is not None:
                            aux[f"sampler/ids/{i}"] = ids
                else:
                    meta, ids = sampler.get_state()
                    extra["sampler"] = {"kind": "simple", **meta}
                    if ids is not None:
                        aux["sampler/ids"] = ids
                for k, v in history.items():
                    aux[f"history/{k}"] = np.asarray(v)
        save_checkpoint(
            path,
            model_cfg,
            jax.device_get(state.params),
            state.geometry.aabb_np,
            state.geometry.grid_size,
            state.alpha_mask,
            extra=extra,
            opt_state=opt,
            aux=aux,
        )

    # ---- the loop (train.py:296-485, intended semantics) ----
    history = defaultdict(list)
    if resume_extra is not None:
        # continuity of the observability record: resumable ckpts carry
        # the history rows accumulated before the kill, so the final
        # history.npz spans the whole run, not just the resumed tail
        for k, v in load_aux(cfg.ckpt_path).items():
            if k.startswith("history/"):
                history[k[len("history/"):]] = list(np.asarray(v))
    psnrs_window, psnrs_test = [], [0.0]
    run_tic = time.time()
    rays_done = 0
    aabb_j = put_rep(state.geometry.aabb_np)

    # in-loop continuation of the setup-phase watchdog armed at function
    # entry: from here on it beats once per iteration
    watchdog.resume_hint = (
        f"python train.py ... --resume 1 (logfolder {logfolder})"
    )
    watchdog.beat()

    for iteration in range(start_iter, cfg.n_iters):
        watchdog.beat()
        ids = sampler.nextids()
        # only the int32 ids cross the host link; the ray/rgb rows are
        # gathered on device from the resident store inside the step
        if isinstance(ids, tuple):
            ids_d = tuple(put_batch(i.astype(np.int32)) for i in ids)
        else:
            ids_d = put_batch(ids.astype(np.int32))
        sub = jax.random.fold_in(base_key, iteration)

        if cfg.profile_dir and iteration == cfg.profile_start:
            jax.profiler.start_trace(cfg.profile_dir)
        with jax.profiler.StepTraceAnnotation("train", step_num=iteration):
            state.params, state.opt_state, metrics = step_fn(
                state.params,
                state.opt_state,
                state.alpha_mask,
                aabb_j,
                store_rays_d,
                store_rgbs_d,
                ids_d,
                jnp.asarray(iteration, jnp.int32),
                sub,
            )
        if (
            cfg.profile_dir
            and iteration == cfg.profile_start + cfg.profile_steps
        ):
            jax.device_get(metrics["mse"])  # flush pending work
            jax.profiler.stop_trace()
            print(f"[profile] trace written to {cfg.profile_dir}")
        rays_done += cfg.batch_size

        if iteration % cfg.progress_refresh_rate == 0:
            m = jax.device_get(metrics)
            psnrs_window.append(float(m["psnr"]))
            writer.add_scalar("train/PSNR", float(m["psnr"]), iteration)
            writer.add_scalar("train/mse", float(m["mse"]), iteration)
            for k in ("reg_ortho", "reg_l1", "reg_tv_density", "reg_tv_app",
                      "reg_occ"):
                if k in m:
                    writer.add_scalar(f"train/{k}", float(m[k]), iteration)
            writer.add_scalar(
                "train/mean_alive_samples",
                float(m.get("mean_alive_samples", 0.0)), iteration,
            )
            overflow = float(m.get("budget_overflow_frac", 0.0))
            writer.add_scalar("train/budget_overflow_frac", overflow, iteration)
            # Per-budget overflow bookkeeping; persistent overflow
            # auto-raises the budget ACTUALLY in effect this phase
            # (ADVICE r2: the old code raised run_budget even when the
            # mask-free prefilter budget was the one overflowing).
            if strata_budgets is not None:
                per_budget = np.asarray(m["stratum_overflow"], np.float64)
            else:
                per_budget = np.asarray([overflow])
            if len(overflow_strikes) != len(per_budget):
                overflow_strikes = [0] * len(per_budget)
            raised = []
            for s, o in enumerate(per_budget):
                if float(o) > 0.01:
                    overflow_strikes[s] += 1
                    print(
                        f"[budget] overflow on {float(o):.1%} of rays at "
                        f"iteration {iteration} "
                        + (
                            f"(stratum {s}, budget {strata_budgets[s]})"
                            if strata_budgets is not None
                            else f"(budget {run_budget if state.alpha_mask is not None else prefilter_run})"
                        ),
                        flush=True,
                    )
                else:
                    overflow_strikes[s] = 0
                    continue
                if overflow_strikes[s] < 2:
                    continue
                overflow_strikes[s] = 0

                def _ceil32(b):
                    return int(np.ceil(b * 1.5 / 32) * 32)

                if strata_budgets is not None:
                    b = strata_budgets[s]
                    if b:
                        nb = _ceil32(b)
                        strata_budgets[s] = (
                            nb if nb < state.n_samples else None
                        )
                        raised.append(f"stratum {s} -> {strata_budgets[s]}")
                    # per-stratum overflow reports both stages combined, so
                    # raise the stage-2 alive cap alongside (dropped when it
                    # no longer undercuts the candidate budget)
                    if (
                        strata_alive_budgets is not None
                        and strata_alive_budgets[s]
                    ):
                        na = _ceil32(strata_alive_budgets[s])
                        cb = strata_budgets[s]
                        strata_alive_budgets[s] = (
                            na if (cb is not None and na < cb) else None
                        )
                        if not any(
                            a is not None for a in strata_alive_budgets
                        ):
                            strata_alive_budgets = None
                        raised.append(
                            f"stratum {s} alive -> "
                            + str(
                                strata_alive_budgets[s]
                                if strata_alive_budgets is not None
                                else None
                            )
                        )
                elif (
                    state.alpha_mask is not None
                    and 0 < run_budget < state.n_samples
                ):
                    run_budget = min(state.n_samples, _ceil32(run_budget))
                    raised.append(f"sample_budget -> {run_budget}")
                elif (
                    state.alpha_mask is None
                    and 0 < prefilter_run < state.n_samples
                ):
                    prefilter_run = min(
                        state.n_samples, _ceil32(prefilter_run)
                    )
                    raised.append(f"prefilter_budget -> {prefilter_run}")
            if raised:
                step_fn = make_train_step(
                    model, model_cfg, build_statics(), optimizer
                )
                print(
                    f"[budget] auto-raised {', '.join(raised)} at "
                    f"iteration {iteration} (re-trace)",
                    flush=True,
                )
            elapsed = time.time() - run_tic
            print(
                f"Iteration {iteration:05d}: "
                f"train_psnr = {np.mean(psnrs_window):.2f} "
                f"test_psnr = {np.mean(psnrs_test):.2f} "
                f"mse = {float(m['mse']):.6f} "
                f"rays/s = {rays_done / max(elapsed, 1e-9):,.0f} "
                f"elapsed = {elapsed:.1f}s",
                flush=True,
            )
            psnrs_window = psnrs_window[-50:]

        # ---- periodic eval + progress figure (train.py:411-445) ----
        # test-PSNR eval (vis_every) and progress-figure dump
        # (train_vis_every) are independent knobs here; the reference ties
        # both to one condition (train.py:411), which silently skips test
        # PSNR when the two settings diverge.
        do_test_eval = (
            cfg.vis_every > 0 and iteration % cfg.vis_every == 0 and iteration > 0
        )
        do_train_vis = (
            cfg.train_vis_every > 0
            and iteration % cfg.train_vis_every == 0
            and iteration > 0
        )
        if do_test_eval or do_train_vis:
            handle = make_handle()
            if do_test_eval:
                psnrs_test = psnrs_calculate(
                    handle, test_dataset, chunk=cfg.batch_size,
                    heartbeat=watchdog.beat,
                ) or [0.0]
                writer.add_scalar("test/psnr", np.mean(psnrs_test), iteration)
        if do_train_vis:
            history["iteration"].append(iteration)
            history["train_psnr"].append(
                round(float(np.mean(psnrs_window or [0])), 2)
            )
            history["test_psnr"].append(round(float(np.mean(psnrs_test)), 2))
            history["mse"].append(
                round(float(jax.device_get(metrics)["mse"]), 5)
            )
            # progress-GIF frames are a single-host nicety: skipping on ALL
            # processes keeps multi-host lockstep (a process-0-only render
            # would hang the others at the sharded-chunk collectives)
            if train_gift is not None and n_proc == 1:
                save_rendered_image_per_train(
                    train_gift,
                    test_gift,
                    handle,
                    iteration,
                    history,
                    savePath=f"{logfolder}/gif/",
                    chunk=cfg.batch_size,
                )

        rebuild = False

        # ---- alpha-mask events (train.py:450-463, intended) ----
        if iteration in cfg.update_AlphaMask_list:
            gs = state.geometry.grid_size
            if int(np.prod(gs)) < 256**3:
                reso_mask = gs
            else:
                reso_mask = tuple(min(g, 256) for g in gs)
            den_mask = None
            if cfg.free_reg and cfg.free_decomp:
                den_mask = tuple(
                    np.asarray(m)
                    for m in free_masks(
                        model_cfg.pos_bit_length,
                        model_cfg.view_bit_length,
                        model_cfg.fea_bit_length,
                        model_cfg.density_n_comp,
                        model_cfg.app_n_comp,
                        jnp.asarray(iteration),
                        cfg.n_iters,
                        float(cfg.freq_reg_ratio) * float(ratio),
                    ).den
                )
                den_mask = tuple(jnp.asarray(m) for m in den_mask)
            state.alpha_mask, new_aabb, occ_ratio = update_alpha_mask(
                model,
                model_cfg,
                state.params,
                state.alpha_mask,
                state.geometry.aabb_np,
                reso_mask,
                state.geometry.step_size,
                den_mask,
            )
            print(
                f"[{iteration}] alpha mask updated "
                f"(occupancy {occ_ratio*100:.2f}%), new bbox {new_aabb.tolist()}"
            )
            if iteration == cfg.update_AlphaMask_list[0]:
                # shrink the factors to the tight bbox (tensoRF.py:290-327)
                old = state.geometry
                units = old.units
                t_l = np.round(
                    np.round((new_aabb[0] - old.aabb_np[0]) / units)
                ).astype(np.int64)
                b_r = np.round((new_aabb[1] - old.aabb_np[0]) / units).astype(
                    np.int64
                ) + 1
                b_r = np.minimum(b_r, np.asarray(old.grid_size))
                state.params = model.shrink(
                    model_cfg, jax.device_get(state.params),
                    tuple(t_l.tolist()), tuple(b_r.tolist()),
                )
                # aabb correction when the mask grid differs (tensoRF.py:317-323)
                gs_arr = np.asarray(old.grid_size, np.float64)
                t_l_r = t_l / (gs_arr - 1)
                b_r_r = (b_r - 1) / (gs_arr - 1)
                corrected = np.stack(
                    [
                        (1 - t_l_r) * old.aabb_np[0] + t_l_r * old.aabb_np[1],
                        (1 - b_r_r) * old.aabb_np[0] + b_r_r * old.aabb_np[1],
                    ]
                )
                new_size = tuple((b_r - t_l).tolist())
                state.geometry = GridGeometry.create(
                    corrected, new_size, cfg.step_ratio
                )
                aabb_j = put_rep(state.geometry.aabb_np)
                # param shapes changed -> fresh optimizer state
                lr_scale_cur = 1.0
                optimizer, state.opt_state = make_optimizer(
                    state.params, cfg.lr_init, cfg.lr_basis, lr_factor
                )
                rebuild = True
                print(
                    f"[{iteration}] shrink -> grid {new_size}, "
                    f"aabb {corrected.tolist()}"
                )
            if (
                not ndc_ray
                and len(cfg.update_AlphaMask_list) > 1
                and iteration == cfg.update_AlphaMask_list[1]
            ):
                allrays, allrgbs = filter_rays_alpha(
                    allrays,
                    allrgbs,
                    state.alpha_mask,
                    state.geometry.aabb_np,
                    state.geometry.step_size,
                    near_far,
                )
                store_rays_d = put_store(allrays)
                store_rgbs_d = put_store(allrgbs)
                host_pool = pool_of(allrays.shape[0])
                # keep per-host seed decorrelation after reseeding
                # (ADVICE r2); restratify() below re-partitions the new
                # store when stratification is on
                sampler = SimpleSampler(
                    allrays.shape[0],
                    local_batch,
                    cfg.seed + iteration + jax.process_index(),
                    pool=host_pool,
                )
                rebuild = True
            # L1 weight switches after the first alpha-mask event (upstream
            # TensoRF behavior; flags L1_weight_rest at opt.py:50).
            if l1_weight != cfg.L1_weight_rest and cfg.L1_weight_rest >= 0:
                l1_weight = cfg.L1_weight_rest
                rebuild = True
            if state.alpha_mask is not None and not rebuild:
                rebuild = True  # treedef change (None -> mask) retraces anyway

        # ---- voxel upsampling events (train.py:467-480, intended) ----
        if iteration in cfg.upsamp_list:
            if len(cfg.upsamp_list) == len(cfg.mask_ratio_list):
                ratio = cfg.mask_ratio_list[cfg.upsamp_list.index(iteration)]
            n_voxels = n_voxel_list.pop(0)
            new_grid = n_to_reso(n_voxels, state.geometry.aabb_np)
            state.n_samples = min(
                int(cfg.nSamples),
                cal_n_samples(new_grid, cfg.step_ratio),
            )
            state.params = model.upsample(
                model_cfg, jax.device_get(state.params), new_grid
            )
            state.geometry = GridGeometry.create(
                state.geometry.aabb_np, new_grid, cfg.step_ratio
            )
            aabb_j = put_rep(state.geometry.aabb_np)

            if cfg.lr_upsample_reset:
                lr_scale = 1.0
            else:
                lr_scale = cfg.lr_decay_target_ratio ** (
                    iteration / cfg.n_iters
                )
            lr_scale_cur = lr_scale
            optimizer, state.opt_state = make_optimizer(
                state.params,
                cfg.lr_init * lr_scale,
                cfg.lr_basis * lr_scale,
                lr_factor,
            )
            rebuild = True
            print(f"[{iteration}] upsampled to {new_grid}")

        if rebuild:
            # any schedule event that changed the mask/geometry also moves
            # per-ray candidate counts -> re-partition the store (the
            # count pass is chunked and jitted; a few seconds per event)
            restratify(iteration)
            if n_dev > 1:
                state.params = replicate(mesh, state.params)
                state.opt_state = replicate(mesh, state.opt_state)
            step_fn = make_train_step(
                model, model_cfg, build_statics(), optimizer
            )

        # ---- periodic checkpoints (train.py:482-483) ----
        if iteration in (cfg.save_ckpt_every or []):
            save_ckpt(
                f"{logfolder}/{iteration//1000}k_{cfg.expname}.npz",
                iteration=iteration,
            )

    # ---- finalization (train.py:487-544) ----
    # finalization still issues heavy device work (final ckpt device_get,
    # full test-set eval) — keep the watchdog armed with a per-image
    # heartbeat so a late wedge exits resumable (resume of a finished run
    # skips straight back here) instead of hanging the supervisor forever
    watchdog.beat()
    final_path = f"{logfolder}/final_{cfg.expname}.npz"
    # carries its position too: --resume on a finished run skips straight
    # to finalization instead of retraining from the last periodic ckpt
    save_ckpt(final_path, iteration=cfg.n_iters - 1)
    watchdog.beat()
    elapsed = time.time() - run_tic
    if jax.process_index() == 0:
        np.savetxt(f"{logfolder}/training_time.txt", np.asarray([elapsed]))
    print(f"Total time {elapsed:.2f}s.")

    handle = make_handle()
    if cfg.render_train:
        os.makedirs(f"{logfolder}/imgs_train_all", exist_ok=True)
        ds = dataset_cls(
            cfg.datadir,
            split="train",
            downsample=cfg.downsample_train,
            is_stack=True,
        )
        p = evaluation(
            ds, handle, f"{logfolder}/imgs_train_all/",
            heartbeat=watchdog.beat,
        )
        print(f"======> {cfg.expname} train all psnr: {np.mean(p)} <========")
    if cfg.render_test:
        os.makedirs(f"{logfolder}/imgs_test_all", exist_ok=True)
        p = evaluation(
            test_dataset, handle, f"{logfolder}/imgs_test_all/",
            heartbeat=watchdog.beat,
        )
        if p:
            writer.add_scalar("test/psnr_all", np.mean(p), cfg.n_iters)
            print(
                f"======> {cfg.expname} test all psnr: {np.mean(p)} <========"
            )
    if cfg.render_path and hasattr(test_dataset, "render_path"):
        os.makedirs(f"{logfolder}/imgs_path_all", exist_ok=True)
        evaluation_path(
            test_dataset,
            handle,
            test_dataset.render_path,
            f"{logfolder}/imgs_path_all/",
            heartbeat=watchdog.beat,
        )

    watchdog.stop()
    if jax.process_index() == 0:
        np.savez(
            f"{logfolder}/history.npz",
            **{k: np.asarray(v) for k, v in history.items()},
        )
        create_gif(
            f"{logfolder}/gif/plot/vis_every", f"{logfolder}/gif/training.gif"
        )
    writer.close()
    return final_path


def render_test(cfg: TrainConfig):
    """Render-only entry (reference train.py:77-165)."""
    ckpt = cfg.ckpt or cfg.ckpt_path
    if not ckpt or not os.path.exists(ckpt):
        print("the ckpt path does not exists!!")
        return
    model_cfg, params, aabb, grid_size, alpha_mask, _ = load_checkpoint(ckpt)
    model = FIELD_MODELS[model_cfg.model_name]
    geometry = GridGeometry.create(aabb, grid_size, model_cfg.step_ratio)

    dataset_cls = dataset_dict[cfg.dataset_name]
    test_dataset = dataset_cls(
        cfg.datadir,
        split="test",
        downsample=cfg.downsample_train,
        is_stack=True,
    )
    handle = RendererHandle(
        model=model,
        cfg=model_cfg,
        params=params,
        alpha_mask=alpha_mask,
        aabb=jnp.asarray(geometry.aabb_np),
        step_size=geometry.step_size,
        n_samples=min(int(cfg.nSamples), geometry.n_samples),
        white_bg=test_dataset.white_bg,
        ndc_ray=bool(cfg.ndc_ray),
        shade_top_k=cfg.shade_top_k if cfg.shade_top_k > 0 else None,
        # same fast path as the in-training renderer: packed fused gathers
        # plus candidate-count-stratified per-bucket budgets (fallback:
        # the mask-gated fixed per-ray budget)
        fused=bool(cfg.fused_gathers),
        use_coarse_gate=coarse_gate_valid(
            alpha_mask, geometry.step_size, bool(cfg.ndc_ray)
        ),
        stratified=bool(cfg.stratify_render) and not cfg.ndc_ray,
        sample_budget=(
            cfg.sample_budget
            if (alpha_mask is not None and cfg.sample_budget > 0)
            else None
        ),
    )
    logfolder = os.path.dirname(ckpt)
    if cfg.render_train:
        train_ds = dataset_cls(
            cfg.datadir,
            split="train",
            downsample=cfg.downsample_train,
            is_stack=True,
        )
        os.makedirs(f"{logfolder}/imgs_train_all", exist_ok=True)
        p = evaluation(train_ds, handle, f"{logfolder}/imgs_train_all/")
        print(f"======> {cfg.expname} train all psnr: {np.mean(p)} <========")
    if cfg.render_test:
        os.makedirs(f"{logfolder}/imgs_test_all", exist_ok=True)
        p = evaluation(test_dataset, handle, f"{logfolder}/imgs_test_all/")
        print(f"======> {cfg.expname} test all psnr: {np.mean(p)} <========")
    if cfg.render_path and hasattr(test_dataset, "render_path"):
        os.makedirs(f"{logfolder}/imgs_path_all", exist_ok=True)
        evaluation_path(
            test_dataset,
            handle,
            test_dataset.render_path,
            f"{logfolder}/imgs_path_all/",
        )


def export_mesh(cfg: TrainConfig, ckpt_path: Optional[str] = None):
    """Mesh-export entry (reference train.py:59-74)."""
    ckpt = ckpt_path or cfg.ckpt or cfg.ckpt_path
    model_cfg, params, aabb, grid_size, alpha_mask, _ = load_checkpoint(ckpt)
    model = FIELD_MODELS[model_cfg.model_name]
    geometry = GridGeometry.create(aabb, grid_size, model_cfg.step_ratio)
    alpha, _ = compute_alpha_grid(
        model,
        model_cfg,
        params,
        alpha_mask,
        geometry.aabb_np,
        geometry.grid_size,
        geometry.step_size,
    )
    out = ckpt.rsplit(".", 1)[0] + ".ply"
    convert_alpha_samples_to_ply(alpha, out, geometry.aabb_np, level=0.005)
    return out
