"""Unified configuration schema.

The reference carries two parallel config systems — a ~70-flag
configargparse surface (opt.py:3-163) and a hydra/OmegaConf yaml
(configs/config.yaml) — with overlapping keys.  Here one dataclass holds the
union of both surfaces; the frontends (txt / yaml / CLI) all populate it.
Field names and defaults follow opt.py (and config.yaml where the two
disagree on defaults the yaml wins for yaml-loaded runs by explicit keys).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

from ..models.config import ModelConfig


@dataclasses.dataclass
class TrainConfig:
    # --- experiment / logging (opt.py:6-10, 150-159) ---
    expname: str = "exp"
    basedir: str = "./log"
    add_timestamp: int = 0
    datadir: str = "./data/llff/fern"
    progress_refresh_rate: int = 10
    N_vis: int = 5
    vis_every: int = 1000
    train_vis_every: int = 1000
    save_ckpt_every: List[int] = dataclasses.field(default_factory=list)
    overwrt: bool = False

    # --- few-shot image selection (opt.py:13-17, config.yaml:18-20) ---
    N_train_imgs: int = 0
    N_test_imgs: int = 0
    train_idxs: List[int] = dataclasses.field(default_factory=list)
    test_idxs: List[int] = dataclasses.field(default_factory=list)
    val_idxs: List[int] = dataclasses.field(default_factory=list)
    train_images: Optional[List[int]] = None  # hydra-surface aliases
    test_images: Optional[List[int]] = None
    val_images: Optional[List[int]] = None

    # --- data (opt.py:19-31) ---
    with_depth: bool = False
    downsample_train: float = 1.0
    downsample_test: float = 1.0
    dataset_name: str = "blender"
    object_name: str = ""

    # --- model (opt.py:23-24, 80-105) ---
    model_name: str = "TensorVMSplit"
    batch_size: int = 4096
    n_iters: int = 30000
    n_lamb_sigma: List[int] = dataclasses.field(
        default_factory=lambda: [16, 16, 16]
    )
    n_lamb_sh: List[int] = dataclasses.field(
        default_factory=lambda: [48, 48, 48]
    )
    data_dim_color: int = 27
    rm_weight_mask_thre: float = 0.0001
    alpha_mask_thre: float = 0.0001
    alphaMask_thres: Optional[float] = None  # yaml alias
    distance_scale: float = 25.0
    density_shift: float = -10.0
    shadingMode: str = "MLP_PE"
    pos_pe: int = 6
    view_pe: int = 6
    fea_pe: int = 6
    featureC: int = 128

    # --- learning rates (opt.py:36-45) ---
    lr_init: float = 0.02
    lr_basis: float = 1e-3
    lr_decay_iters: int = -1
    lr_decay_target_ratio: float = 0.1
    lr_upsample_reset: int = 1

    # --- losses (opt.py:48-57) ---
    L1_weight_inital: float = 0.0
    L1_weight_rest: float = 0.0
    Ortho_weight: float = 0.0
    TV_weight_density: float = 0.0
    TV_weight_app: float = 0.0

    # --- FreeNeRF (opt.py:59-67) ---
    free_reg: bool = False
    free_decomp: bool = False
    freq_reg_ratio: float = 1.0
    mask_ratio_list: List[float] = dataclasses.field(
        default_factory=lambda: [1.0]
    )
    max_vis_freq_ratio: float = 0.0

    # --- occlusion regularizer (opt.py:69-78) ---
    occ_reg: bool = False
    occ_reg_loss_mult: float = 0.0
    occ_reg_range: int = 0
    occ_wb_range: int = 0
    occ_wb_prior: bool = False

    # --- rendering (opt.py:108-131) ---
    ckpt: Optional[str] = None
    ckpt_path: Optional[str] = None
    render_only: int = 0
    render_test: int = 0
    render_train: int = 0
    render_path: int = 0
    export_mesh: int = 0
    lindisp: bool = False
    perturb: float = 1.0
    accumulate_decay: float = 0.998
    fea2denseAct: str = "softplus"
    ndc_ray: int = 0
    nSamples: int = 1_000_000
    step_ratio: float = 0.5
    white_bkgd: bool = False

    # --- voxel schedule (opt.py:133-138) ---
    N_voxel_init: int = 100**3
    N_voxel_final: int = 300**3
    upsamp_list: List[int] = dataclasses.field(default_factory=list)
    update_AlphaMask_list: List[int] = dataclasses.field(default_factory=list)
    idx_view: int = 0
    occ_grid_reso: int = 0

    # --- TPU-specific knobs (new surface) ---
    fused_gathers: bool = True  # packed footprint gathers (fast path)
    sample_budget: int = 0  # 0 = all samples; >0 = per-ray alive-sample cap
    shade_top_k: int = 0  # 0 = shade all samples; >0 = top-K compaction
    # Pre-mask (prefilter-era) top-K appearance compaction.  0 keeps the
    # round-2 behavior (shade every in-bbox sample until the first alpha
    # mask); >0 applies the top-K split from iter 0 — the reference itself
    # thresholds appearance by weight from the first step
    # (tensorBase.py:367-371 app_mask = weight > rayMarch_weight_thres),
    # so a generous pre-mask K is the static analog, and the pre-mask
    # app half is ~86 ms of the 167 ms phase-A step (ABLATE_STEP_r05).
    # Default 64: measured 166.6 -> 91.4 ms/step on v5e (ablate_A_topk64)
    # at +1.07 dB on the verify drive (32.52 vs 31.45; configs pin 0 where
    # a running A/B's earlier arms used the old default).
    prefilter_shade_top_k: int = 64
    compute_dtype: str = "float32"  # shading MLP compute dtype
    grid_dtype: str = "float32"  # factor-grid gather/scatter compute dtype
    # one-hot-lerp matrix dtype for line matmul sampling (bf16 halves the
    # step's largest materialized intermediate; planes stay grid_dtype)
    line_dtype: str = "float32"
    # Per-ray candidate cap in the mask-free phase (iters before the first
    # alphaMask event); 0 = use sample_budget there too only if set.
    prefilter_budget: int = 0
    # Alive-count-stratified ray batching (round 3): at each schedule event
    # partition the ray store by per-ray candidate count and render
    # per-stratum sub-batches at their own candidate budgets inside one
    # jitted step (per-sample work ~ the store MEAN instead of the p99.9 a
    # single fixed budget pays).  0 = single batch + sample_budget.
    stratify: int = 1
    # empty = cost-optimal DP partition (render/culling.py::_optimal_edges);
    # a quantile list forces explicit stratum edges.
    strata_quantiles: List[float] = dataclasses.field(default_factory=list)
    # Noise-matched stratification (default on): per-step stratum loss
    # weights drawn m/B, m ~ Multinomial(B, store shares) inside jit, so
    # the gradient estimator carries the SAME between-strata composition
    # noise as the reference's uniform sampler (quota-fixed batches
    # measured 0.71x the uniform gradient noise — scripts/grad_noise.py —
    # and the round-4 few-shot quality A/B showed the quieter estimator
    # generalizing ~0.9 dB worse at matched seeds).  0 = fixed weights.
    stratify_noise_match: int = 1
    # Stratified serving: bucket eval/render rays by candidate count and
    # render each bucket at its own budget (exact by construction).
    stratify_render: int = 1
    # Stratify the mask-free prefilter phase by per-ray in-bbox chord
    # counts (closed-form from static geometry, one pass at startup): the
    # warm-up sub-batches then pay ~the mean in-bbox count instead of the
    # p99.9 the single prefilter_budget must cover.
    stratify_prefilter: int = 1
    # Alive-primary joint stratification: partition the store by EXACT-ALIVE
    # count and run a second per-stratum compaction to the alive budget
    # before the per-sample footprint ops (stage-1 candidate budgets then
    # come from per-stratum candidate maxima).  Measured on v5e it is a
    # wash for TensorVMSplit (119.1 vs 118.9 ms) and a regression for
    # TensorCP (48.0 vs 32.8 ms): per-row gather/scatter cost is nearly
    # width-flat (SCATTER_RECHECK_r03.txt), so total rows moved — which the
    # looser stage-1 budgets increase — dominates what the tighter stage-2
    # budget saves.  Default OFF; candidate-primary single-stage budgets
    # are the measured optimum.
    stratify_alive: int = 0
    n_devices: int = 0  # 0 = all visible devices (ray-batch DP)
    distributed: bool = False  # jax.distributed.initialize() (multi-host)
    # --- failure detection / recovery (reference has none; SURVEY §5) ---
    # continue from the newest checkpoint in the logfolder (iteration,
    # optimizer state, schedule position all restored)
    resume: int = 0
    # wedge watchdog: if no train-loop progress AND no compile-cache write
    # for this long, log and exit resumable (code 17); 0 disables.  The
    # default sits above the longest observed legitimate remote compile.
    wedge_timeout_s: float = 900.0
    # supervise the run in a subprocess and relaunch with --resume 1 up to
    # N times whenever the watchdog exits wedged (full r3-incident
    # automation: no operator in the loop); 0 = run in-process
    auto_resume: int = 0
    # jax platform override ("cpu" to force the CPU backend — the
    # container pins the tunneled TPU via JAX_PLATFORMS, which only an
    # in-process jax.config.update can override); "" = default
    platform: str = ""
    profile_dir: str = ""  # dump a jax.profiler trace here when set
    profile_start: int = 50  # first profiled step
    profile_steps: int = 5  # number of profiled steps
    seed: int = 20211202

    def resolved_alpha_mask_thres(self) -> float:
        if self.alphaMask_thres is not None:
            return float(self.alphaMask_thres)
        return float(self.alpha_mask_thre)

    def resolved_train_images(self):
        """Few-shot train index selection across the two config surfaces."""
        if self.train_images is not None:
            return list(self.train_images)
        if self.train_idxs:
            return list(self.train_idxs)
        if self.N_train_imgs > 0:
            return int(self.N_train_imgs)
        return -1

    def resolved_test_images(self):
        if self.test_images is not None:
            return list(self.test_images)
        if self.test_idxs:
            return list(self.test_idxs)
        if self.N_test_imgs > 0:
            return int(self.N_test_imgs)
        return -1


def model_config_from(cfg: TrainConfig) -> ModelConfig:
    """TrainConfig -> static ModelConfig (the arg dict at train.py:227-247)."""
    return ModelConfig(
        model_name=cfg.model_name,
        density_n_comp=tuple(cfg.n_lamb_sigma),
        app_n_comp=tuple(cfg.n_lamb_sh),
        app_dim=cfg.data_dim_color,
        density_shift=cfg.density_shift,
        distance_scale=cfg.distance_scale,
        alpha_mask_thres=cfg.resolved_alpha_mask_thres(),
        ray_march_weight_thres=cfg.rm_weight_mask_thre,
        fea2dense_act=cfg.fea2denseAct,
        step_ratio=cfg.step_ratio,
        shading_mode=cfg.shadingMode,
        pos_pe=cfg.pos_pe,
        view_pe=cfg.view_pe,
        fea_pe=cfg.fea_pe,
        feature_c=cfg.featureC,
        dtype=cfg.compute_dtype,
        grid_dtype=cfg.grid_dtype,
        line_dtype=cfg.line_dtype,
    )
