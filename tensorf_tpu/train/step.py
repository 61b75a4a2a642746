"""The jitted train step: render + losses + grads + Adam, one XLA program.

The reference hot loop (train.py:296-392) does per-step host work (mask
building, loss bookkeeping, LR mutation).  Here everything — FreeNeRF mask
computation (closed-form in the step scalar), rendering, the loss assembly,
backward, Adam update and LR decay — runs inside a single jitted function
with donated buffers; the host only feeds ray batches.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..models.config import ModelConfig
from ..ops.freq_mask import FreeMasks, free_masks
from ..render.volume import render_rays
from .losses import LossWeights, mse_loss, occlusion_loss


class TrainStatics(NamedTuple):
    """Hashable per-segment static configuration for the train step."""

    n_samples: int
    step_size: float
    white_bg: bool
    ndc_ray: bool
    total_steps: int
    lr_factor: float
    weights: LossWeights = LossWeights()
    free_reg: bool = False
    free_decomp: bool = False
    freq_reg_ratio: float = 1.0
    max_visible: Optional[float] = None
    shade_top_k: Optional[int] = None
    fused: bool = True
    sample_budget: Optional[int] = None


def _build_masks(cfg: ModelConfig, statics: TrainStatics, step) -> FreeMasks:
    if not statics.free_reg:
        return FreeMasks()
    return free_masks(
        pos_len=cfg.pos_bit_length,
        view_len=cfg.view_bit_length,
        fea_len=cfg.fea_bit_length,
        den_ranks=cfg.density_n_comp,
        app_ranks=cfg.app_n_comp,
        step=step,
        total_steps=statics.total_steps,
        ratio=statics.freq_reg_ratio,
        use_decomp_mask=statics.free_decomp,
        max_visible=statics.max_visible,
    )


def make_train_step(model, cfg: ModelConfig, statics: TrainStatics, optimizer):
    """Returns jitted f(params, opt_state, alpha_mask, aabb, rays, rgbs,
    step, key) -> (params, opt_state, metrics)."""

    lw = statics.weights

    def loss_fn(params, alpha_mask, aabb, rays, rgbs, step, key):
        masks = _build_masks(cfg, statics, step)
        out = render_rays(
            model,
            cfg,
            params,
            alpha_mask,
            rays,
            key,
            masks,
            aabb=aabb,
            step_size=statics.step_size,
            n_samples=statics.n_samples,
            is_train=True,
            white_bg=statics.white_bg,
            ndc_ray=statics.ndc_ray,
            shade_top_k=statics.shade_top_k,
            fused=statics.fused,
            sample_budget=statics.sample_budget,
        )
        mse = mse_loss(out.rgb, rgbs)
        total = mse
        metrics = {"mse": mse}

        # TV weights decay by lr_factor each step (train.py:355/364 applies
        # the multiply before use, so step t uses w0 * factor^(t+1)).
        tv_decay = jnp.power(statics.lr_factor, step.astype(jnp.float32) + 1.0)

        if lw.ortho > 0 and getattr(model, "has_ortho", False):
            reg = model.ortho_reg(params)
            total = total + lw.ortho * reg
            metrics["reg_ortho"] = reg
        if lw.l1 > 0:
            reg = model.density_l1(params)
            total = total + lw.l1 * reg
            metrics["reg_l1"] = reg
        if lw.tv_density > 0:
            reg = model.tv_density(params) * lw.tv_density * tv_decay
            total = total + reg
            metrics["reg_tv_density"] = reg
        if lw.tv_app > 0:
            reg = model.tv_app(params) * lw.tv_app * tv_decay
            total = total + reg
            metrics["reg_tv_app"] = reg
        if lw.occ > 0 and lw.occ_range > 0:
            reg = occlusion_loss(
                out.sigma, rgbs, lw.occ_range, lw.occ_wb_range, lw.occ_wb_prior
            )
            total = total + lw.occ * reg
            metrics["reg_occ"] = reg

        metrics["num_valid_samples"] = out.num_valid_samples
        # Budget self-verification: nonzero means the fixed sample budget
        # dropped candidate samples on some rays this step (VERDICT r1 #3).
        metrics["budget_overflow_frac"] = out.budget_overflow_frac
        metrics["mean_alive_samples"] = out.mean_alive_samples
        return total, metrics

    @partial(jax.jit, donate_argnums=(0, 1))
    def step_fn(params, opt_state, alpha_mask, aabb, rays, rgbs, step, key):
        (total, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, alpha_mask, aabb, rays, rgbs, step, key
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["total_loss"] = total
        metrics["psnr"] = -10.0 * jnp.log(metrics["mse"]) / jnp.log(10.0)
        return params, opt_state, metrics

    return step_fn
