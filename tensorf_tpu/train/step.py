"""The jitted train step: render + losses + grads + Adam, one XLA program.

The reference hot loop (train.py:296-392) does per-step host work (mask
building, loss bookkeeping, LR mutation).  Here everything — FreeNeRF mask
computation (closed-form in the step scalar), rendering, the loss assembly,
backward, Adam update and LR decay — runs inside a single jitted function
with donated buffers; the host only feeds ray batches.

Two TPU-economy layers on top of the plain step:

* **Device-resident ray store** (``from_store``): the full filtered ray
  store lives in HBM; the step receives only the sampled int32 indices
  (a few KB over the host link instead of the ray/rgb rows) and gathers
  the batch on device with one flat row gather (~10 us for 4096 of 8.5M
  rows at the measured 0.4G rows/s).  The reference re-uploads every
  batch from host (train.py:299-300 ``allrays[ray_idx].to(device)``).

* **Alive-count-stratified sub-batches** (``strata_budgets``): the step
  receives one index array per stratum of the candidate-count-partitioned
  ray store and renders each sub-batch at its own static ``cand``-mode
  sample budget inside the SAME program, combining per-stratum losses by
  ray count.  Rays are drawn per stratum proportionally to stratum size,
  so the estimator matches uniform sampling; per-sample work approaches
  the store's *mean* candidate count instead of the p99.9 a single fixed
  budget must pay — the TPU answer to the reference's dynamic boolean
  compaction economy (tensorBase.py:360-375).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

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
    # Coarse occupancy pre-gate validity (coarse_gate_valid, ADVICE r2):
    # False falls back to exact-gate candidate selection under budgets.
    use_coarse_gate: bool = True
    # When True the step takes (store_rays, store_rgbs, ids) and gathers
    # the batch on device; ids is an (B,) array, or a tuple of per-stratum
    # arrays when strata_budgets is set.
    from_store: bool = False
    # Per-stratum CANDIDATE sample budgets (None entry = no budget for
    # that stratum); requires from_store and a tuple-of-ids argument of
    # the same length.
    strata_budgets: Optional[Tuple[Optional[int], ...]] = None
    # Per-stratum EXACT-ALIVE budgets (second compaction stage): entry s
    # compacts stratum s's kept candidates down to the measured exact-alive
    # maximum before the expensive per-sample work.  None entry = single
    # stage for that stratum.  Same length as strata_budgets when set.
    strata_alive_budgets: Optional[Tuple[Optional[int], ...]] = None
    # Per-stratum sample-lattice caps: ray samples start at the bbox ENTRY
    # (ops/rays.py::sample_along_rays), so a stratum whose longest member
    # chord is C renders exactly on an n_samples=C lattice — all fixed
    # lattice work (sampling, gate probes, window top-k) shrinks by
    # C/n_samples.  None = use `n_samples` for every stratum.  Where the
    # entry equals the stratum's candidate budget the compaction disables
    # itself (budget < n_samples fails) — the capped lattice IS the
    # compaction (the mask-free prefilter case).
    strata_n_samples: Optional[Tuple[int, ...]] = None
    # Per-stratum LOSS weights: each stratum's share of the ray STORE
    # (size_s / N).  Quotas are rounded to device-mesh multiples and
    # floored at round_to, so per-ray inclusion probability deviates from
    # uniform by up to ~10% on small strata; weighting each stratum's loss
    # by its store share (instead of its drawn sub-batch share) makes the
    # gradient estimator exactly the store-uniform expectation — the same
    # objective the reference's uniform sampler optimizes (train.py:44-56).
    # None = legacy sub-batch-share weighting.
    strata_loss_weights: Optional[Tuple[float, ...]] = None
    # Noise-matched stratification: re-draw the per-step stratum loss
    # weights as m/B with m ~ Multinomial(B, strata_loss_weights), the
    # exact between-strata composition noise a uniform sampler's batches
    # carry.  Stratified quota batches REDUCE minibatch gradient noise
    # (measured 0.71x at a trained ckpt, scripts/grad_noise.py), and in
    # the few-shot regime that SGD noise acts as an implicit regularizer
    # (the round-4 quality A/B: train PSNR equal-or-better, test PSNR
    # ~-0.9 dB for the quieter stratified estimator).  The multinomial is
    # drawn INSIDE jit from the step key: fixed shapes, no host work, and
    # bit-exact resume for free.  E[w_s]=p_s, so the estimator stays
    # unbiased for the store-uniform objective.
    strata_noise_match: bool = False


def _multinomial_shares(key, n: float, probs):
    """m/n with m ~ Multinomial(n, probs), via the sequential-binomial
    decomposition (probs is a static tuple, so the loop unrolls to a
    handful of fixed ops inside jit)."""
    remaining = jnp.asarray(n, jnp.float32)
    rest = 1.0
    shares = []
    keys = jax.random.split(key, len(probs))
    for i, p in enumerate(probs[:-1]):
        cond = jnp.clip(p / max(rest, 1e-12), 0.0, 1.0)
        m = jax.random.binomial(keys[i], n=remaining, p=cond)
        m = jnp.clip(m, 0.0, remaining)
        shares.append(m / n)
        remaining = remaining - m
        rest -= p
    shares.append(remaining / n)
    return shares


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
    """Returns the jitted step.

    Signature without ``from_store`` (plain batches)::

        f(params, opt_state, alpha_mask, aabb, rays, rgbs, step, key)

    with ``from_store`` (device-resident store; ids = (B,) int32 array or
    a tuple of per-stratum arrays when ``strata_budgets`` is set)::

        f(params, opt_state, alpha_mask, aabb, store_rays, store_rgbs,
          ids, step, key)

    Both return (params, opt_state, metrics).
    """

    lw = statics.weights

    def _render(params, alpha_mask, aabb, rays, key, masks, budget, mode,
                alive_budget=None, n_samples=None):
        return render_rays(
            model,
            cfg,
            params,
            alpha_mask,
            rays,
            key,
            masks,
            aabb=aabb,
            step_size=statics.step_size,
            n_samples=(
                n_samples if n_samples is not None else statics.n_samples
            ),
            is_train=True,
            white_bg=statics.white_bg,
            ndc_ray=statics.ndc_ray,
            shade_top_k=statics.shade_top_k,
            fused=statics.fused,
            sample_budget=budget,
            budget_mode=mode,
            use_coarse_gate=statics.use_coarse_gate,
            alive_budget=alive_budget,
        )

    def loss_fn(params, alpha_mask, aabb, rays, rgbs, ids, step, key):
        masks = _build_masks(cfg, statics, step)

        if statics.strata_budgets is not None:
            # Stratified: per-stratum render at its own candidate budget;
            # scalar losses combined by ray count (equivalent to the
            # single-batch mean over the concatenated rays, without
            # cross-stratum concat of sharded arrays).
            assert statics.from_store and isinstance(ids, tuple)
            assert len(ids) == len(statics.strata_budgets)
            alive_budgets = statics.strata_alive_budgets or (
                (None,) * len(ids)
            )
            assert len(alive_budgets) == len(statics.strata_budgets)
            strata_ns = statics.strata_n_samples or ((None,) * len(ids))
            assert len(strata_ns) == len(statics.strata_budgets)
            sizes = [int(i.shape[0]) for i in ids]
            total_rays = float(sum(sizes))
            if statics.strata_loss_weights is not None:
                assert len(statics.strata_loss_weights) == len(ids)
                wsum = float(sum(statics.strata_loss_weights))
                loss_w = [float(x) / wsum for x in statics.strata_loss_weights]
            else:
                loss_w = [s / total_rays for s in sizes]
            if statics.strata_noise_match and len(ids) > 1:
                # per-step multinomial composition weights (see the
                # statics field doc): E[w] = loss_w, noise = uniform's
                key, key_comp = jax.random.split(key)
                loss_w = _multinomial_shares(
                    key_comp, total_rays, tuple(loss_w)
                )
            keys = jax.random.split(key, len(ids))
            mse = 0.0
            occ = 0.0
            num_valid = 0
            mean_alive = 0.0
            overflow_each = []
            for s, (ids_s, budget_s) in enumerate(
                zip(ids, statics.strata_budgets)
            ):
                rays_s = jnp.take(rays, ids_s, axis=0)
                rgbs_s = jnp.take(rgbs, ids_s, axis=0)
                out = _render(
                    params, alpha_mask, aabb, rays_s, keys[s], masks,
                    budget_s, "cand", alive_budgets[s], strata_ns[s],
                )
                w = loss_w[s]
                mse = mse + w * mse_loss(out.rgb, rgbs_s)
                mean_alive = mean_alive + w * out.mean_alive_samples
                num_valid = num_valid + out.num_valid_samples
                overflow_each.append(out.budget_overflow_frac)
                if lw.occ > 0 and lw.occ_range > 0:
                    occ = occ + w * occlusion_loss(
                        out.sigma, rgbs_s, lw.occ_range, lw.occ_wb_range,
                        lw.occ_wb_prior,
                    )
            overflow_each = jnp.stack(overflow_each)
            overflow = jnp.sum(
                overflow_each
                * jnp.asarray([s / total_rays for s in sizes])
            )
            metrics = {
                "mse": mse,
                "stratum_overflow": overflow_each,
                "budget_overflow_frac": overflow,
                "mean_alive_samples": mean_alive,
                "num_valid_samples": num_valid,
            }
            total = mse
            if lw.occ > 0 and lw.occ_range > 0:
                total = total + lw.occ * occ
                metrics["reg_occ"] = occ
        else:
            if statics.from_store:
                rays = jnp.take(rays, ids, axis=0)
                rgbs = jnp.take(rgbs, ids, axis=0)
            out = _render(
                params, alpha_mask, aabb, rays, key, masks,
                statics.sample_budget, "alive",
            )
            mse = mse_loss(out.rgb, rgbs)
            total = mse
            metrics = {
                "mse": mse,
                "num_valid_samples": out.num_valid_samples,
                # Budget self-verification: nonzero means the fixed sample
                # budget dropped candidates on some rays (VERDICT r1 #3).
                "budget_overflow_frac": out.budget_overflow_frac,
                "mean_alive_samples": out.mean_alive_samples,
            }
            if lw.occ > 0 and lw.occ_range > 0:
                reg = occlusion_loss(
                    out.sigma, rgbs, lw.occ_range, lw.occ_wb_range,
                    lw.occ_wb_prior,
                )
                total = total + lw.occ * reg
                metrics["reg_occ"] = reg

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
        return total, metrics

    if statics.from_store:

        @partial(jax.jit, donate_argnums=(0, 1))
        def step_fn(
            params, opt_state, alpha_mask, aabb, store_rays, store_rgbs,
            ids, step, key,
        ):
            (total, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, alpha_mask, aabb, store_rays, store_rgbs, ids, step,
              key)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics["total_loss"] = total
            metrics["psnr"] = -10.0 * jnp.log(metrics["mse"]) / jnp.log(10.0)
            return params, opt_state, metrics

        return step_fn

    @partial(jax.jit, donate_argnums=(0, 1))
    def step_fn(params, opt_state, alpha_mask, aabb, rays, rgbs, step, key):
        (total, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, alpha_mask, aabb, rays, rgbs, None, step, key
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["total_loss"] = total
        metrics["psnr"] = -10.0 * jnp.log(metrics["mse"]) / jnp.log(10.0)
        return params, opt_state, metrics

    return step_fn
