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

from ..models.alpha_mask import AlphaGridMask, sample_alpha_gate
from ..models.config import ModelConfig
from ..models.shading import apply_shading
from ..ops.freq_mask import FreeMasks
from ..ops.rays import sample_along_rays, sample_along_rays_ndc
from ..ops.render_math import raw2alpha


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
) -> RenderOutput:
    """Volume-render a batch of rays (B, 6) -> RenderOutput.

    ``model`` is a FieldModel namespace from FIELD_MODELS; ``masks`` the
    per-step FreeNeRF bundle; ``key`` drives stratified jitter and the
    train-time random white-background flip (None => deterministic eval).
    """
    B = rays.shape[0]
    rays_o, viewdirs = rays[:, :3], rays[:, 3:6]
    near, far = cfg.near_far

    if key is not None:
        k_strat, k_bg = jax.random.split(key)
    else:
        k_strat = k_bg = None

    if ndc_ray:
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

    # Stage-2 cull: alpha-mask occupancy as a gate (tensorBase.py:349-354).
    if alpha_mask is not None:
        ray_valid = ray_valid & (sample_alpha_gate(alpha_mask, xyz) > 0)

    # Fixed-budget sample compaction — the TPU analog of the reference's
    # boolean compaction: keep the nearest `sample_budget` alive samples per
    # ray (depth order preserved).  Exact whenever the budget covers every
    # alive sample (skipped samples have sigma == 0 and each kept sample
    # retains its original lattice spacing, so transmittance is unchanged).
    n_eff = n_samples
    if sample_budget is not None and sample_budget < n_samples:
        K = sample_budget
        order = jnp.arange(n_samples, dtype=jnp.int32)
        score = ray_valid.astype(jnp.int32) * (2 * n_samples - order)
        _, sel = jax.lax.top_k(score, K)  # alive-and-near first
        sel = jnp.sort(sel, axis=-1)  # restore depth order
        xyz = jnp.take_along_axis(xyz, sel[..., None], axis=1)
        z_vals = jnp.take_along_axis(z_vals, sel, axis=1)
        dists = jnp.take_along_axis(dists, sel, axis=1)
        ray_valid = jnp.take_along_axis(ray_valid, sel, axis=1)
        n_eff = K

    xyz_n = normalize_coord(xyz, aabb)  # (B, n_eff, 3)

    if fused:
        # One packed gather pass for density + appearance (row-rate bound
        # TPU gathers; see models/*.fused_features), then shade everything
        # behind the weight gate — the MLU/MXU work is cheap relative to
        # the gathers it replaces.
        den_feat, app_feat = model.fused_features(
            cfg, params, xyz_n.reshape(-1, 3), masks.den, masks.app
        )
        sigma = jnp.where(
            ray_valid, feature2density(cfg, den_feat.reshape(B, n_eff)), 0.0
        )
        _, weight, _ = raw2alpha(sigma, dists * cfg.distance_scale)
        app_gate = weight > cfg.ray_march_weight_thres
        num_valid = jnp.sum(app_gate.astype(jnp.int32))

        if shade_top_k is not None and shade_top_k < n_eff:
            # PE + MLP only on the top-K weights per ray; exact when K
            # covers every above-threshold sample (tensorBase.py:370).
            K = shade_top_k
            w_sel, idx = jax.lax.top_k(weight, K)
            feat_sel = jnp.take_along_axis(
                app_feat.reshape(B, n_eff, -1), idx[..., None], axis=1
            )
            xyz_sel = jnp.take_along_axis(xyz_n, idx[..., None], axis=1)
            gate_sel = w_sel > cfg.ray_march_weight_thres
            view_sel = jnp.broadcast_to(viewdirs[:, None, :], (B, K, 3))
            rgb_s = apply_shading(
                cfg,
                params["render"],
                xyz_sel.reshape(-1, 3),
                view_sel.reshape(-1, 3),
                feat_sel.reshape(B * K, -1),
                masks,
            ).reshape(B, K, 3)
            rgb_s = jnp.where(gate_sel[..., None], rgb_s, 0.0)
            rgb_map = jnp.sum(w_sel[..., None] * rgb_s, axis=-2)
        else:
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
    )


def _composite(
    cfg, rgb_map, weight, sigma, z_vals, rays, k_bg, num_valid, *,
    is_train: bool, white_bg: bool,
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
    )
