"""Training losses and regularizer weights.

The photometric/regularizer assembly mirrors reference train.py:338-371:
MSE + Ortho (VM models) + L1(density) + TV(density/app), with the TV
weights decayed by lr_factor each step.  The occlusion regularizer is the
FreeNeRF occlusion loss the reference *declares* (opt.py:69-78,
config.yaml:67-70) but never implements — we implement the intended
semantics: penalize density of the first ``occ_reg_range`` samples along
each ray (the near-camera "floaters" few-shot NeRFs hallucinate), with the
white/black-prior variant widening the range for rays whose ground-truth
pixel is saturated white/black.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class LossWeights(NamedTuple):
    """Static loss-weight bundle (hashable; closes over the jitted step)."""

    ortho: float = 0.0
    l1: float = 0.0
    tv_density: float = 0.0
    tv_app: float = 0.0
    occ: float = 0.0
    occ_range: int = 0
    occ_wb_range: int = 0
    occ_wb_prior: bool = False


def mse_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(pred - target))


def occlusion_loss(
    sigma: jax.Array,
    rgb_gt: Optional[jax.Array],
    occ_range: int,
    wb_range: int = 0,
    wb_prior: bool = False,
) -> jax.Array:
    """FreeNeRF occlusion regularization.

    sigma: (B, N) per-sample densities in depth order.  Penalizes the mean
    density within the first ``occ_range`` samples of each ray; with
    ``wb_prior``, rays whose GT color is saturated white/black instead use
    the wider ``wb_range`` window (those pixels are almost surely
    background, so near-camera density there is certainly a floater).
    """
    n = sigma.shape[-1]
    idx = jnp.arange(n)
    base = (idx < occ_range).astype(sigma.dtype)  # (N,)
    if wb_prior and rgb_gt is not None and wb_range > 0:
        white = jnp.all(rgb_gt > 0.99, axis=-1)
        black = jnp.all(rgb_gt < 0.01, axis=-1)
        wb = (white | black).astype(sigma.dtype)[:, None]  # (B, 1)
        window = (idx < wb_range).astype(sigma.dtype)
        mask = jnp.maximum(base[None, :], wb * window[None, :])
    else:
        mask = jnp.broadcast_to(base[None, :], sigma.shape)
    return jnp.sum(sigma * mask) / jnp.maximum(jnp.sum(mask), 1.0)
