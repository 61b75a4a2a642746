"""Optimizer: two-group Adam with per-step exponential LR decay.

The reference builds torch Adam with spatial grids at ``lr_init`` (0.02)
and networks at ``lr_basis`` (1e-3), betas (0.9, 0.99), and multiplies
every group's LR by ``lr_factor`` each step (train.py:272-273, 391-392).
Here that is an optax ``multi_transform`` whose schedules bake the decay —
the LR update happens on-device inside the jitted step, with zero host
work.
"""

from __future__ import annotations

import jax
import optax

from ..models.tensorf import spatial_label_tree


def _adam_exp_decay(lr0: float, lr_factor: float) -> optax.GradientTransformation:
    return optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.99, eps=1e-8),
        optax.scale_by_schedule(lambda count: -lr0 * lr_factor**count),
    )


def make_optimizer(
    params,
    lr_init: float = 0.02,
    lr_basis: float = 1e-3,
    lr_factor: float = 1.0,
):
    """Returns (optimizer, opt_state) for a field-model param pytree."""
    labels = spatial_label_tree(params)
    tx = optax.multi_transform(
        {
            "spatial": _adam_exp_decay(lr_init, lr_factor),
            "network": _adam_exp_decay(lr_basis, lr_factor),
        },
        labels,
    )
    return tx, tx.init(params)
