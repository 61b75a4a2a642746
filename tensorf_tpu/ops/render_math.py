"""Volume rendering math: alpha, exclusive transmittance, weights.

Parity with the reference's ``raw2alpha`` (models/tensorBase.py:21-28):
alpha = 1 - exp(-sigma * dist); transmittance is an exclusive cumulative
product of (1 - alpha + 1e-10) (prepended with ones); weights = alpha * T.
The 1e-10 epsilon placement is kept exactly — it matters for gradients
through opaque samples.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def exclusive_transmittance(alpha: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """T_i = prod_{j<i} (1 - alpha_j + 1e-10) and the final product.

    alpha: (..., N).  Returns (T (..., N), T_final (..., 1)).
    """
    one_minus = 1.0 - alpha + 1e-10
    inclusive = jnp.cumprod(one_minus, axis=-1)  # (..., N)
    T = jnp.concatenate(
        [jnp.ones_like(inclusive[..., :1]), inclusive[..., :-1]], axis=-1
    )
    return T, inclusive[..., -1:]


def raw2alpha(
    sigma: jax.Array, dist: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """sigma, dist (..., N) -> (alpha, weights, bg_weight (..., 1))."""
    alpha = 1.0 - jnp.exp(-sigma * dist)
    T, bg = exclusive_transmittance(alpha)
    weights = alpha * T
    return alpha, weights, bg
