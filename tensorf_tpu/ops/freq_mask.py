"""FreeNeRF frequency-regularization masks, computed inside jit.

Implements the *intended* semantics of the reference's
``get_freq_reg_mask`` / ``get_free_mask`` (utils.py:11-70): per-frequency
vector masks over the positional-encoding channels and per-rank vector
masks over the decomposition components.  (The reference as written
degenerates these to scalars via ``[0]``-indexing and an early return —
SURVEY.md §2.11 item 5; we implement the vector curriculum the FreeNeRF
paper and the surrounding code clearly intend.)

The mask is a closed-form function of the (traced) step scalar, so it is
computed *inside* the jitted train step — no per-step host work, unlike the
reference which rebuilds torch tensors on host every iteration
(train.py:303-318).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


def freq_reg_mask(
    length: int,
    step: jax.Array,
    total_reg_steps: int,
    ratio: float = 1.0,
    max_visible: Optional[float] = None,
    dtype=jnp.float32,
) -> jax.Array:
    """Linear frequency curriculum mask of shape (length,).

    The visible prefix of the spectrum grows linearly with step/total in
    groups of dv=4 channels, with a fractional band for the partially
    visible group; values are clamped to [1e-8, 1-1e-8] while the
    curriculum is active and are exactly 1 once step >= total_reg_steps.
    ``ratio`` scales the portion of the spectrum that ever becomes visible
    during regularization (reference utils.py:20).
    """
    if max_visible is not None:
        idx = jnp.arange(length)
        return (idx < int(length * max_visible)).astype(dtype)

    dv = 4
    step = jnp.asarray(step, dtype=dtype)
    eff_len = length * float(ratio)
    ptr = jnp.minimum(eff_len / dv * step / total_reg_steps + 1.0, eff_len / dv)
    int_ptr = jnp.floor(ptr)
    frac = ptr - int_ptr
    idx = jnp.arange(length, dtype=dtype)
    mask = jnp.where(
        idx < int_ptr * dv,
        1.0,
        jnp.where(idx < int_ptr * dv + dv, frac, 0.0),
    )
    mask = jnp.clip(mask, 1e-8, 1.0 - 1e-8).astype(dtype)
    return jnp.where(step < total_reg_steps, mask, jnp.ones(length, dtype))


class FreeMasks(NamedTuple):
    """Per-step FreeNeRF masks threaded through shading + feature gathers.

    ``pos/view/fea`` multiply the corresponding PE channels
    (reference mlp.py:41-66); ``den/app`` are per-axis tuples of per-rank
    masks multiplying the decomposition components
    (reference tensoRF.py:221-258).  Any entry may be None (mask off).
    """

    pos: Optional[jax.Array] = None
    view: Optional[jax.Array] = None
    fea: Optional[jax.Array] = None
    den: Optional[Tuple[jax.Array, ...]] = None
    app: Optional[Tuple[jax.Array, ...]] = None


def free_masks(
    pos_len: int,
    view_len: int,
    fea_len: int,
    den_ranks: Tuple[int, ...],
    app_ranks: Tuple[int, ...],
    step: jax.Array,
    total_steps: int,
    ratio: float = 1.0,
    use_decomp_mask: bool = True,
    max_visible: Optional[float] = None,
) -> FreeMasks:
    """Build the full mask bundle (reference utils.py:38-70, intended)."""

    def enc(length):
        if length <= 0:
            return None
        return freq_reg_mask(length, step, total_steps, ratio, max_visible)

    den = app = None
    if use_decomp_mask:
        if len(den_ranks) > 0:
            den = tuple(
                freq_reg_mask(r, step, total_steps, ratio, max_visible)
                for r in den_ranks
            )
        if len(app_ranks) > 0:
            app = tuple(
                freq_reg_mask(r, step, total_steps, ratio, max_visible)
                for r in app_ranks
            )
    return FreeMasks(
        pos=enc(pos_len), view=enc(view_len), fea=enc(fea_len), den=den, app=app
    )
