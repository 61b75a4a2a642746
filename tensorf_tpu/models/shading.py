"""Shading heads: MLP variants (with FreeNeRF PE masks), SH, plain RGB.

Functional counterparts of the reference's nn.Modules
(models/mlp.py:15-155).  Parameters are plain pytrees; the apply functions
are pure and fuse into the render step under jit.  Weight init matches
torch.nn.Linear defaults (U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weight
and bias) with the last layer's bias zero-initialized
(models/mlp.py:39/83/123).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.encoding import positional_encoding
from ..ops.sh import eval_sh_bases
from ..ops.freq_mask import FreeMasks
from .config import ModelConfig


def _linear_init(key, fan_in: int, fan_out: int, zero_bias: bool = False):
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), minval=-bound, maxval=bound)
    if zero_bias:
        b = jnp.zeros((fan_out,))
    else:
        b = jax.random.uniform(kb, (fan_out,), minval=-bound, maxval=bound)
    return {"w": w.astype(jnp.float32), "b": b.astype(jnp.float32)}


def mlp_in_dim(cfg: ModelConfig) -> int:
    """Input width of the shading MLP (models/mlp.py:31/75/113)."""
    mode = cfg.shading_mode
    if mode == "MLP_Fea":
        return 2 * cfg.view_pe * 3 + 2 * cfg.fea_pe * cfg.app_dim + 3 + cfg.app_dim
    if mode == "MLP_PE":
        return (3 + 2 * cfg.view_pe * 3) + (2 * cfg.pos_pe * 3) + cfg.app_dim
    if mode == "MLP":
        return (
            2 * cfg.pos_pe * 3
            + 2 * cfg.view_pe * 3
            + 2 * cfg.fea_pe * cfg.app_dim
            + cfg.app_dim
            + 3
        )
    raise ValueError(f"no MLP input dim for shading mode {mode}")


def init_shading(key: jax.Array, cfg: ModelConfig) -> Dict:
    """Init the shading parameters ({} for the parameter-free SH/RGB)."""
    if cfg.shading_mode in ("SH", "RGB"):
        return {}
    if cfg.shading_mode not in ("MLP_Fea", "MLP_PE", "MLP"):
        raise ValueError(f"unrecognized shading mode {cfg.shading_mode}")
    k1, k2, k3 = jax.random.split(key, 3)
    d_in, c = mlp_in_dim(cfg), cfg.feature_c
    return {
        "l1": _linear_init(k1, d_in, c),
        "l2": _linear_init(k2, c, c),
        "l3": _linear_init(k3, c, 3, zero_bias=True),
    }


def _masked_pe(x: jax.Array, freqs: int, mask: Optional[jax.Array]):
    enc = positional_encoding(x, freqs)
    return enc if mask is None else enc * mask


def apply_shading(
    cfg: ModelConfig,
    params: Dict,
    pts: jax.Array,
    viewdirs: jax.Array,
    features: jax.Array,
    masks: FreeMasks,
) -> jax.Array:
    """points/viewdirs/features (M, ·) -> rgb (M, 3) in [0, 1].

    Input concatenation order matches each reference variant exactly
    (models/mlp.py:41-66, 85-107, 125-154).
    """
    mode = cfg.shading_mode
    if mode == "SH":
        sh_mult = eval_sh_bases(2, viewdirs)[:, None, :]  # (M, 1, 9)
        rgb_sh = features.reshape(-1, 3, sh_mult.shape[-1])
        return jax.nn.relu(jnp.sum(sh_mult * rgb_sh, axis=-1) + 0.5)
    if mode == "RGB":
        return features

    indata = [features, viewdirs]
    if mode == "MLP_PE":
        if cfg.pos_pe > 0:
            indata.append(_masked_pe(pts, cfg.pos_pe, masks.pos))
        if cfg.view_pe > 0:
            indata.append(_masked_pe(viewdirs, cfg.view_pe, masks.view))
    elif mode == "MLP_Fea":
        if cfg.fea_pe > 0:
            indata.append(_masked_pe(features, cfg.fea_pe, masks.fea))
        if cfg.view_pe > 0:
            indata.append(_masked_pe(viewdirs, cfg.view_pe, masks.view))
    elif mode == "MLP":
        if cfg.pos_pe > 0:
            indata.append(_masked_pe(pts, cfg.pos_pe, masks.pos))
        if cfg.view_pe > 0:
            indata.append(_masked_pe(viewdirs, cfg.view_pe, masks.view))
        if cfg.fea_pe > 0:
            indata.append(_masked_pe(features, cfg.fea_pe, masks.fea))
    else:
        raise ValueError(f"unrecognized shading mode {mode}")

    compute_dtype = jnp.dtype(cfg.dtype)
    x = jnp.concatenate(indata, axis=-1).astype(compute_dtype)
    x = jax.nn.relu(x @ params["l1"]["w"].astype(compute_dtype) + params["l1"]["b"].astype(compute_dtype))
    x = jax.nn.relu(x @ params["l2"]["w"].astype(compute_dtype) + params["l2"]["b"].astype(compute_dtype))
    x = x @ params["l3"]["w"].astype(compute_dtype) + params["l3"]["b"].astype(compute_dtype)
    return jax.nn.sigmoid(x.astype(jnp.float32))
