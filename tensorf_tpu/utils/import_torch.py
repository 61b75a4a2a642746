"""Import reference PyTorch checkpoints (``.th``) as native checkpoints.

The reference saves ``{kwargs, state_dict}`` plus a bit-packed alpha mask
via ``torch.save`` (models/tensorBase.py:160-168).  This module maps that
layout onto our channels-last pytrees, so a user migrating from the
reference can keep every trained model:

================================  =================================
reference state_dict              ours
================================  =================================
``density_plane.{i}`` (1,R,H,W)   ``density_plane[i]`` (H,W,R)
``density_line.{i}``  (1,R,L,1)   ``density_line[i]``  (L,R)
``app_plane.{i}`` / ``app_line.{i}``  same transposes
``basis_mat.weight`` (out,in)     ``basis`` (in,out)
``renderModule.mlp.{0,2,4}``      ``render.l{1,2,3}`` (w = weight.T)
``plane_coef``/``line_coef``      legacy TensorVM per-axis tuples
  (3,C,res,res)/(3,C,res,1)
``alphaMask.{shape,mask,aabb}``   AlphaGridMask (volume (Z,Y,X))
================================  =================================

The reference checkpoint does NOT record its model class (get_kwargs,
tensorBase.py:136-158 — its own loader knows it from the CLI); we infer it
from the state_dict key set.  torch is needed only to *read* the pickle
(``torch.load``); the conversion itself is numpy, and the result either
feeds ``save_checkpoint`` (offline conversion) or is returned directly
(``utils/ckpt.py::load_checkpoint`` dispatches ``.th`` paths here, so
``--ckpt reference.th`` works in every entry point).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from ..models.alpha_mask import AlphaGridMask, unpack_mask
from ..models.config import ModelConfig


def _np(x) -> np.ndarray:
    """torch tensor | list | np array -> np array (no torch import needed)."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _comp(x) -> Tuple[int, ...]:
    """n_comp int (legacy TensorVM args) or per-axis list -> 3-tuple."""
    if isinstance(x, (int, np.integer)):
        return (int(x),) * 3
    return tuple(int(v) for v in x)


def _near_far(kwargs: Dict[str, Any]) -> Tuple[float, float]:
    raw = kwargs["near_far"]
    try:
        nf = tuple(float(v) for v in _np(raw).reshape(-1))
        if len(nf) == 2:
            return nf
    except (TypeError, ValueError):
        pass
    # Authentic reference TensorCP checkpoints carry near_far='cuda'/'cpu':
    # the only constructor call that works passes device positionally into
    # TensorBase's near_far slot (tensoRF.py:331-332, SURVEY §2.11-13).
    print(
        f"[import] reference ckpt carries non-numeric near_far ({raw!r} — "
        "the TensorCP device-into-near_far bug, tensoRF.py:331-332); "
        "defaulting to (2.0, 6.0)"
    )
    return (2.0, 6.0)


def _torch_load_safe(path: str) -> Dict[str, Any]:
    """torch.load with weights_only=True: the reference pickle carries
    numpy arrays (the bit-packed alpha mask, tensorBase.py:166), which the
    weights-only unpickler rejects without an explicit allowlist — but a
    --ckpt path is user input, so arbitrary-code pickle loading
    (weights_only=False) is not acceptable in entry points."""
    import torch
    from torch.serialization import safe_globals

    try:
        reconstruct = np._core.multiarray._reconstruct  # numpy >= 2
    except AttributeError:  # pragma: no cover - numpy 1.x
        reconstruct = np.core.multiarray._reconstruct
    import numpy.dtypes as _ndt

    allow = [reconstruct, np.ndarray, np.dtype]
    allow += [
        getattr(_ndt, n) for n in dir(_ndt) if n.endswith("DType")
    ]
    with safe_globals(allow):
        return torch.load(path, map_location="cpu", weights_only=True)


def infer_model_name(sd_keys) -> str:
    keys = set(sd_keys)
    if any(k.startswith("density_plane.") for k in keys):
        return "TensorVMSplit"
    if "plane_coef" in keys:
        return "TensorVM"
    if any(k.startswith("density_line.") for k in keys):
        return "TensorCP"
    raise ValueError(
        f"unrecognized reference state_dict (keys: {sorted(keys)[:8]}...)"
    )


def cfg_from_reference_kwargs(kwargs: Dict[str, Any], model_name: str
                              ) -> ModelConfig:
    """get_kwargs dict (tensorBase.py:136-158) -> our static ModelConfig."""
    return ModelConfig(
        model_name=model_name,
        density_n_comp=_comp(kwargs["density_n_comp"]),
        app_n_comp=_comp(kwargs["appearance_n_comp"]),
        app_dim=int(kwargs["app_dim"]),
        density_shift=float(kwargs["density_shift"]),
        distance_scale=float(kwargs["distance_scale"]),
        alpha_mask_thres=float(kwargs["alphaMask_thres"]),
        ray_march_weight_thres=float(kwargs["rayMarch_weight_thres"]),
        fea2dense_act=str(kwargs["fea2denseAct"]),
        near_far=_near_far(kwargs),
        step_ratio=float(kwargs["step_ratio"]),
        shading_mode=str(kwargs["shadingMode"]),
        pos_pe=int(kwargs["pos_pe"]),
        view_pe=int(kwargs["view_pe"]),
        fea_pe=int(kwargs["fea_pe"]),
        feature_c=int(kwargs["featureC"]),
    )


def _plane(arr: np.ndarray) -> np.ndarray:
    """(1, R, H, W) -> (H, W, R) float32 (channels-last)."""
    a = _np(arr)
    if a.ndim != 4 or a.shape[0] != 1:
        raise ValueError(
            f"reference plane factor must be (1, R, H, W), got {a.shape}"
        )
    return np.ascontiguousarray(a[0].transpose(1, 2, 0), np.float32)


def _line(arr: np.ndarray) -> np.ndarray:
    """(1, R, L, 1) -> (L, R) float32."""
    a = _np(arr)
    if a.ndim != 4 or a.shape[0] != 1 or a.shape[-1] != 1:
        raise ValueError(
            f"reference line factor must be (1, R, L, 1), got {a.shape}"
        )
    return np.ascontiguousarray(a[0, :, :, 0].T, np.float32)


def _render_params(sd: Dict[str, np.ndarray], shading_mode: str) -> Dict:
    """renderModule.mlp.{0,2,4}.{weight,bias} -> render.l{1,2,3}.{w,b}.

    The linear stack sits at Sequential slots 0/2/4 with ReLUs between
    (models/mlp.py:38); SH/RGB shading is parameter-free on both sides.
    """
    if not shading_mode.startswith("MLP"):
        return {}
    out = {}
    for ours, slot in (("l1", 0), ("l2", 2), ("l3", 4)):
        w = _np(sd[f"renderModule.mlp.{slot}.weight"])
        b = _np(sd[f"renderModule.mlp.{slot}.bias"])
        out[ours] = {
            "w": np.ascontiguousarray(w.T, np.float32),
            "b": np.ascontiguousarray(b, np.float32),
        }
    return out


def convert_reference_state_dict(
    model_name: str, sd: Dict[str, np.ndarray], shading_mode: str
) -> Tuple[Dict, Tuple[int, int, int]]:
    """state_dict -> (our params pytree, grid_size (X, Y, Z)).

    Grid size is derived from the factor shapes themselves (per-axis plane
    (1,R,grid[m1],grid[m0]) and line (1,R,grid[vec_i],1) — reference
    tensoRF.py:152-162), so post-shrink anisotropic grids convert exactly.
    """
    if model_name == "TensorVMSplit":
        dp = tuple(_plane(sd[f"density_plane.{i}"]) for i in range(3))
        dl = tuple(_line(sd[f"density_line.{i}"]) for i in range(3))
        ap = tuple(_plane(sd[f"app_plane.{i}"]) for i in range(3))
        al = tuple(_line(sd[f"app_line.{i}"]) for i in range(3))
        params = {
            "density_plane": dp,
            "density_line": dl,
            "app_plane": ap,
            "app_line": al,
            "basis": np.ascontiguousarray(
                _np(sd["basis_mat.weight"]).T, np.float32
            ),
            "render": _render_params(sd, shading_mode),
        }
        # plane 0 covers axes (m0,m1)=(0,1) as (H=grid[1], W=grid[0]);
        # line 0 runs along vecMode[0]=2.
        grid = (dp[0].shape[1], dp[0].shape[0], dl[0].shape[0])
        return params, grid
    if model_name == "TensorCP":
        dl = tuple(_line(sd[f"density_line.{i}"]) for i in range(3))
        al = tuple(_line(sd[f"app_line.{i}"]) for i in range(3))
        params = {
            "density_line": dl,
            "app_line": al,
            "basis": np.ascontiguousarray(
                _np(sd["basis_mat.weight"]).T, np.float32
            ),
            "render": _render_params(sd, shading_mode),
        }
        # lines run along vecMode=(2,1,0)
        grid = (dl[2].shape[0], dl[1].shape[0], dl[0].shape[0])
        return params, grid
    if model_name == "TensorVM":
        pc, lc = _np(sd["plane_coef"]), _np(sd["line_coef"])
        if pc.ndim != 4 or pc.shape[0] != 3:
            raise ValueError(
                f"legacy plane_coef must be (3, C, res, res), got {pc.shape}"
            )
        planes = tuple(
            np.ascontiguousarray(pc[i].transpose(1, 2, 0), np.float32)
            for i in range(3)
        )
        lines = tuple(
            np.ascontiguousarray(lc[i, :, :, 0].T, np.float32)
            for i in range(3)
        )
        params = {
            "plane": planes,
            "line": lines,
            "basis": np.ascontiguousarray(
                _np(sd["basis_mat.weight"]).T, np.float32
            ),
            "render": _render_params(sd, shading_mode),
        }
        grid = (planes[0].shape[1], planes[0].shape[0], lines[0].shape[0])
        return params, grid
    raise ValueError(f"unknown model {model_name}")


def _alpha_mask_from(ckpt: Dict[str, Any]) -> Optional[AlphaGridMask]:
    if "alphaMask.aabb" not in ckpt:
        return None
    # saved shape is the viewed (1, 1, Z, Y, X) tensor's (tensorBase.py:166);
    # the volume itself is the trailing 3 dims
    shape = tuple(int(s) for s in _np(ckpt["alphaMask.shape"]).reshape(-1))[-3:]
    return unpack_mask(
        {
            "alphaMask.shape": np.asarray(shape, np.int64),
            "alphaMask.mask": _np(ckpt["alphaMask.mask"]).astype(np.uint8),
            "alphaMask.aabb": _np(ckpt["alphaMask.aabb"]).astype(np.float32),
        }
    )


def load_reference_checkpoint(path: str):
    """Read a reference ``.th`` -> (cfg, params, aabb, grid_size,
    alpha_mask, extra) — the exact return contract of
    ``utils/ckpt.py::load_checkpoint``."""
    ckpt = _torch_load_safe(path)
    sd = {k: _np(v) for k, v in ckpt["state_dict"].items()}
    kwargs = ckpt["kwargs"]
    model_name = infer_model_name(sd.keys())
    cfg = cfg_from_reference_kwargs(kwargs, model_name)
    params, grid_size = convert_reference_state_dict(
        model_name, sd, cfg.shading_mode
    )
    if "gridSize" in kwargs:
        saved = tuple(int(g) for g in _np(kwargs["gridSize"]).reshape(-1))
        if saved != tuple(grid_size):
            raise ValueError(
                f"checkpoint kwargs gridSize {saved} disagrees with the "
                f"factor shapes ({grid_size}) — truncated/corrupt .th?"
            )
    aabb = _np(kwargs["aabb"]).astype(np.float32).reshape(2, 3)
    import jax
    import jax.numpy as jnp

    params = jax.tree_util.tree_map(jnp.asarray, params)
    return cfg, params, aabb, grid_size, _alpha_mask_from(ckpt), None


def convert(path_in: str, path_out: str) -> str:
    """Offline conversion: reference ``.th`` -> self-describing ``.npz``."""
    from .ckpt import save_checkpoint

    cfg, params, aabb, grid_size, alpha_mask, _ = load_reference_checkpoint(
        path_in
    )
    save_checkpoint(path_out, cfg, params, aabb, grid_size, alpha_mask)
    return path_out if path_out.endswith(".npz") else f"{path_out}.npz"
