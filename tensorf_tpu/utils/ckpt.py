"""Self-describing checkpoints: kwargs + param pytree + packed alpha mask.

Counterpart of TensorBase.save/load (reference models/tensorBase.py:160-175):
a checkpoint carries its model hyperparameters (so render/export entry
points can rebuild the model without the training config), every parameter
leaf, and the alpha mask bit-packed with np.packbits.  Format is a single
``.npz`` (pickle-free, torch-free).  Grid shapes change across upsample
events; shapes are read back from the arrays themselves.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..models.alpha_mask import AlphaGridMask, pack_mask, unpack_mask
from ..models.config import ModelConfig


def _flatten(prefix: str, tree, out: Dict[str, np.ndarray]):
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten(f"{prefix}/{k}" if prefix else k, v, out)
    elif isinstance(tree, (tuple, list)):
        for i, v in enumerate(tree):
            _flatten(f"{prefix}/{i}", v, out)
    else:
        out[prefix] = np.asarray(tree)


def _unflatten(flat: Dict[str, np.ndarray]):
    root: Dict[str, Any] = {}
    for path, arr in flat.items():
        parts = path.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(arr)

    def finalize(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return tuple(
                finalize(node[str(i)]) for i in range(len(keys))
            )
        return {k: finalize(v) for k, v in node.items()}

    return finalize(root)


def save_checkpoint(
    path: str,
    cfg: ModelConfig,
    params,
    aabb,
    grid_size,
    alpha_mask: Optional[AlphaGridMask] = None,
    extra: Optional[Dict[str, Any]] = None,
    opt_state=None,
    aux: Optional[Dict[str, np.ndarray]] = None,
):
    """``opt_state`` (any pytree, e.g. optax state) is stored as ordered
    leaves — ``load_opt_leaves`` returns them for ``tree_unflatten`` against
    a freshly initialized optimizer's treedef (mid-run --resume support;
    the reference has no resume beyond reloading params)."""
    entries: Dict[str, np.ndarray] = {}
    _flatten("params", params, entries)
    kwargs = dataclasses.asdict(cfg)
    kwargs["gridSize"] = [int(g) for g in grid_size]
    if extra:
        kwargs["extra"] = extra
    entries["kwargs"] = np.frombuffer(
        json.dumps(kwargs).encode(), dtype=np.uint8
    )
    entries["aabb"] = np.asarray(aabb, np.float32).reshape(2, 3)
    if alpha_mask is not None:
        entries.update(pack_mask(alpha_mask))
    if opt_state is not None:
        import jax

        leaves = jax.tree_util.tree_leaves(opt_state)
        for i, leaf in enumerate(leaves):
            entries[f"opt/{i:05d}"] = np.asarray(leaf)
    if aux:
        # free-form arrays riding along with the checkpoint (bit-exact
        # resume stores sampler permutations / strata id sets here);
        # fetched by load_aux, ignored by load_checkpoint
        for k, v in aux.items():
            entries[f"aux/{k}"] = np.asarray(v)
    # atomic: a wedge/kill mid-write must never corrupt the checkpoint
    # --resume depends on (np.savez appends .npz to extension-less paths)
    tmp = f"{path}.tmp"
    np.savez(tmp, **entries)
    final = path if path.endswith(".npz") else f"{path}.npz"
    os.replace(f"{tmp}.npz", final)


def load_opt_leaves(path: str):
    """Ordered optimizer-state leaves saved by ``save_checkpoint``
    (None when the checkpoint carries no optimizer state)."""
    if path.endswith(".th"):
        return None  # reference checkpoints carry no optimizer state
    data = np.load(path, allow_pickle=False)
    keys = sorted(k for k in data.files if k.startswith("opt/"))
    if not keys:
        return None
    return [jnp.asarray(data[k]) for k in keys]


def load_aux(path: str) -> Dict[str, np.ndarray]:
    """Free-form aux arrays saved by ``save_checkpoint`` (empty for
    reference ``.th`` checkpoints and checkpoints without aux)."""
    if path.endswith(".th"):
        return {}
    data = np.load(path, allow_pickle=False)
    return {
        k[len("aux/"):]: data[k] for k in data.files if k.startswith("aux/")
    }


def load_checkpoint(path: str):
    """Returns (cfg, params, aabb (2,3) np, grid_size, alpha_mask|None, extra).

    A reference PyTorch ``.th`` checkpoint is accepted transparently
    (converted in memory by utils/import_torch.py), so every ``--ckpt``
    entry point works directly on checkpoints trained by the reference."""
    if path.endswith(".th"):
        from .import_torch import load_reference_checkpoint

        return load_reference_checkpoint(path)
    data = np.load(path, allow_pickle=False)
    kwargs = json.loads(bytes(data["kwargs"]).decode())
    grid_size = tuple(kwargs.pop("gridSize"))
    extra = kwargs.pop("extra", None)
    cfg_fields = {f.name for f in dataclasses.fields(ModelConfig)}
    cfg_kwargs = {
        k: (tuple(v) if isinstance(v, list) else v)
        for k, v in kwargs.items()
        if k in cfg_fields
    }
    cfg = ModelConfig(**cfg_kwargs)

    flat = {
        k[len("params/"):]: data[k]
        for k in data.files
        if k.startswith("params/")
    }
    params = _unflatten(flat)

    alpha_mask = None
    if "alphaMask.mask" in data.files:
        alpha_mask = unpack_mask(
            {
                "alphaMask.shape": data["alphaMask.shape"],
                "alphaMask.mask": data["alphaMask.mask"],
                "alphaMask.aabb": data["alphaMask.aabb"],
            }
        )
    return cfg, params, data["aabb"], grid_size, alpha_mask, extra
