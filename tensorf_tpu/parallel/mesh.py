"""Ray-batch data parallelism over a jax.sharding.Mesh.

The reference has no in-process parallelism (single CUDA device,
train.py:40; multi-GPU = process-level sweeps, SURVEY.md §2.10).  The TPU
design shards ray batches over a 1-D ``data`` mesh axis: parameters are
replicated, each chip renders its ray shard, and XLA inserts the gradient
``psum`` over ICI automatically from the sharding annotations — no
hand-written collectives (GSPMD partitioning of the jitted train step).

Multi-host runs extend the same mesh over all processes via
``jax.distributed.initialize`` (call before device queries); the code here
is agnostic to host count.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int = 0, axis: str = "data") -> Mesh:
    """1-D device mesh over the first n (default: all) visible devices."""
    devs = jax.devices()
    if n_devices and n_devices > 0:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_rays(mesh: Mesh, arr, axis: str = "data"):
    """Shard the leading (ray-batch) dimension across the mesh."""
    return jax.device_put(arr, NamedSharding(mesh, P(axis)))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / optimizer state) on every device."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def pad_to_multiple(arr: np.ndarray, multiple: int):
    """Pad the leading dim so batches divide evenly across devices;
    returns (padded, original_length)."""
    n = arr.shape[0]
    rem = n % multiple
    if rem == 0:
        return arr, n
    pad = multiple - rem
    return (
        np.concatenate([arr, np.broadcast_to(arr[-1:], (pad,) + arr.shape[1:])]),
        n,
    )


def host_ray_pool(n_rays: int, global_batch: int):
    """Disjoint per-host ID pool over the (filtered) training ray store.

    Multi-host data layout (validated by a real 2-process gloo run,
    scripts/multihost_smoke.py): the STORE is kept bit-identical on every
    host and replicated over the global mesh — a per-host row-sliced store
    can't be a valid replicated global jax.Array (different content per
    process breaks the SPMD data model).  Host disjointness lives in ID
    space instead: host p samples only ids ``p::n_proc``, so the global
    batch is still a disjoint union of per-host draws (the reference has
    no multi-host story at all — SURVEY.md §2.10).

    Returns (pool_ids | None, local_batch): ``pool_ids`` is this host's id
    subset (None single-process), ``local_batch`` its per-step draw.
    """
    n_proc = jax.process_count()
    if n_proc <= 1:
        return None, global_batch
    if global_batch % n_proc:
        raise ValueError(
            f"batch_size {global_batch} must divide by process count {n_proc}"
        )
    p = jax.process_index()
    return np.arange(n_rays, dtype=np.int64)[p::n_proc], (
        global_batch // n_proc
    )


def global_ids_from_local(mesh: Mesh, local_ids: np.ndarray, axis: str = "data"):
    """Form the GLOBAL id batch from this host's local draw.

    Multi-process: ``jax.make_array_from_process_local_data`` lays host p's
    ``local_ids`` on its addressable shards of the row-sharded global array
    (global batch = concat of per-host draws in process order).  The local
    draw must divide evenly over this host's devices — allocate_quotas
    rounds to ``max(8, n_devices)`` which guarantees it.  Single-process:
    plain sharded device_put.
    """
    sh = NamedSharding(mesh, P(axis))
    if jax.process_count() <= 1:
        return jax.device_put(local_ids, sh)
    return jax.make_array_from_process_local_data(sh, np.ascontiguousarray(local_ids))


def to_host(x) -> np.ndarray:
    """Fetch a jax.Array to host numpy, gathering shards that live on other
    processes (``device_get`` refuses arrays spanning non-addressable
    devices).  All processes must call this in lockstep (it is a
    collective under multi-host); identity-ish single-process."""
    if jax.process_count() <= 1:
        return np.asarray(x)
    if not isinstance(x, jax.Array) or x.is_fully_addressable:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def host_allsum(vec: np.ndarray) -> np.ndarray:
    """Element-wise sum of a fixed-shape host-local array across all
    processes (identity single-process).

    Retained as a general cross-host reduction primitive.  (The r3 design
    summed per-shard count histograms with it; since the store became
    bit-identical on every host — host_ray_pool — stratification statics
    agree by construction and no longer need it.)
    """
    if jax.process_count() <= 1:
        return np.asarray(vec)
    from jax.experimental import multihost_utils

    g = multihost_utils.process_allgather(np.asarray(vec))
    return np.asarray(g).sum(axis=0)


def host_allmax(vec: np.ndarray) -> np.ndarray:
    """Element-wise max across all processes (identity single-process);
    used for per-stratum chord maxima so lattice caps agree on every host.
    """
    if jax.process_count() <= 1:
        return np.asarray(vec)
    from jax.experimental import multihost_utils

    g = multihost_utils.process_allgather(np.asarray(vec))
    return np.asarray(g).max(axis=0)


def batch_sharding(mesh: Optional[Mesh], axis: str = "data"):
    if mesh is None:
        return None
    return NamedSharding(mesh, P(axis))
