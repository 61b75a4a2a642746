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


def shard_ray_store_per_host(allrays, allrgbs, global_batch: int):
    """Disjoint per-host shard of the (filtered) training ray store.

    Multi-host data layout: host p keeps rays [p::n_proc] and samples
    global_batch // n_proc rays per step; the global batch is the union of
    the per-host batches (the reference has no multi-host story at all —
    SURVEY.md §2.10).  Single-process runs return the inputs unchanged.

    Returns (rays, rgbs, local_batch).
    """
    n_proc = jax.process_count()
    if n_proc <= 1:
        return allrays, allrgbs, global_batch
    if global_batch % n_proc:
        raise ValueError(
            f"batch_size {global_batch} must divide by process count {n_proc}"
        )
    p = jax.process_index()
    return allrays[p::n_proc], allrgbs[p::n_proc], global_batch // n_proc


def host_allsum(vec: np.ndarray) -> np.ndarray:
    """Element-wise sum of a fixed-shape host-local array across all
    processes (identity single-process).

    Used to build the GLOBAL candidate-count histogram every host derives
    identical stratification statics from: under multi-host SPMD each
    process must compile the same step program and sub-batch shapes, but
    the ray store is sharded per host (shard_ray_store_per_host), so
    host-local stratum edges/budgets/quotas would diverge.
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
