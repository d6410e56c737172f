"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's single-host `torch.nn.DataParallel` wrap
(diffusion_latent.py:179,195,591,1201) and its vestigial MPI/NCCL backend
(models/guided_diffusion/dist_util.py:21-93).

Design (SURVEY.md §2.3): per-image diffusion trajectories are independent —
the only cross-image reductions in the whole system are the Δ-parameter
gradient all-reduce during training and the mean-of-Δh accumulation. So:

  * one mesh axis `data` over all chips (ICI);
  * batches sharded on `data`; frozen UNet + Δ params replicated;
  * training grads emerge replicated — XLA inserts the psum over ICI from
    the sharding annotations, no hand-written collectives needed;
  * multi-slice (DCN) scale-out shards the *image list* per slice with a
    host-side reduction for mean-Δh (pipelines side).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh", "shard_batch", "replicate", "batch_spec", "pad_to_multiple",
    "fetch",
]

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(
    n_devices: Optional[int] = None, devices=None, *, spatial: int = 1
) -> Mesh:
    """n_devices=None (or -1, the CLI's 'all') uses every device; asking
    for more devices than exist is an ERROR, not a silent truncation —
    callers size batches against the requested count.

    spatial > 1 builds a 2D `(data, spatial)` mesh of shape
    (n_devices // spatial, spatial): batches shard over `data`, activation
    height over `spatial` (parallel/spatial.py) — the throughput × latency
    composition for larger pods. spatial == 1 keeps the 1D `data` mesh."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None and n_devices != -1:
        if n_devices > len(devices):
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} devices are available"
            )
        devices = devices[:n_devices]
    if spatial <= 1:
        return Mesh(np.asarray(devices), (DATA_AXIS,))
    if len(devices) % spatial:
        raise ValueError(
            f"spatial={spatial} must divide the {len(devices)}-device mesh"
        )
    grid = np.asarray(devices).reshape(len(devices) // spatial, spatial)
    return Mesh(grid, (DATA_AXIS, SPATIAL_AXIS))


def batch_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _put_tree(tree, sharding: NamedSharding) -> Any:
    """device_put on one process; on a multi-process (jax.distributed) mesh,
    build global arrays from the host copy of the FULL value — every process
    must hold the same full value (the runner's pipelines are deterministic
    per-seed, so they do), and each contributes its addressable shards."""
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)

    def put_leaf(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])

    return jax.tree.map(put_leaf, tree)


def shard_batch(mesh: Mesh, x) -> Any:
    """Place a [B, ...] array batch-sharded over the data axis.
    B must divide by mesh size (the reference asserts the same for its
    DataParallel batches, main.py:326-327) — use `pad_to_multiple` first."""
    return _put_tree(x, batch_spec(mesh))


def replicate(mesh: Mesh, tree) -> Any:
    """Replicate a param pytree onto every device of the mesh."""
    return _put_tree(tree, replicate_spec(mesh))


def fetch(x) -> np.ndarray:
    """Host numpy of a device array, multi-process safe. Batch-sharded
    arrays on a mesh spanning several processes have non-addressable shards
    (np.asarray raises); `process_allgather` on such an array returns the
    fully-replicated global value on every host. Fully-replicated or
    single-process arrays fetch directly."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        if x.is_fully_replicated:
            return np.asarray(x)
        from jax.experimental import multihost_utils

        # tiled=True is REQUIRED for global (non-fully-addressable) arrays;
        # the result is the full global value, replicated on every host
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def pad_to_multiple(x: np.ndarray, m: int):
    """Pad the batch axis to a multiple of m; returns (padded, real_count)."""
    b = x.shape[0]
    rem = (-b) % m
    if rem:
        pad = np.repeat(x[-1:], rem, axis=0)
        x = np.concatenate([x, pad], axis=0)
    return x, b
