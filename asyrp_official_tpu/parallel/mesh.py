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

__all__ = ["make_mesh", "shard_batch", "replicate", "batch_spec", "pad_to_multiple"]

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """n_devices=None (or -1, the CLI's 'all') uses every device; asking
    for more devices than exist is an ERROR, not a silent truncation —
    callers size batches against the requested count."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None and n_devices != -1:
        if n_devices > len(devices):
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} devices are available"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, x) -> Any:
    """Place a [B, ...] array batch-sharded over the data axis.
    B must divide by mesh size (the reference asserts the same for its
    DataParallel batches, main.py:326-327) — use `pad_to_multiple` first."""
    return jax.device_put(x, batch_spec(mesh))


def replicate(mesh: Mesh, tree) -> Any:
    """Replicate a param pytree onto every device of the mesh."""
    return jax.device_put(tree, replicate_spec(mesh))


def pad_to_multiple(x: np.ndarray, m: int):
    """Pad the batch axis to a multiple of m; returns (padded, real_count)."""
    b = x.shape[0]
    rem = (-b) % m
    if rem:
        pad = np.repeat(x[-1:], rem, axis=0)
        x = np.concatenate([x, pad], axis=0)
    return x, b
