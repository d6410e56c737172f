"""Spatial tensor-parallelism: shard ONE image's activations across chips.

Data parallelism (mesh.py) scales throughput but cannot reduce per-image
latency — a single 40-step trajectory is sequential. Sharding the activation
HEIGHT axis across the mesh does: every conv runs on H/n rows per chip with
XLA's SPMD partitioner inserting the 3x3-conv halo exchanges and the
GroupNorm/attention collectives automatically (ICI). On a v4-8 this turns
the p50 single-image invert+edit into ~4 chips' worth of parallel conv work.

Usage (params replicated, input spatially sharded — engines unchanged):

    mesh = pmesh.make_mesh()
    params = pmesh.replicate(mesh, params)
    x = spatial_shard(mesh, x0)          # [B, H, W, C], H split over chips
    x_lat, _ = engine.make_invert(spec, sched, seq)(params, x)

Throughput x latency composed — a 2D (data, spatial) mesh shards batch
AND height simultaneously (the runner's `--dp D --sp S`):

    mesh = pmesh.make_mesh(8, spatial=2)       # 4 image groups x 2-way split
    x = batch_spatial_shard(mesh, x0)

The compute path is pure XLA (GSPMD-partitionable everywhere); the compiled
sharded program's collectives are asserted in tests/test_spatial_parallel.py.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from asyrp_official_tpu.parallel.mesh import DATA_AXIS, SPATIAL_AXIS, _put_tree

__all__ = ["spatial_spec", "spatial_shard", "batch_spatial_spec", "batch_spatial_shard"]


def spatial_spec(mesh: Mesh) -> NamedSharding:
    """[B, H, W, C] with H sharded over the (1D) mesh axis — the pure
    latency mode: every chip works on one image's rows."""
    return NamedSharding(mesh, P(None, DATA_AXIS, None, None))


def spatial_shard(mesh: Mesh, x) -> jax.Array:
    """Place an image batch with the height axis split across chips.
    H must be divisible by the mesh size."""
    if x.shape[1] % mesh.devices.size:
        # ValueError, not assert: user-reachable misuse must stay loud
        # under python -O (same convention as make_mesh / AsyrpRunner)
        raise ValueError(
            f"H={x.shape[1]} not divisible by {mesh.devices.size} devices"
        )
    return jax.device_put(x, spatial_spec(mesh))


def batch_spatial_spec(mesh: Mesh) -> NamedSharding:
    """[B, H, W, C] on a 2D (data, spatial) mesh: batch over `data`,
    height over `spatial` — throughput × latency composed."""
    if SPATIAL_AXIS not in mesh.axis_names:
        raise ValueError(
            f"mesh has no '{SPATIAL_AXIS}' axis (axes: {mesh.axis_names}) — "
            "build it with make_mesh(n, spatial=S)"
        )
    return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS, None, None))


def batch_spatial_shard(mesh: Mesh, x) -> jax.Array:
    """Commit a batch onto a 2D mesh: B divides by the data axis, H by the
    spatial axis (multi-process safe via mesh._put_tree)."""
    dp = mesh.shape[DATA_AXIS]
    sp = mesh.shape[SPATIAL_AXIS]
    if x.shape[0] % dp:
        raise ValueError(f"B={x.shape[0]} not divisible by data={dp}")
    if x.shape[1] % sp:
        raise ValueError(f"H={x.shape[1]} not divisible by spatial={sp}")
    return _put_tree(x, batch_spatial_spec(mesh))
