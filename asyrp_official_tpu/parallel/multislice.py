"""Multi-slice / multi-host scale-out over DCN.

SURVEY.md §2.3: the math has NO cross-image coupling — per-image
trajectories are independent, and the only global reductions are Δ-grad
averaging and mean-Δh accumulation. The DCN-efficient layout is therefore
embarrassingly parallel: each slice (process group) takes a contiguous
shard of the IMAGE LIST, runs its own ICI-internal data/spatial-parallel
pipeline, and the small Δ state is combined host-side (or with one
`jax.experimental.multihost_utils` all-reduce per outer iteration).
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import numpy as np

__all__ = ["shard_work", "combine_delta_means", "process_info"]


def process_info() -> Tuple[int, int]:
    """(process_index, process_count) — 0/1 on single-host."""
    return jax.process_index(), jax.process_count()


def shard_work(items: Sequence, index: int = None, count: int = None) -> List:
    """Contiguous shard of a work list for this slice. Deterministic, and
    balanced with the remainder spread over the first n%count slices — a
    ceil-division split can hand trailing slices EMPTY shards, which then
    deadlock collective combines."""
    if index is None or count is None:
        index, count = process_info()
    n = len(items)
    base, rem = divmod(n, count)
    start = index * base + min(index, rem)
    size = base + (1 if index < rem else 0)
    return list(items[start : start + size])


def combine_delta_means(local_sum: np.ndarray, local_count: int):
    """Global mean of per-slice Δh sums (mean-of-Δh across slices,
    diffusion_latent.py:810-835 semantics). Uses a psum over all processes
    when running multi-host; plain division on one host."""
    if jax.process_count() == 1:
        return local_sum / max(local_count, 1)
    from jax.experimental import multihost_utils

    total = multihost_utils.process_allgather(local_sum).sum(axis=0)
    counts = multihost_utils.process_allgather(
        np.asarray([local_count], np.int64)
    ).sum()
    return total / max(int(counts), 1)
