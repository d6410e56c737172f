"""Profiling & tracing — the observability tier the reference lacks
(SURVEY.md §5: ad-hoc time.time() prints only).

  * `trace(dir)` — context manager around `jax.profiler` producing a
    TensorBoard-loadable trace of the device timeline;
  * `Timer` — honest wall timers (host-fetch completion barrier — see
    .claude/skills/verify/SKILL.md: `block_until_ready` can be a no-op on
    relay-attached TPUs);
  * `throughput` — evals/sec/chip counter for the BASELINE.json metric.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp

__all__ = ["trace", "Timer", "throughput", "force"]


def force(tree) -> float:
    """Completion barrier that works everywhere: fetch a scalar reduction."""
    leaves = jax.tree.leaves(tree)
    total = 0.0
    for l in leaves[:1]:  # one leaf is enough to drain the stream
        total += float(jnp.sum(l))
    return total


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Accumulating section timer with honest device sync."""

    def __init__(self):
        self.times: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def section(self, name: str, result=None):
        t0 = time.perf_counter()
        yield
        if result is not None:
            force(result)
        self.times.setdefault(name, []).append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, float]:
        return {
            k: sum(v) / len(v) for k, v in self.times.items() if v
        }


def throughput(
    fn: Callable, args, *, iters: int = 10, batch_axis_size: int = 1,
    chain_index: Optional[int] = None,
) -> float:
    """evals/sec for a jitted fn. When `chain_index` is given, the output is
    fed back into that positional arg — defeating async-dispatch
    fake-pipelining."""
    out = fn(*args)
    force(out)
    args = list(args)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        if chain_index is not None:
            args[chain_index] = out
    force(out)
    dt = (time.perf_counter() - t0) / iters
    return batch_axis_size / dt
