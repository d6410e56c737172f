"""Static step tables: the reference's per-step Python control flow, compiled.

The reference decides three things with runtime Python branches inside its
timestep loops:
  * whether the edit is injected      — `t[0] >= t_edit`
    (models/ddpm/diffusion.py:510, diffusion_latent.py:514-516);
  * whether noise boosting is active  — `eta = 1.0 if t[0] < t_addnoise`
    (diffusion_latent.py:513);
  * which per-t delta row to use      — `delta_h_dict[int(t[0].item())]`
    (diffusion_latent.py:516).

Here all three become host-built integer/float arrays indexed by the scan
step, so the whole trajectory is ONE `jax.lax.scan` in ONE XLA compilation.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np

from asyrp_official_tpu.core.schedule import prev_seq

__all__ = ["StepTable", "generation_table", "inversion_table"]


@dataclasses.dataclass(frozen=True)
class StepTable:
    """Per-step scan inputs (host numpy; converted to device arrays by the sampler).

    t[i] / t_next[i]: integer timesteps for step i (t_next may be -1).
    eta[i]: stochasticity weight (1.0 inside the quality-boost window).
    use_delta[i]: 1.0 where the edit is injected (t >= t_edit).
    delta_idx[i]: row index into a stacked [K, ...] delta_h parameter
      (0 where unused or when a single time-shared row is trained with
      `ignore_timesteps`, diffusion_latent.py:189,317).
    """

    t: np.ndarray
    t_next: np.ndarray
    eta: np.ndarray
    use_delta: np.ndarray
    delta_idx: np.ndarray

    @property
    def num_steps(self) -> int:
        return int(self.t.shape[0])

    def slice(self, start: int, stop: int) -> "StepTable":
        """Contiguous sub-table [start:stop) — used to split a generation
        into branch-free scan segments (engine splits at the t_edit
        boundary instead of paying a per-step lax.cond)."""
        return StepTable(
            t=self.t[start:stop],
            t_next=self.t_next[start:stop],
            eta=self.eta[start:stop],
            use_delta=self.use_delta[start:stop],
            delta_idx=self.delta_idx[start:stop],
        )

    def edit_prefix_len(self) -> Optional[int]:
        """Length of the leading use_delta == 1 run, or None if the mask is
        not a contiguous prefix. Generation tables walk t descending, so
        `t >= t_edit` is always a prefix; delta_times holes can break it."""
        use = np.asarray(self.use_delta)
        k = int(use.sum())
        if np.all(use[:k] == 1.0) and np.all(use[k:] == 0.0):
            return k
        return None


def _delta_index_map(
    ts: Sequence[int],
    delta_times: Optional[Sequence[int]],
    ignore_timesteps: bool,
) -> np.ndarray:
    if delta_times is None or ignore_timesteps:
        return np.zeros((len(ts),), np.int32)
    lookup = {int(t): i for i, t in enumerate(delta_times)}
    return np.array([lookup.get(int(t), 0) for t in ts], np.int32)


def generation_table(
    seq: Sequence[int],
    *,
    t_edit: int = 0,
    t_addnoise: int = -1,
    delta_times: Optional[Sequence[int]] = None,
    ignore_timesteps: bool = False,
    eta_base: float = 0.0,
) -> StepTable:
    """Reverse-process table over `reversed(seq)` pairs
    (diffusion_latent.py:503-520).

    `t_addnoise = -1` disables boosting; `eta_base` sets the eta outside the
    boost window (the reference always uses 0 there).
    """
    seq = list(seq)
    nxt = prev_seq(seq)
    ts = list(reversed(seq))
    tn = list(reversed(nxt))
    eta = np.array(
        [1.0 if t < t_addnoise else eta_base for t in ts], np.float32
    )
    use_delta = np.array([1.0 if t >= t_edit else 0.0 for t in ts], np.float32)
    if delta_times is not None and not ignore_timesteps:
        # sparse Δ rows: a step with no row gets NO injection. The old
        # behavior silently fell back to row 0 — the delta trained for a
        # different timestep (the reference hard-errors on a missing
        # delta_h_dict key instead, diffusion_latent.py:512-516)
        have = {int(t) for t in delta_times}
        use_delta *= np.array(
            [1.0 if int(t) in have else 0.0 for t in ts], np.float32
        )
    return StepTable(
        t=np.array(ts, np.int32),
        t_next=np.array(tn, np.int32),
        eta=eta,
        use_delta=use_delta,
        delta_idx=_delta_index_map(ts, delta_times, ignore_timesteps),
    )


def inversion_table(seq: Sequence[int]) -> StepTable:
    """DDIM-inversion table: ascending (t, t_next) = (seq[k], seq[k+1]) pairs
    — the reference reuses the same `denoising_step` with swapped indices
    (diffusion_latent.py:1034-1044). eta = 0, no edit."""
    seq = list(seq)
    ts = seq[:-1]
    tn = seq[1:]
    n = len(ts)
    return StepTable(
        t=np.array(ts, np.int32),
        t_next=np.array(tn, np.int32),
        eta=np.zeros((n,), np.float32),
        use_delta=np.zeros((n,), np.float32),
        delta_idx=np.zeros((n,), np.int32),
    )
