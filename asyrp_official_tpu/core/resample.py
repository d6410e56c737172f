"""Timestep schedule samplers for VLB/MSE training — the reference's
vestigial importance-sampling tier (models/guided_diffusion/resample.py:
8-153), ported so the training surface is complete.

Host-side numpy state (the reference keeps it on the host too); the
multi-process loss exchange uses `jax.experimental.multihost_utils` where
the reference used torch.distributed all_gather (resample.py:71-105).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

__all__ = [
    "create_named_schedule_sampler",
    "UniformSampler",
    "LossSecondMomentResampler",
]


def create_named_schedule_sampler(name: str, num_timesteps: int):
    """resample.py:8-20."""
    if name == "uniform":
        return UniformSampler(num_timesteps)
    if name == "loss-second-moment":
        return LossSecondMomentResampler(num_timesteps)
    raise NotImplementedError(f"unknown schedule sampler: {name}")


class _ScheduleSampler:
    """sample(): importance-sample timesteps and the 1/(N·p) loss
    reweighting that keeps the objective unbiased (resample.py:42-58)."""

    num_timesteps: int

    def weights(self) -> np.ndarray:
        raise NotImplementedError

    def sample(
        self, batch_size: int, rng: np.random.RandomState
    ) -> Tuple[np.ndarray, np.ndarray]:
        w = self.weights()
        p = w / np.sum(w)
        indices = rng.choice(len(p), size=(batch_size,), p=p)
        weights = 1.0 / (len(p) * p[indices])
        return indices.astype(np.int64), weights.astype(np.float32)


class UniformSampler(_ScheduleSampler):
    def __init__(self, num_timesteps: int):
        self.num_timesteps = num_timesteps
        self._weights = np.ones([num_timesteps], np.float64)

    def weights(self) -> np.ndarray:
        return self._weights


class LossSecondMomentResampler(_ScheduleSampler):
    """Importance-sample t ∝ sqrt(E[loss²]) over a rolling per-timestep
    history, with a uniform floor; uniform until every term has a full
    history (resample.py:124-153)."""

    def __init__(self, num_timesteps: int, history_per_term: int = 10,
                 uniform_prob: float = 0.001):
        self.num_timesteps = num_timesteps
        self.history_per_term = history_per_term
        self.uniform_prob = uniform_prob
        self._loss_history = np.zeros(
            [num_timesteps, history_per_term], np.float64
        )
        self._loss_counts = np.zeros([num_timesteps], np.int64)

    def weights(self) -> np.ndarray:
        if not self._warmed_up():
            return np.ones([self.num_timesteps], np.float64)
        w = np.sqrt(np.mean(self._loss_history ** 2, axis=-1))
        w /= np.sum(w)
        w *= 1 - self.uniform_prob
        w += self.uniform_prob / len(w)
        return w

    def update_with_all_losses(self, ts, losses) -> None:
        for t, loss in zip(ts, losses):
            if self._loss_counts[t] == self.history_per_term:
                self._loss_history[t, :-1] = self._loss_history[t, 1:]
                self._loss_history[t, -1] = loss
            else:
                self._loss_history[t, self._loss_counts[t]] = loss
                self._loss_counts[t] += 1

    def update_with_local_losses(self, local_ts, local_losses) -> None:
        """Cross-process variant (resample.py:71-105): every process sees
        every process's losses so the histories stay identical. Like the
        reference, batch sizes are gathered first and each batch padded to
        the max — `process_allgather` needs identical shapes per process,
        and the last step of an epoch can leave hosts with ragged
        batches."""
        import jax

        local_ts = np.asarray(local_ts, np.int64).reshape(-1)
        local_losses = np.asarray(local_losses, np.float64).reshape(-1)
        if jax.process_count() == 1:
            self.update_with_all_losses(local_ts, local_losses)
            return
        from jax.experimental import multihost_utils

        batch_sizes = multihost_utils.process_allgather(
            np.asarray([local_ts.shape[0]], np.int32)
        ).reshape(-1)
        pad = int(batch_sizes.max()) - local_ts.shape[0]
        ts_all = multihost_utils.process_allgather(np.pad(local_ts, (0, pad)))
        losses_all = multihost_utils.process_allgather(
            np.pad(local_losses, (0, pad))
        )
        ts = np.concatenate(
            [ts_all[p, : batch_sizes[p]] for p in range(len(batch_sizes))]
        )
        losses = np.concatenate(
            [losses_all[p, : batch_sizes[p]] for p in range(len(batch_sizes))]
        )
        self.update_with_all_losses(ts, losses)

    def _warmed_up(self) -> bool:
        return bool((self._loss_counts == self.history_per_term).all())
