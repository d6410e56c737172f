"""Diffusion noise schedules and skip-step grids (pure functions, no device state).

Numerical-parity notes vs the PyTorch reference:
  * betas are built in float64 then truncated to float32
    (reference: utils/diffusion_utils.py:5-9, diffusion_latent.py:41-46).
  * alphas_cumprod used by the DDIM update is the float32 cumulative product
    of (1 - betas_f32) — the reference recomputes `(1.0 - b).cumprod(dim=0)`
    from the float32 beta tensor on every step
    (utils/diffusion_utils.py:67).
  * the posterior log-variance table is computed in float64 numpy
    (diffusion_latent.py:49-61).
  * skip grids use `int(s + 1e-6)` truncation of `linspace(0,1,n)*t_0`
    (diffusion_latent.py:154-156) — reproduced exactly.
"""
from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import numpy as np

__all__ = [
    "Schedule",
    "linear_beta_schedule",
    "make_schedule",
    "uniform_seq",
    "prev_seq",
]


def linear_beta_schedule(
    beta_start: float, beta_end: float, num_diffusion_timesteps: int
) -> np.ndarray:
    """Linear beta schedule in float64 (reference utils/diffusion_utils.py:5-9)."""
    betas = np.linspace(beta_start, beta_end, num_diffusion_timesteps, dtype=np.float64)
    assert betas.shape == (num_diffusion_timesteps,)
    return betas


@dataclasses.dataclass(frozen=True)
class Schedule:
    """Immutable host-side schedule tables.

    Attributes:
      betas: float32 [T].
      alphas_cumprod: float32 [T] — float32 cumprod of (1 - betas), matching
        the reference's per-step recomputation semantics.
      alphas_cumprod_ext: float32 [T+1] — `[1.0, alphas_cumprod...]` so that
        a lookup at timestep index `t + 1` handles the reference's
        `t_next == -1 → alpha = 1` convention
        (utils/diffusion_utils.py:68-71) without a branch.
      logvar: float32 [T] — fixedsmall/fixedlarge posterior log-variance
        (diffusion_latent.py:57-61).
      num_timesteps: T.
    """

    betas: np.ndarray
    alphas_cumprod: np.ndarray
    alphas_cumprod_ext: np.ndarray
    logvar: np.ndarray
    num_timesteps: int

    @property
    def T(self) -> int:  # noqa: N802 — conventional diffusion notation
        return self.num_timesteps


def make_schedule(
    *,
    num_timesteps: int = 1000,
    beta_start: float = 1e-4,
    beta_end: float = 0.02,
    var_type: str = "fixedsmall",
) -> Schedule:
    """Build the full schedule the runner owns (diffusion_latent.py:40-61)."""
    betas64 = linear_beta_schedule(beta_start, beta_end, num_timesteps)
    betas32 = betas64.astype(np.float32)

    # float32 path — must match torch `(1.0 - b).cumprod(dim=0)` on a float32 b.
    acp32 = np.cumprod((1.0 - betas32).astype(np.float32), dtype=np.float32)

    # float64 path for the posterior variance table (diffusion_latent.py:49-61).
    alphas64 = 1.0 - betas64
    acp64 = np.cumprod(alphas64, axis=0)
    acp64_prev = np.append(1.0, acp64[:-1])
    posterior_variance = betas64 * (1.0 - acp64_prev) / (1.0 - acp64)
    if var_type == "fixedlarge":
        logvar = np.log(np.append(posterior_variance[1], betas64[1:]))
    elif var_type == "fixedsmall":
        logvar = np.log(np.maximum(posterior_variance, 1e-20))
    else:
        raise ValueError(f"unknown var_type: {var_type}")

    return Schedule(
        betas=betas32,
        alphas_cumprod=acp32,
        alphas_cumprod_ext=np.concatenate(
            [np.ones((1,), np.float32), acp32]
        ).astype(np.float32),
        logvar=logvar.astype(np.float32),
        num_timesteps=num_timesteps,
    )


def uniform_seq(n_steps: int, t_0: int) -> List[int]:
    """Uniform skip grid: `int(s+1e-6) for s in linspace(0,1,n)*t_0`
    (diffusion_latent.py:154-156, :164-165, :570-573, :955-956)."""
    if n_steps == 0:
        raise ValueError("n_steps == 0 means 'no skip'; build range(t_edit, t_0) instead")
    seq = np.linspace(0, 1, n_steps) * t_0
    return [int(s + 1e-6) for s in seq]


def prev_seq(seq: Sequence[int]) -> List[int]:
    """The `[-1] + seq[:-1]` companion grid (diffusion_latent.py:161)."""
    return [-1] + list(seq[:-1])


def space_timesteps(num_timesteps: int, section_counts) -> List[int]:
    """DDIM-style timestep respacing (the vestigial
    models/guided_diffusion/respace.py:7 capability): split [0, T) into
    len(section_counts) sections and stride each to its count. Accepts
    "ddimN" shorthand for an exact N-step uniform stride."""
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            n = int(section_counts[4:])
            for stride in range(1, num_timesteps):
                if len(range(0, num_timesteps, stride)) == n:
                    return list(range(0, num_timesteps, stride))
            raise ValueError(f"cannot create exactly {n} steps with an integer stride")
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start = 0
    out: List[int] = []
    for i, count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < count:
            raise ValueError(f"cannot divide section of {size} steps into {count}")
        stride = 1.0 if count <= 1 else (size - 1) / (count - 1)
        cur = 0.0
        for _ in range(count):
            out.append(start + round(cur))
            cur += stride
        start += size
    return out


def update_ema(ema_tree, new_tree, rate: float = 0.999):
    """EMA update (the vestigial models/improved_ddpm/nn.py:55-65
    capability) for param pytrees: ema = rate·ema + (1-rate)·new."""
    import jax

    return jax.tree.map(lambda e, p: e * rate + p * (1.0 - rate), ema_tree, new_tree)


def train_seq(n_train_step: int, t_0: int, t_edit: int) -> Tuple[List[int], List[int]]:
    """Training grid: uniform grid filtered to `>= t_edit`
    (diffusion_latent.py:152-161). Returns (seq_train, seq_train_next)."""
    if n_train_step != 0:
        seq = np.linspace(0, 1, n_train_step) * t_0
        seq = seq[seq >= t_edit]
        seq = [int(s + 1e-6) for s in seq]
    else:
        seq = list(range(t_edit, t_0))
    return seq, prev_seq(seq)
