"""Scan-based trajectory driver.

One `jax.lax.scan` over a `StepTable` replaces the reference's per-timestep
Python loops (diffusion_latent.py:301-331, :472-534, :1034-1064). The model
is invoked through a callback so any of the three UNet families (or a test
stub) plugs in.

Model callback contract:

    eps_fn(x, t, aux) -> (eps_raw, eps_mod_raw)

where `x` is [B, H, W, C] NHWC, `t` is [B] float32 timesteps, and `aux` is a
dict with scalar per-step values:
    aux["use_delta"] : f32 — 1.0 where the edit is injected this step
    aux["delta_idx"] : i32 — row into stacked per-t delta parameters
    aux["step"]      : i32 — scan step index
`eps_mod_raw` may be None (no-edit paths); raw outputs carry the extra
sigma channels when `learn_sigma` (split here, mirroring
utils/diffusion_utils.py:47-51).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from asyrp_official_tpu.core.ddim import ddim_step, ddpm_step
from asyrp_official_tpu.core.schedule import Schedule
from asyrp_official_tpu.core.steptable import StepTable

__all__ = ["ScanArrays", "sample_chain"]


class ScanArrays(NamedTuple):
    """Device-resident per-step inputs for lax.scan."""

    t: jnp.ndarray
    t_next: jnp.ndarray
    eta: jnp.ndarray
    use_delta: jnp.ndarray
    delta_idx: jnp.ndarray
    step: jnp.ndarray

    @staticmethod
    def from_table(table: StepTable, step_offset: int = 0) -> "ScanArrays":
        n = table.num_steps
        return ScanArrays(
            t=jnp.asarray(table.t),
            t_next=jnp.asarray(table.t_next),
            eta=jnp.asarray(table.eta),
            use_delta=jnp.asarray(table.use_delta),
            delta_idx=jnp.asarray(table.delta_idx),
            # offset keeps per-step rng fold_in indices identical when a
            # trajectory is split into several scan segments
            step=jnp.arange(step_offset, step_offset + n, dtype=jnp.int32),
        )


def sample_chain(
    eps_fn: Callable,
    schedule: Schedule,
    table: StepTable,
    x_init: jnp.ndarray,
    rng: Optional[jax.Array] = None,
    *,
    sample_type: str = "ddim",
    learn_sigma: bool = False,
    dt_lambda: float = 1.0,
    dt_end: int = 999,
    collect: Tuple[str, ...] = (),
    unroll: int = 1,
    step_offset: int = 0,
) -> Tuple[jnp.ndarray, dict]:
    """Run the full trajectory in one scan.

    Args:
      eps_fn: model callback (see module docstring).
      schedule / table: host-side schedule + step table.
      x_init: [B, H, W, C] starting sample (x0 for inversion, xT for
        generation).
      rng: PRNG key for the stochastic branches; may be None when every
        step has eta == 0 and sample_type == 'ddim'.
      collect: any of "x", "x0_t" — per-step trajectories stacked as scan
        outputs ([S, B, H, W, C]), used by the LPIPS-calibration stage
        (diffusion_latent.py:1253-1263) and process dumps.

    Returns:
      (x_final, out) where out holds the collected trajectories.
    """
    arrays = ScanArrays.from_table(table, step_offset)
    acp_ext = jnp.asarray(schedule.alphas_cumprod_ext)
    betas = jnp.asarray(schedule.betas)
    logvar_tab = jnp.asarray(schedule.logvar)
    bsz = x_init.shape[0]

    needs_noise = sample_type == "ddpm" or bool(np.any(table.eta != 0.0))
    if needs_noise and rng is None:
        raise ValueError("rng is required when any step is stochastic")
    if rng is None:
        rng = jax.random.PRNGKey(0)  # traced but multiplied by zero

    def body(x, per_step):
        t_i, t_next_i, eta_i, use_delta_i, delta_idx_i, step_i = per_step
        t_b = jnp.full((bsz,), t_i, jnp.float32)
        aux = {"use_delta": use_delta_i, "delta_idx": delta_idx_i, "step": step_i}
        result = eps_fn(x, t_b, aux)
        extras = {}
        if len(result) == 3:
            eps_raw, eps_mod_raw, extras = result
        else:
            eps_raw, eps_mod_raw = result

        if learn_sigma:
            # channel split, NHWC last axis (utils/diffusion_utils.py:47-51).
            c = eps_raw.shape[-1] // 2
            eps, logvar_learned = eps_raw[..., :c], eps_raw[..., c:]
            eps_mod = eps_mod_raw[..., :c] if eps_mod_raw is not None else eps
        else:
            eps = eps_raw
            eps_mod = eps_mod_raw if eps_mod_raw is not None else eps

        at = acp_ext[t_i + 1]
        at_next = acp_ext[t_next_i + 1]
        if needs_noise:
            noise = jax.random.normal(
                jax.random.fold_in(rng, step_i), x.shape, x.dtype
            )
        else:
            # fully deterministic chain (inversion / eta=0 generation) —
            # skip the per-step B*H*W*C threefry that XLA can't DCE
            # (eta rides the scan as data, so c1=0 is a runtime value)
            noise = jnp.zeros_like(x)

        if sample_type == "ddim":
            apply_dt = None
            if dt_lambda != 1.0:
                apply_dt = (t_i >= dt_end).astype(x.dtype) * jnp.ones((bsz,), x.dtype)
            x_next, x0_t = ddim_step(
                x,
                eps,
                eps_mod,
                jnp.full((bsz,), at),
                jnp.full((bsz,), at_next),
                eta_i,
                noise,
                dt_lambda=dt_lambda,
                apply_dt=apply_dt,
            )
        elif sample_type == "ddpm":
            if learn_sigma:
                logvar = logvar_learned
            else:
                logvar = jnp.full((bsz,), logvar_tab[t_i])
            bt = jnp.full((bsz,), betas[t_i])
            x_next = ddpm_step(
                x, eps, logvar, bt, jnp.full((bsz,), at),
                jnp.full((bsz,), t_i), noise,
            )
            x0_t = (x - eps * jnp.sqrt(1.0 - at)) / jnp.sqrt(at)
        else:
            raise ValueError(f"unknown sample_type: {sample_type}")

        ys = {}
        if "x" in collect:
            ys["x"] = x_next
        if "x0_t" in collect:
            ys["x0_t"] = x0_t
        for k in collect:
            if k in extras:
                ys[k] = extras[k]
        return x_next, ys

    # unroll > 1 lets XLA fuse a step's elementwise DDIM tail into the next
    # step's prologue (compile time rises with the factor)
    x_final, ys = jax.lax.scan(body, x_init, arrays, unroll=unroll)
    return x_final, ys
