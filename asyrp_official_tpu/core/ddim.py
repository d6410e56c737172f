"""Pure DDIM/DDPM step functions — the sampler "kernel".

Mirrors the math of the reference `denoising_step`
(utils/diffusion_utils.py:24-109) as branch-free JAX functions suitable for
`lax.scan`:

  * the asymmetric-x0 rule of Asyrp — `x0_t` from the *edited* eps, the
    direction-to-xt term from the *original* eps
    (utils/diffusion_utils.py:84-92);
  * the eta-noise branch is expressed so that eta == 0 reduces to the
    deterministic branch bit-for-bit: c1 = 0, c2 = sqrt(1 - at_next);
  * `t_next == -1` is handled by the caller looking up
    `alphas_cumprod_ext[t_next + 1]` (schedule.py) instead of a branch.

All functions take NHWC (or any layout) tensors — they only broadcast over
the batch axis.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

__all__ = ["ddim_step", "ddpm_step", "bvec"]


def bvec(a: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Reshape a per-batch scalar [B] for broadcasting against a [B, ...] tensor
    (the reference's `extract`, utils/diffusion_utils.py:12-20)."""
    return a.reshape(a.shape + (1,) * (ndim - a.ndim))


def ddim_step(
    x: jnp.ndarray,
    eps: jnp.ndarray,
    eps_mod: jnp.ndarray,
    at: jnp.ndarray,
    at_next: jnp.ndarray,
    eta: jnp.ndarray,
    noise: jnp.ndarray,
    *,
    dt_lambda: float = 1.0,
    apply_dt: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One DDIM update (generation when at < at_next is False... direction is
    set purely by the (at, at_next) pair, so inversion is the same function).

    Args:
      x: [B, ...] current sample x_t.
      eps: [B, ...] original noise prediction (direction-to-xt term).
      eps_mod: [B, ...] edited noise prediction (predicted-x0 term). Pass
        `eps` when not editing.
      at, at_next: [B] or scalar alpha-bar at t and t_next.
      eta: scalar or [B] stochasticity weight (utils/diffusion_utils.py:95).
      noise: [B, ...] standard normal sample (ignored when eta == 0, but must
        be supplied to keep the traced graph static).
      dt_lambda / apply_dt: optional dt calibration hook
        (utils/diffusion_utils.py:99-100): where `apply_dt` is 1, the update
        is recomputed with the direction term scaled by `dt_lambda`.

    Returns:
      (x_next, x0_t) — matching reference returns (:92, :97).
    """
    nd = x.ndim
    # coefficient math stays float32 regardless of the carry dtype: alpha-bar
    # near 1 collapses to exactly 1.0 in bf16 (8-bit mantissa), which would
    # zero sqrt(1-at) and destroy early steps
    out_dtype = x.dtype
    x = x.astype(jnp.float32)
    eps = eps.astype(jnp.float32)
    eps_mod = eps_mod.astype(jnp.float32)
    noise = noise.astype(jnp.float32)
    at = bvec(jnp.asarray(at, jnp.float32), nd)
    at_next = bvec(jnp.asarray(at_next, jnp.float32), nd)
    eta = bvec(jnp.asarray(eta, jnp.float32).reshape(-1), nd) if jnp.ndim(eta) else eta

    x0_t = (x - eps_mod * jnp.sqrt(1.0 - at)) / jnp.sqrt(at)

    # eta branch, written so eta == 0 gives c1 = 0 and c2 = sqrt(1 - at_next)
    # exactly (the reference's deterministic branch, :91-92).
    ratio = jnp.clip((1.0 - at / at_next) * (1.0 - at_next) / (1.0 - at), 0.0, None)
    c1 = eta * jnp.sqrt(ratio)
    c2 = jnp.sqrt(jnp.clip((1.0 - at_next) - c1 * c1, 0.0, None))
    x_next = jnp.sqrt(at_next) * x0_t + c2 * eps + c1 * noise

    if apply_dt is not None:
        # dt_lambda calibration (utils/diffusion_utils.py:99-100).
        x_dt = jnp.sqrt(at_next) * x0_t + jnp.sqrt(1.0 - at_next) * eps * dt_lambda
        x_next = jnp.where(bvec(jnp.asarray(apply_dt, x.dtype), nd) > 0, x_dt, x_next)

    return x_next.astype(out_dtype), x0_t.astype(out_dtype)


def ddpm_step(
    x: jnp.ndarray,
    eps: jnp.ndarray,
    logvar: jnp.ndarray,
    bt: jnp.ndarray,
    at: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
) -> jnp.ndarray:
    """One DDPM ancestral step (utils/diffusion_utils.py:74-82).

    Args:
      x: [B, ...]; eps: [B, ...] noise prediction.
      logvar: [B] log-variance (table gather or learned).
      bt, at: [B] beta_t and alpha-bar_t.
      t: [B] integer timestep (noise is masked where t == 0).
      noise: [B, ...] standard normal sample.
    """
    nd = x.ndim
    # same f32-coefficient rule as ddim_step: alpha-bar near 1 collapses
    # to exactly 1.0 in a bf16 carry, making weight = bt/sqrt(1-at) inf
    out_dtype = x.dtype
    x = x.astype(jnp.float32)
    eps = eps.astype(jnp.float32)
    noise = noise.astype(jnp.float32)
    bt = bvec(jnp.asarray(bt, jnp.float32), nd)
    at = bvec(jnp.asarray(at, jnp.float32), nd)
    logvar = bvec(jnp.asarray(logvar, jnp.float32), nd)
    weight = bt / jnp.sqrt(1.0 - at)
    mean = 1.0 / jnp.sqrt(1.0 - bt) * (x - weight * eps)
    mask = bvec(1.0 - (jnp.asarray(t).reshape(-1) == 0).astype(x.dtype), nd)
    out = mean + mask * jnp.exp(0.5 * logvar) * noise
    return out.astype(out_dtype)
