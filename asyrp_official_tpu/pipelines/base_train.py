"""Base diffusion-model training — the TPU-native equivalent of the
reference's vestigial upstream `TrainLoop`
(models/guided_diffusion/train_util.py:22-301: DDP training with EMA,
importance sampling, anneal, fp16 master params). The Asyrp pipeline only
ever FREEZES pretrained models; this tier completes the surface for users
who train the diffusion model itself.

TPU-first design:
  * one jitted step = q_sample → model → (hybrid) loss → grad → optax
    update → EMA update; no Python inside;
  * mixed precision is bf16 compute via `compute_dtype` (fp16 master-param
    machinery is unnecessary on TPU — bf16 shares the f32 exponent);
  * data parallelism is mesh sharding of the batch: replicate params,
    shard x0/t/noise, and GSPMD inserts the grad all-reduce (the DDP
    equivalent, train_util.py's MixedPrecisionTrainer + DDP wrap);
  * timestep importance sampling stays host-side (core/resample.py), its
    per-step losses flow back out of the jitted step for the history
    update — mirroring the reference's update_with_local_losses hook
    (train_util.py:189,205-206 region, resample.py:71-105).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from asyrp_official_tpu.core import gaussian as G
from asyrp_official_tpu.core.schedule import update_ema

__all__ = ["make_base_train_step", "TrainState", "init_train_state"]


def init_train_state(params, optimizer: optax.GradientTransformation):
    """(params, ema_params, opt_state) — EMA starts at a COPY of the params
    (train_util.py ema initialization; a copy, not an alias, because the
    jitted step donates both buffers)."""
    ema = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
    return params, ema, optimizer.init(params)


TrainState = Tuple[Any, Any, Any]  # params, ema, opt_state


def make_base_train_step(
    apply_fn: Callable,               # apply_fn(params, x_nhwc, t) -> model out
    tab: G.GaussianTables,
    optimizer: optax.GradientTransformation,
    *,
    mean_type: str = "eps",
    var_type: str = "fixedsmall",
    loss_type: str = "mse",
    p2_gamma: float = 0.0,
    p2_k: float = 1.0,
    ema_rate: float = 0.9999,
    compute_dtype=jnp.float32,
):
    """Returns jitted fn(params, ema, opt_state, x0, t, noise, loss_weights)
    -> (params, ema, opt_state, metrics).

    `t` is an int32 [B] batch (per-sample random timesteps — the upstream
    convention, unlike the Asyrp scan's per-step scalars); `loss_weights`
    is the schedule sampler's 1/(N·p) reweighting (resample.py:42-58).
    `metrics['loss_per_sample']` feeds LossSecondMomentResampler updates.
    """

    def train_step(params, ema, opt_state, x0, t, noise, loss_weights):
        def loss_fn(p):
            terms = G.training_losses(
                tab,
                lambda x, tt: apply_fn(p, x.astype(compute_dtype), tt).astype(
                    jnp.float32
                ),
                x0, t, noise,
                mean_type=mean_type, var_type=var_type, loss_type=loss_type,
                p2_gamma=p2_gamma, p2_k=p2_k,
            )
            per_sample = terms["loss"]
            return (per_sample * loss_weights).mean(), terms

        (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema = update_ema(ema, params, rate=ema_rate)
        metrics = {
            "loss": loss,
            "loss_per_sample": terms["loss"],
            "mse": terms.get("mse", terms["loss"]).mean(),
        }
        if "vb" in terms:
            metrics["vb"] = terms["vb"].mean()
        return params, ema, opt_state, metrics

    jit_step = jax.jit(train_step, donate_argnums=(0, 1, 2))

    def _strengthen(x):
        # Host-built opt_state can carry weak-typed scalar leaves (e.g.
        # optax.inject_hyperparams with a python float); jit outputs are
        # strong, so feeding the state back would change the signature and
        # recompile the full program once more (same trap as
        # pipelines/train.py — only scalar leaves are ever converted).
        a = jnp.asarray(x)
        return a.astype(a.dtype) if a.aval.weak_type else a

    def run(params, ema, opt_state, x0, t, noise, loss_weights):
        params, ema, opt_state = jax.tree.map(
            _strengthen, (params, ema, opt_state)
        )
        return jit_step(params, ema, opt_state, x0, t, noise, loss_weights)

    run.cache_size = jit_step._cache_size  # regression hook: must stay 1
    return run
