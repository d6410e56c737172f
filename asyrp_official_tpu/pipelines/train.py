"""Δ training step — the reference `run_training` inner loop
(diffusion_latent.py:301-354) compiled into ONE `lax.scan`.

Faithful semantics:
  * two model calls per timestep — the Asyrp edited step (grad path) and a
    no-grad plain DDIM reference step (:308-329);
  * the optimizer STEPS AT EVERY TIMESTEP (:353-354) — optimizer state and
    Δ params ride the scan carry;
  * the carry x is detached between steps (`xt_next.detach()`, :308) via
    stop_gradient, so each step's grads flow only through its own x0_t;
  * loss = l1_w·L1(x0_t, x0_t_origin)·cosine + clip_w·clip_term (+ id_w·id)
    (:340-351) — the CLIP/ID terms plug in through `loss_fn`.

TPU-first: the whole per-image training trajectory (40 steps × [dual-decode
fwd + bwd + plain fwd]) is one XLA program; donation keeps the frozen UNet
params resident.
"""
from __future__ import annotations

import os
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from asyrp_official_tpu.core.ddim import ddim_step
from asyrp_official_tpu.core.sampler import ScanArrays
from asyrp_official_tpu.core.schedule import Schedule
from asyrp_official_tpu.core.steptable import StepTable, generation_table
from asyrp_official_tpu.models.delta import EditState
from asyrp_official_tpu.models.registry import ModelSpec

__all__ = ["default_loss", "make_train_step", "make_optimizer"]


def default_loss(x0_t, x0_t_origin, x0, *, l1_w=3.0, cosine=1.0, extra=None):
    """L1 reconstruction term (diffusion_latent.py:340,350); `extra` is the
    pluggable CLIP/ID callable: extra(x0, x0_t, x0_t_origin) -> scalar,
    already weighted (the ID term needs the un-edited denoising
    x0_t_origin, diffusion_latent.py:346-347)."""
    loss = l1_w * jnp.abs(x0_t - x0_t_origin).mean() * cosine
    if extra is not None:
        loss = loss + extra(x0, x0_t, x0_t_origin)
    return loss


def make_optimizer(lr: float, scheduler_step_size: int = 1, sch_gamma: float = 1.0):
    """SGD(weight_decay=0) with an injectable learning rate
    (diffusion_latent.py:201). The StepLR schedule (:202, stepped per outer
    iteration :406) is computed by `steplr_lr(base, it_out, step_size,
    gamma)` and passed into each train_step call — the two extra parameters
    here are accepted for signature parity but the schedule itself lives in
    the caller's loop."""
    return optax.inject_hyperparams(optax.sgd)(learning_rate=lr)


def steplr_lr(base_lr: float, it_out: int, step_size: int, gamma: float) -> float:
    return base_lr * (gamma ** (it_out // step_size))


def make_train_step(
    spec: ModelSpec,
    schedule: Schedule,
    seq_train,
    *,
    t_edit: int,
    optimizer: optax.GradientTransformation,
    loss_fn: Callable = default_loss,
    compute_dtype=jnp.float32,
    ignore_timesteps: bool = False,
    train_target: str = "blocks",  # 'blocks' (--train_delta_block) | 'rows' (--train_delta_h)
    cached_origin: bool = False,
):
    """Returns jitted fn(params, edit, opt_state, x_lat, x0, it_out_lr)
    -> (edit, opt_state, metrics).

    `edit` carries the trainable leaves (blocks or delta_rows); everything
    else (frozen UNet `params`) gets no gradient — the compiled analog of
    the reference's requires_grad freezing (diffusion_latent.py:284-290).

    `cached_origin=True` splits the no-grad plain-DDIM reference trajectory
    (diffusion_latent.py:322-329) out of the step: the returned fn takes an
    extra trailing `origins` argument (the [n_steps, B, H, W, C] x0_t_origin
    stack from `fn.compute_origins(params, x_lat)`) and skips the plain UNet
    forward per timestep. The origin trajectory depends only on the FROZEN
    params and x_lat, so it is constant across outer iterations — the
    reference recomputes it every iteration; computing it once per batch and
    reusing it across `--n_iter` saves one plain forward per edit timestep
    (~13% of the step) in every iteration after the first, with identical
    training math.
    """
    table = generation_table(
        seq_train,
        t_edit=t_edit,
        delta_times=list(seq_train) if train_target == "rows" else None,
        ignore_timesteps=ignore_timesteps,
    )
    arrays = ScanArrays.from_table(table)
    acp_ext = jnp.asarray(schedule.alphas_cumprod_ext)
    # A/B knob for on-chip measurement only: "auto" re-selects the
    # 2B-stacked dual decode at bs > 1 (the serving fusion) inside the
    # grad path. Default "split" — see the step_loss comment below.
    decode_mode = os.environ.get("ASYRP_TPU_TRAIN_DECODE", "split")

    def split_edit(edit: EditState):
        """Partition EditState into (trainable leaves, static rest)."""
        if train_target == "blocks":
            return edit.blocks, lambda b: EditState(
                **{**edit.__dict__, "blocks": b}
            )
        return edit.delta_rows, lambda r: EditState(
            **{**edit.__dict__, "delta_rows": r}
        )

    def plain_origin_step(params, x_orig, per_step):
        """One reference plain-DDIM step, no grad (diffusion_latent.py:322-329)."""
        bsz = x_orig.shape[0]
        t_i, t_next_i, *_ = per_step
        t_b = jnp.full((bsz,), t_i, jnp.float32)
        at = jnp.full((bsz,), acp_ext[t_i + 1])
        at_next = jnp.full((bsz,), acp_ext[t_next_i + 1])
        eps_o_raw, *_ = spec.apply(params, x_orig.astype(compute_dtype), t_b)
        if spec.learn_sigma:
            eps_o_raw = eps_o_raw[..., : eps_o_raw.shape[-1] // 2]
        eps_o = eps_o_raw.astype(jnp.float32)
        return ddim_step(
            x_orig, eps_o, eps_o, at, at_next, 0.0, jnp.zeros_like(x_orig)
        )

    def origin_trajectory(params, x_lat):
        """The full x0_t_origin stack [n_steps, B, H, W, C] — constant in
        the trainable Δ, so reusable across outer iterations."""

        def body(x_orig, per_step):
            x_orig_next, x0_t_origin = plain_origin_step(params, x_orig, per_step)
            return x_orig_next, x0_t_origin

        _, origins = jax.lax.scan(body, x_lat, arrays)
        return origins

    def train_step(params, edit: EditState, opt_state, x_lat, x0, lr,
                   origins=None):
        bsz = x_lat.shape[0]
        trainable, rebuild = split_edit(edit)

        def body(carry, xs):
            x_edit, x_orig, trainable, opt_state = carry
            if cached_origin:
                per_step, x0_t_origin = xs
                x_orig_next = x_orig  # unused carry leg in cached mode
            else:
                per_step = xs
                x_orig_next, x0_t_origin = plain_origin_step(
                    params, x_orig, per_step
                )
            t_i, t_next_i, _, use_delta_i, delta_idx_i, step_i = per_step
            t_b = jnp.full((bsz,), t_i, jnp.float32)
            at = jnp.full((bsz,), acp_ext[t_i + 1])
            at_next = jnp.full((bsz,), acp_ext[t_next_i + 1])
            zero = jnp.zeros_like(x_edit)

            def step_loss(tr):
                e = rebuild(tr).at_step(
                    {"use_delta": use_delta_i, "delta_idx": delta_idx_i, "step": step_i}
                )
                # decode_mode="split": the plain decode (eps — feeds only
                # x_next, never the loss) has no dependence on the trainable
                # Δ when decoded separately, so XLA drops its backward and
                # remat recompute entirely; the 2B-stacked decode would run
                # both at 2B because AD can't see the zero cotangent of the
                # plain rows inside the stack. Same-session chip A/B:
                # split 1.50x at bs2, 1.40x at bs8; stacked wins 1.09x only
                # at bs4, where its 2B=8 conv batch lands on the v5e conv
                # sweet spot (BASELINE.md round 4; ASYRP_TPU_TRAIN_DECODE)
                eps_raw, eps_mod_raw, _, _ = spec.apply(
                    params, x_edit.astype(compute_dtype), t_b, edit=e,
                    decode_mode=decode_mode,
                )
                if spec.learn_sigma:
                    c = eps_raw.shape[-1] // 2
                    eps_raw = eps_raw[..., :c]
                    eps_mod_raw = eps_mod_raw[..., :c]
                eps = eps_raw.astype(jnp.float32)
                eps_mod = eps_mod_raw.astype(jnp.float32)
                x_next, x0_t = ddim_step(x_edit, eps, eps_mod, at, at_next, 0.0, zero)
                loss = loss_fn(x0_t, x0_t_origin, x0)
                return loss, x_next

            (loss, x_next), grads = jax.value_and_grad(step_loss, has_aux=True)(
                trainable
            )
            opt_state.hyperparams["learning_rate"] = lr
            updates, opt_state = optimizer.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)

            carry = (
                jax.lax.stop_gradient(x_next),
                x_orig_next,
                trainable,
                opt_state,
            )
            return carry, loss

        xs = (arrays, origins) if cached_origin else arrays
        (x_fin, _, trainable, opt_state), losses = jax.lax.scan(
            body, (x_lat, x_lat, trainable, opt_state), xs
        )
        edit = rebuild(trainable)
        return edit, opt_state, {"loss_per_step": losses, "loss": losses.mean()}

    jit_step = jax.jit(train_step)

    def _strengthen(x):
        # Host-built state carries weak-typed scalar leaves (python
        # 1.0/0 via optax init / EditState defaults); the jit outputs are
        # strongly typed, so feeding step outputs back would CHANGE the
        # call signature and silently recompile the full-size program a
        # second time (measured 76 s at 113.7M params). Dropping weak_type
        # up front makes call 1 and call N share one signature; only
        # scalar leaves are touched, so there is no per-call device work
        # on the big buffers.
        a = jnp.asarray(x)
        return a.astype(a.dtype) if a.aval.weak_type else a

    if cached_origin:
        def run(params, edit, opt_state, x_lat, x0, lr, origins):
            edit, opt_state = jax.tree.map(_strengthen, (edit, opt_state))
            return jit_step(
                params, edit, opt_state, x_lat, x0, jnp.float32(lr), origins
            )

        run.compute_origins = jax.jit(origin_trajectory)
    else:
        def run(params, edit, opt_state, x_lat, x0, lr):
            edit, opt_state = jax.tree.map(_strengthen, (edit, opt_state))
            return jit_step(params, edit, opt_state, x_lat, x0, jnp.float32(lr))

    run.cache_size = jit_step._cache_size  # regression hook: must stay 1
    return run
