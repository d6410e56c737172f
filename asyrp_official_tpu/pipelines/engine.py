"""Jitted trajectory engines: inversion, generation, asymmetric editing.

Each maker returns a `jax.jit`-compiled function taking (params, [edit,]
batch, [rng]) so one compilation serves the whole run; the step schedule is
baked in as scan constants (core/steptable.py). Mixed precision: the UNet
can run in bfloat16 (`compute_dtype`) while the DDIM update and the scan
carry stay float32 — on TPU this puts the conv/matmul FLOPs on the MXU's
native dtype without degrading trajectory math.

Reference call paths covered:
  * `precompute_pairs` inversion + recon loops (diffusion_latent.py:1029-1070)
  * `save_image` plain and edited generation (diffusion_latent.py:445-544)
  * random-noise generation (diffusion_latent.py:1139-1155)
"""
from __future__ import annotations

import functools
import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from asyrp_official_tpu.core.sampler import sample_chain
from asyrp_official_tpu.core.schedule import Schedule
from asyrp_official_tpu.core.steptable import StepTable, generation_table, inversion_table
from asyrp_official_tpu.models.delta import EditState
from asyrp_official_tpu.models.registry import ModelSpec

__all__ = ["make_invert", "make_generate", "make_edit_generate", "make_invert_with_h"]


def _plain_eps(spec: ModelSpec, params, compute_dtype):
    def eps_fn(x, t, aux):
        xm = x.astype(compute_dtype)
        eps, *_ = spec.apply(params, xm, t)
        return eps.astype(jnp.float32), None

    return eps_fn


def _edited_eps(
    spec: ModelSpec, params, edit: EditState, compute_dtype,
    skip_below_edit: bool = False,
    decode_mode: str = "auto",
):
    """skip_below_edit: below t_edit the edit is gated off (h2 = h), so the
    stacked dual decode produces eps_mod ≡ eps bit-for-bit — the reference
    still pays for the second decoder there (models/ddpm/diffusion.py:540-578).
    With this flag a lax.cond runs the SINGLE decode on those steps instead:
    exact same outputs, ~35% less work per below-t_edit step. Disabled when
    Δh harvesting needs the per-step delta output.

    NOTE: the cond path is only used when the t_edit gate is NOT a
    contiguous prefix of the step table; the common case is served
    branch-free by `_edited_chain`'s two-scan split (measured ~1.7 ms/step
    of cond overhead on the v5e relay chip, BASELINE.md)."""

    def eps_fn(x, t, aux):
        xm = x.astype(compute_dtype)

        def dual(xm):
            eps, eps_mod, delta_h, _ = spec.apply(
                params, xm, t, edit=edit.at_step(aux),
                decode_mode=decode_mode,
            )
            return eps, eps_mod, delta_h

        if not skip_below_edit:
            eps, eps_mod, delta_h = dual(xm)
        else:
            def single(xm):
                eps, _, _, _ = spec.apply(params, xm, t)
                return eps, eps, None

            # both branches must return matching pytrees → only valid for
            # modes whose delta output isn't collected (delta_h dropped)
            eps, eps_mod, _ = jax.lax.cond(
                aux["use_delta"] > 0,
                lambda xm: dual(xm)[:2] + (None,),
                lambda xm: single(xm),
                xm,
            )
            delta_h = None

        extras = {}
        if delta_h is not None:
            # masked below t_edit so mean-of-Δh harvesting only accumulates
            # active steps (diffusion_latent.py:528-532)
            extras["delta_h"] = (
                delta_h.astype(jnp.float32) * aux["use_delta"]
            )
        return (
            eps.astype(jnp.float32),
            eps_mod.astype(jnp.float32) if eps_mod is not None else None,
            extras,
        )

    return eps_fn


def _edited_chain(
    spec: ModelSpec,
    schedule: Schedule,
    table: StepTable,
    *,
    compute_dtype,
    sample_type: str = "ddim",
    dt_lambda: float = 1.0,
    dt_end: int = 999,
    collect: Tuple[str, ...] = (),
    unroll: int = 1,
):
    """Build the edited-generation runner over `table`, choosing the fastest
    exact strategy:

      * t_edit gate is a contiguous prefix (the standard descending-t case):
        TWO branch-free scans — dual-decode steps, then plain steps. Below
        t_edit the gated-off edit yields eps_mod ≡ eps bit-for-bit, so the
        plain eps function is exact there; rng fold_in indices are offset so
        the noise sequence matches the monolithic scan.
      * Δh harvesting requested (collect 'delta_h') or non-contiguous gate
        (sparse delta_times): single scan, dual decode everywhere / lax.cond.

    Returns fn(params, edit, x, rng) -> (x_out, collected) — call under jit.
    """
    skip = "delta_h" not in collect
    k = table.edit_prefix_len() if skip else None
    # serving-side analogue of train.py's ASYRP_TPU_TRAIN_DECODE: "split"
    # runs the dual decode as two B-sized decoder passes instead of one
    # 2B-stacked one (identical math, models/{ddpmpp,openai_unet}.apply).
    # Forward-only A/B knob — conv batch efficiency is non-monotonic on
    # the v5e (BASELINE.md), so the best shape depends on serving batch.
    decode_mode = os.environ.get("ASYRP_TPU_SERVE_DECODE", "auto")
    common = dict(
        sample_type=sample_type, learn_sigma=spec.learn_sigma,
        dt_lambda=dt_lambda, dt_end=dt_end, collect=collect, unroll=unroll,
    )

    if k == table.num_steps:
        k = None  # every step is dual — monolithic without the cond
        skip = False
    # k == 0 keeps the split path: it degenerates to plain-only

    if k is None:
        def run(params, edit, x, rng):
            return sample_chain(
                _edited_eps(spec, params, edit, compute_dtype,
                            skip_below_edit=skip, decode_mode=decode_mode),
                schedule, table, x, rng=rng, **common,
            )
        return run

    head, tail = table.slice(0, k), table.slice(k, table.num_steps)

    def run(params, edit, x, rng):
        ys_parts = []
        if head.num_steps:
            x, ys1 = sample_chain(
                _edited_eps(spec, params, edit, compute_dtype,
                            decode_mode=decode_mode),
                schedule, head, x, rng=rng, **common,
            )
            ys_parts.append(ys1)
        if tail.num_steps:
            x, ys2 = sample_chain(
                _plain_eps(spec, params, compute_dtype),
                schedule, tail, x, rng=rng, step_offset=k, **common,
            )
            ys_parts.append(ys2)
        if len(ys_parts) == 2:
            ys = {
                key: jnp.concatenate([ys_parts[0][key], ys_parts[1][key]])
                for key in ys_parts[0]
            }
        else:
            ys = ys_parts[0] if ys_parts else {}
        return x, ys

    return run


def make_invert(
    spec: ModelSpec,
    schedule: Schedule,
    seq,
    *,
    compute_dtype=jnp.float32,
    collect: Tuple[str, ...] = (),
) -> Callable:
    """DDIM inversion x0 → xT over `seq` (ascending), jitted once.

    Returns fn(params, x0) -> (x_lat, collected)."""
    table = inversion_table(seq)

    @jax.jit
    def run(params, x0):
        return sample_chain(
            _plain_eps(spec, params, compute_dtype),
            schedule,
            table,
            x0,
            learn_sigma=spec.learn_sigma,
            collect=collect,
        )

    return run


def make_generate(
    spec: ModelSpec,
    schedule: Schedule,
    seq,
    *,
    t_addnoise: int = -1,
    sample_type: str = "ddim",
    compute_dtype=jnp.float32,
    collect: Tuple[str, ...] = (),
) -> Callable:
    """Plain (un-edited) generation xT → x0 (`save_x_origin` row,
    diffusion_latent.py:468-491). Returns fn(params, x_lat, rng)."""
    table = generation_table(seq, t_addnoise=t_addnoise)

    @jax.jit
    def run(params, x_lat, rng):
        return sample_chain(
            _plain_eps(spec, params, compute_dtype),
            schedule,
            table,
            x_lat,
            rng=rng,
            sample_type=sample_type,
            learn_sigma=spec.learn_sigma,
            collect=collect,
        )

    return run


def make_edit_generate(
    spec: ModelSpec,
    schedule: Schedule,
    seq,
    *,
    t_edit: int,
    t_addnoise: int = -1,
    delta_times=None,
    ignore_timesteps: bool = False,
    sample_type: str = "ddim",
    dt_lambda: float = 1.0,
    dt_end: int = 999,
    compute_dtype=jnp.float32,
    collect: Tuple[str, ...] = (),
) -> Callable:
    """Asymmetric edited generation (diffusion_latent.py:499-534): Δ
    injection for t >= t_edit, eta=1 quality boost for t < t_addnoise.

    Returns fn(params, edit: EditState, x_lat, rng) -> (x, collected).
    The EditState is a traced argument — coefficient sweeps
    (delta-interpolation, diffusion_latent.py:726-755) and multi-attribute
    mixing re-use ONE compilation by swapping hs_coeff / blocks."""
    table = generation_table(
        seq,
        t_edit=t_edit,
        t_addnoise=t_addnoise,
        delta_times=delta_times,
        ignore_timesteps=ignore_timesteps,
    )
    # exact optimization: below t_edit the edit is gated off, so those steps
    # run the plain single decode (branch-free two-scan split; _edited_chain)
    chain = _edited_chain(
        spec, schedule, table, compute_dtype=compute_dtype,
        sample_type=sample_type, dt_lambda=dt_lambda, dt_end=dt_end,
        collect=collect,
    )
    return jax.jit(chain)


def make_invert_edit(
    spec: ModelSpec,
    schedule: Schedule,
    seq_inv,
    seq_gen,
    *,
    t_edit: int,
    t_addnoise: int = -1,
    delta_times=None,
    ignore_timesteps: bool = False,
    compute_dtype=jnp.float32,
    unroll: int = 1,
) -> Callable:
    """Serving fast path: DDIM inversion + asymmetric edited generation in
    ONE jitted call (one dispatch, one compiled program). Returns
    fn(params, edit, x0, rng) -> x_edited."""
    inv_table = inversion_table(seq_inv)
    gen_table = generation_table(
        seq_gen, t_edit=t_edit, t_addnoise=t_addnoise,
        delta_times=delta_times, ignore_timesteps=ignore_timesteps,
    )
    gen_chain = _edited_chain(
        spec, schedule, gen_table, compute_dtype=compute_dtype, unroll=unroll,
    )

    @jax.jit
    def run(params, edit, x0, rng):
        x_lat, _ = sample_chain(
            _plain_eps(spec, params, compute_dtype), schedule, inv_table, x0,
            learn_sigma=spec.learn_sigma, unroll=unroll,
        )
        x_edit, _ = gen_chain(params, edit, x_lat, rng)
        return x_edit

    return run


def make_image_noise_generate(
    spec: ModelSpec,
    schedule: Schedule,
    seq,
    *,
    t_edit: int,
    t_addnoise: int = -1,
    coeff: float = 1.0,
    compute_dtype=jnp.float32,
) -> Callable:
    """Image-space noise optimization mode (`--image_space_noise_optim`):
    eps_mod = eps + noise_param·coeff for t >= t_edit — the reference's
    image-space hook in denoising_step (utils/diffusion_utils.py:55-63,
    Parameter branch). Returns fn(params, noise_param, x_lat, rng); grads
    flow to `noise_param` ([H, W, C])."""
    table = generation_table(seq, t_edit=t_edit, t_addnoise=t_addnoise)

    @jax.jit
    def run(params, noise_param, x_lat, rng):
        def eps_fn(x, t, aux):
            eps_raw, *_ = spec.apply(params, x.astype(compute_dtype), t)
            if spec.learn_sigma:
                eps_raw = eps_raw[..., : eps_raw.shape[-1] // 2]
            eps = eps_raw.astype(jnp.float32)
            eps_mod = eps + noise_param[None].astype(jnp.float32) * coeff
            eps_mod = (
                aux["use_delta"] * eps_mod + (1.0 - aux["use_delta"]) * eps
            )
            return eps, eps_mod

        return sample_chain(
            eps_fn, schedule, table, x_lat, rng=rng, learn_sigma=False,
        )

    return run


def make_invert_with_h(
    spec: ModelSpec,
    schedule: Schedule,
    seq,
    *,
    compute_dtype=jnp.float32,
) -> Callable:
    """Inversion that also returns the per-step bottleneck h trajectory
    (`precompute_pairs_with_h`, diffusion_latent.py:877-947) — used by
    DiffStyle. Returns fn(params, x0) -> (x_lat, h_traj [S, B, h, w, C])."""
    table = inversion_table(seq)

    from asyrp_official_tpu.core.sampler import ScanArrays
    from asyrp_official_tpu.core.ddim import ddim_step

    @jax.jit
    def run(params, x0):
        # local scan variant that collects middle_h as a scan output

        arrays = ScanArrays.from_table(table)
        acp_ext = jnp.asarray(schedule.alphas_cumprod_ext)
        bsz = x0.shape[0]

        def body(x, per_step):
            t_i, t_next_i, _, _, _, _ = per_step
            t_b = jnp.full((bsz,), t_i, jnp.float32)
            xm = x.astype(compute_dtype)
            eps_raw, _, _, middle_h = spec.apply(params, xm, t_b)
            if spec.learn_sigma:
                c = eps_raw.shape[-1] // 2
                eps_raw = eps_raw[..., :c]
            eps = eps_raw.astype(jnp.float32)
            at = acp_ext[t_i + 1]
            at_next = acp_ext[t_next_i + 1]
            x_next, _ = ddim_step(
                x, eps, eps,
                jnp.full((bsz,), at), jnp.full((bsz,), at_next),
                0.0, jnp.zeros_like(x),
            )
            return x_next, middle_h.astype(jnp.float32)

        x_lat, h_traj = jax.lax.scan(body, x0, arrays)
        return x_lat, h_traj

    return run
