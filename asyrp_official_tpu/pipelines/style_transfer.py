"""DiffStyle-style h-space style transfer.

The reference parses `--diff_style` but ships only the lower-level hooks:
slerp/mask injection of an input Δh in every UNet forward
(models/ddpm/diffusion.py:519-539), the `dt_lambda` / `dt_end` calibration
in the step (utils/diffusion_utils.py:99-100), and per-timestep h capture
(`precompute_pairs_with_h`, diffusion_latent.py:877-947). This pipeline
composes those hooks end-to-end:

  1. invert the CONTENT image, keeping its latent xT;
  2. invert the STYLE image, recording its bottleneck h at every timestep;
  3. generate from the content latent, injecting the style's h trajectory
     via norm-matched slerp (optionally masked) for t >= t_edit, with the
     content's own h taking over below `content_replace_step`.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from asyrp_official_tpu.core.schedule import Schedule, uniform_seq
from asyrp_official_tpu.models.delta import EditState
from asyrp_official_tpu.models.registry import ModelSpec
from asyrp_official_tpu.pipelines import engine

__all__ = ["style_transfer"]


def style_transfer(
    spec: ModelSpec,
    params,
    schedule: Schedule,
    content: jnp.ndarray,
    style: jnp.ndarray,
    *,
    n_inv_step: int = 40,
    n_gen_step: int = 40,
    t_0: int = 999,
    t_edit: int = 400,
    hs_coeff: float = 0.9,
    use_mask: bool = False,
    dt_lambda: float = 1.0,
    dt_end: int = 999,
    content_replace_step: int = 0,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (stylized, content_latent). content: [B, H, W, C] in [-1, 1];
    style: [1, H, W, C] — the injected Δh rows are per-STEP, shared across
    the content batch, so exactly one style drives a call (loop for style
    batches). `hs_coeff` is the reference's hs_coeff[0] — slerp position is
    1 - hs_coeff (models/ddpm/diffusion.py:527,539)."""
    if style.shape[0] != 1:
        raise ValueError(
            f"style batch must be 1 (got {style.shape[0]}): h rows are "
            "shared per step — call once per style image"
        )
    seq_inv = uniform_seq(n_inv_step, t_0)
    seq_gen = uniform_seq(n_gen_step, t_0)

    invert = engine.make_invert(spec, schedule, seq_inv, compute_dtype=compute_dtype)
    invert_h = engine.make_invert_with_h(
        spec, schedule, seq_inv, compute_dtype=compute_dtype
    )

    x_lat_content, _ = invert(params, content)
    _, h_traj = invert_h(params, style)  # [S-1, 1, h, w, C]

    # map each generation timestep to the closest recorded style h (records
    # are keyed by the inversion pair's source t, seq_inv[:-1])
    rec_ts = np.array(seq_inv[:-1])
    rows, times = [], []
    for t in seq_gen:
        if t < max(t_edit, content_replace_step):
            continue
        idx = int(np.argmin(np.abs(rec_ts - t)))
        rows.append(np.asarray(h_traj[idx, 0]))
        times.append(t)
    if not rows:
        raise ValueError("no generation steps at/above t_edit — nothing to inject")

    edit = EditState(
        mode="input",
        delta_rows=jnp.asarray(np.stack(rows)),
        hs_coeff=jnp.asarray([hs_coeff, 1.0], jnp.float32),
        input_style="slerp",
        use_mask=use_mask,
    )
    run = engine.make_edit_generate(
        spec, schedule, seq_gen,
        t_edit=max(t_edit, content_replace_step),
        delta_times=times,
        dt_lambda=dt_lambda, dt_end=dt_end,
        compute_dtype=compute_dtype,
    )
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    stylized, _ = run(params, edit, x_lat_content, rng)
    return stylized, x_lat_content
