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

`make_style_transfer` builds the three jitted engines ONCE for a whole
content × style sweep (inversions are per-image, reusable across pairs);
`style_transfer` is the one-shot convenience wrapper over it.
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

__all__ = ["make_style_transfer", "style_transfer"]


class StyleTransfer:
    """Compiled-once style-transfer session: `invert_content` /
    `invert_style` results can be cached and recombined freely —
    a C×S sweep costs C+S inversions and C·S generations, with ONE
    compilation of each engine."""

    def __init__(
        self,
        spec: ModelSpec,
        schedule: Schedule,
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
        compute_dtype=jnp.float32,
    ):
        seq_inv = uniform_seq(n_inv_step, t_0)
        seq_gen = uniform_seq(n_gen_step, t_0)
        self._invert = engine.make_invert(
            spec, schedule, seq_inv, compute_dtype=compute_dtype
        )
        self._invert_h = engine.make_invert_with_h(
            spec, schedule, seq_inv, compute_dtype=compute_dtype
        )

        # map each generation timestep to the closest recorded style h
        # (records are keyed by the inversion pair's source t, seq_inv[:-1])
        gate = max(t_edit, content_replace_step)
        rec_ts = np.array(seq_inv[:-1])
        self._row_idx, times = [], []
        for t in seq_gen:
            if t < gate:
                continue
            self._row_idx.append(int(np.argmin(np.abs(rec_ts - t))))
            times.append(t)
        if not times:
            raise ValueError(
                "no generation steps at/above t_edit — nothing to inject"
            )
        self._hs_coeff = jnp.asarray([hs_coeff, 1.0], jnp.float32)
        self._use_mask = use_mask
        self._run = engine.make_edit_generate(
            spec, schedule, seq_gen, t_edit=gate, delta_times=times,
            dt_lambda=dt_lambda, dt_end=dt_end, compute_dtype=compute_dtype,
        )

    def invert_content(self, params, content) -> jnp.ndarray:
        """content: [B, H, W, C] in [-1, 1] → latent xT [B, H, W, C]."""
        x_lat, _ = self._invert(params, content)
        return x_lat

    def invert_style(self, params, style) -> jnp.ndarray:
        """style: [B, H, W, C] — returns the per-step h trajectory
        [S-1, B, h, w, C]; only row 0 of the batch drives injection (the
        Δh rows are per-STEP, shared across the content batch)."""
        _, h_traj = self._invert_h(params, style)
        return h_traj

    def generate(
        self, params, x_lat_content, h_traj, rng: Optional[jax.Array] = None
    ) -> jnp.ndarray:
        edit = EditState(
            mode="input",
            delta_rows=h_traj[jnp.asarray(self._row_idx), 0],
            hs_coeff=self._hs_coeff,
            input_style="slerp",
            use_mask=self._use_mask,
        )
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        stylized, _ = self._run(params, edit, x_lat_content, rng)
        return stylized


def make_style_transfer(spec, schedule, **kw) -> StyleTransfer:
    return StyleTransfer(spec, schedule, **kw)


def style_transfer(
    spec: ModelSpec,
    params,
    schedule: Schedule,
    content: jnp.ndarray,
    style: jnp.ndarray,
    *,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    **kw,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One-shot wrapper. Returns (stylized, content_latent). content:
    [B, H, W, C] in [-1, 1]; style: [1, H, W, C] — exactly one style
    drives a call (`hs_coeff` is the reference's hs_coeff[0]; slerp
    position is 1 - hs_coeff, models/ddpm/diffusion.py:527,539)."""
    if style.shape[0] != 1:
        raise ValueError(
            f"style batch must be 1 (got {style.shape[0]}): h rows are "
            "shared per step — call once per style image"
        )
    st = StyleTransfer(spec, schedule, compute_dtype=compute_dtype, **kw)
    x_lat = st.invert_content(params, content)
    h_traj = st.invert_style(params, style)
    return st.generate(params, x_lat, h_traj, rng), x_lat
