"""Delta modules — the only trainable state in Asyrp.

Covers every edit-injection mode of the reference:

  * DeltaBlock (the paper's implicit function f_t), DDPM++ flavor
    (models/ddpm/diffusion.py:228-263) and OpenAI flavor
    (models/improved_ddpm/unet.py:776-853, models/guided_diffusion/unet.py:779-856);
  * DeltaBlock_global — CLIP-direction-conditioned variant
    (models/ddpm/diffusion.py:266-323);
  * directly-optimized per-timestep Δh tensors (`--train_delta_h`),
    stored stacked as one [K, 8, 8, C] parameter instead of the reference's
    dict of per-t Parameters (diffusion_latent.py:185-198);
  * DiffStyle injection of an input Δh: norm-matched slerp, optionally
    restricted to a spatial mask (models/ddpm/diffusion.py:519-539).

`EditState` is a registered pytree so it can be closed over / carried by
`jax.lax.scan` and differentiated (grads flow to `blocks` / `delta_rows`).
The `use_delta` gate replaces the reference's `t[0] >= t_edit` branch
(models/ddpm/diffusion.py:510): when 0, h2 = h and the edited decoder output
equals the original — matching the reference, which also still runs the
second decoder below t_edit (:540-542).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from asyrp_official_tpu.models import common as cm

__all__ = [
    "EditState",
    "apply_edit",
    "delta_block_init",
    "delta_block_apply",
    "delta_block_global_init",
    "delta_block_global_apply",
    "slerp",
]


# ---------------------------------------------------------------------------
# DeltaBlock — DDPM++ flavor
# ---------------------------------------------------------------------------


def delta_block_init(key, ch: int, temb_ch: int, *, flavor: str = "ddpm"):
    ks = cm.rsplit(key, 4)
    if flavor == "ddpm":
        return {
            "conv1": cm.linear_init(ks[0], ch, ch),
            "temb_proj": cm.linear_init(ks[1], temb_ch, ch),
            "norm2": cm.norm_init(ch),
            "conv2": cm.linear_init(ks[2], ch, ch),
        }
    elif flavor == "openai":
        return {
            "in_norm": cm.norm_init(ch),
            "in_conv": cm.linear_init(ks[0], ch, ch),
            "emb": cm.linear_init(ks[1], temb_ch, ch),
            "out_norm": cm.norm_init(ch),
            "out_conv": cm.linear_init(ks[2], ch, ch),
        }
    raise ValueError(f"unknown DeltaBlock flavor: {flavor}")


_mat = cm.mat1x1


def delta_block_apply(p, x, temb, *, flavor: str = "ddpm"):
    """temb may be None (`--ignore_timesteps`, diffusion_latent.py:188,318)."""
    if flavor == "ddpm":
        # conv1 → (+ temb) → GN(1e-6) → swish → conv2  (diffusion.py:251-263)
        h = _mat(p["conv1"], x)
        if temb is not None:
            h = h + cm.linear(p["temb_proj"], cm.swish(temb))[:, None, None, :]
        h = cm.group_norm(p["norm2"], h, eps=1e-6)
        h = cm.swish(h)
        return _mat(p["conv2"], h)
    elif flavor == "openai":
        # GN32 → SiLU → conv1x1 → (+emb) → GN32 → SiLU → conv1x1
        # (improved_ddpm/unet.py:837-853, non-scale-shift path)
        h = cm.group_norm(p["in_norm"], x, eps=1e-5)
        h = cm.swish(h)
        h = _mat(p["in_conv"], h)
        if temb is not None:
            h = h + cm.linear(p["emb"], cm.swish(temb))[:, None, None, :]
        h = cm.group_norm(p["out_norm"], h, eps=1e-5)
        h = cm.swish(h)
        return _mat(p["out_conv"], h)
    raise ValueError(f"unknown DeltaBlock flavor: {flavor}")


# ---------------------------------------------------------------------------
# DeltaBlock_global — CLIP-conditioned (models/ddpm/diffusion.py:266-323)
# ---------------------------------------------------------------------------


def delta_block_global_init(key, ch: int, temb_ch: int, clip_ch: int = 512, hw: int = 8):
    ks = cm.rsplit(key, 8)
    return {
        "conv1": cm.conv_init(ks[0], 3, 3, ch, ch),
        "temb_proj": cm.linear_init(ks[1], temb_ch, ch),
        "clip_proj": cm.linear_init(ks[2], clip_ch, ch),
        "clip_proj_2": cm.linear_init(ks[3], clip_ch, ch * hw * hw),
        "norm2": cm.norm_init(ch),
        "conv2": cm.linear_init(ks[4], ch, ch),
        "norm3": cm.norm_init(ch),
        "conv3": cm.linear_init(ks[5], ch, ch),
        "norm4": cm.norm_init(ch),
        "conv4": cm.linear_init(ks[6], ch, ch),
    }


def delta_block_global_apply(p, x, temb, clip_direction):
    b, hh, ww, c = x.shape
    clip_direction = jnp.asarray(clip_direction).astype(x.dtype)
    h = cm.conv2d(p["conv1"], x)
    h = (
        h
        + cm.linear(p["temb_proj"], cm.swish(temb))[:, None, None, :]
        + cm.linear(p["clip_proj"], clip_direction)[:, None, None, :]
    )
    h = cm.group_norm(p["norm2"], h, eps=1e-6)
    h = cm.swish(h)
    h = _mat(p["conv2"], h)
    clip_pro = cm.linear(p["clip_proj_2"], clip_direction).reshape(1, c, hh, ww)
    # reference reshapes to NCHW (1, 512, 8, 8); transpose to our NHWC
    h = h + jnp.transpose(clip_pro, (0, 2, 3, 1))
    h = cm.group_norm(p["norm3"], h, eps=1e-6)
    h = cm.swish(h)
    h = _mat(p["conv3"], h)
    h = cm.group_norm(p["norm4"], h, eps=1e-6)
    h = cm.swish(h)
    return _mat(p["conv4"], h)


# ---------------------------------------------------------------------------
# slerp (models/ddpm/diffusion.py:6-40) — batch spherical interpolation
# ---------------------------------------------------------------------------


def slerp(t, v0, v1, *, eps: float = 1e-7):
    """NaN-safe: degenerate inputs (zero vectors, colinear pair — where the
    reference's commented-out lerp fallback would apply, diffusion.py:24-26)
    fall back to linear interpolation instead of 0/0. This matters because
    the branch-free t_edit gate multiplies the UNSELECTED branch by 0, and
    0·NaN = NaN would poison the trajectory."""
    b = v0.shape[0]
    v0f = v0.reshape(b, -1)
    v1f = v1.reshape(b, -1)
    n0 = jnp.maximum(jnp.linalg.norm(v0f, axis=1, keepdims=True), eps)
    n1 = jnp.maximum(jnp.linalg.norm(v1f, axis=1, keepdims=True), eps)
    dot = jnp.sum((v0f / n0) * (v1f / n1), axis=1)
    theta_0 = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    sin_theta_0 = jnp.sin(theta_0)
    degenerate = jnp.abs(sin_theta_0) < eps
    sin_safe = jnp.where(degenerate, 1.0, sin_theta_0)
    theta_t = theta_0 * t
    s0 = jnp.where(degenerate, 1.0 - t, jnp.sin(theta_0 - theta_t) / sin_safe)
    s1 = jnp.where(degenerate, t, jnp.sin(theta_t) / sin_safe)
    shape = (b,) + (1,) * (v0.ndim - 1)
    return s0.reshape(shape) * v0 + s1.reshape(shape) * v1


# ---------------------------------------------------------------------------
# EditState — the per-forward edit specification
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class EditState:
    """Edit injection state threaded through the UNet forward.

    Data (traced) fields:
      blocks: tuple of DeltaBlock param trees (k = get_h_num).
      delta_rows: [K, h, w, C] stacked input Δh rows (train_delta_h /
        DiffStyle), or None.
      hs_coeff: [k+1] float coefficients (hs_coeff[0] scales original h).
      use_delta: scalar — 1.0 when t >= t_edit this step.
      delta_idx: scalar int — row of `delta_rows` for this step.
      clip_direction: [B?, clip_ch] for the global block, or None.

    Static fields:
      mode: 'deltablock' | 'input' | 'global'.
      flavor: DeltaBlock flavor ('ddpm' | 'openai').
      ignore_timestep: drop temb conditioning (--ignore_timesteps).
      use_mask: DiffStyle spatial-mask variant.
      input_style: 'slerp' (main forward, models/ddpm/diffusion.py:519-539)
        or 'add' (h2 = h·c0 + Δh·c1 — used when training Δh rows against the
        additive semantics of forward_layer_check:633 and mean-of-Δh replay).
    """

    blocks: Tuple[Any, ...] = ()
    delta_rows: Optional[jnp.ndarray] = None
    hs_coeff: jnp.ndarray = None
    use_delta: jnp.ndarray = 1.0
    delta_idx: jnp.ndarray = 0
    clip_direction: Optional[jnp.ndarray] = None
    alpha: Optional[jnp.ndarray] = None  # [B] for 'interp_batch'
    mode: str = "deltablock"
    flavor: str = "ddpm"
    ignore_timestep: bool = False
    use_mask: bool = False
    input_style: str = "slerp"
    # timesteps of the stacked delta_rows (static metadata — survives
    # jit/pytree round-trips, unlike a shadow attribute); None when rows
    # follow the full generation grid or mode != 'input'
    times: Optional[Tuple[int, ...]] = None

    def at_step(self, aux) -> "EditState":
        """Bind the per-step gate/index supplied by the sampler."""
        return dataclasses.replace(
            self, use_delta=aux["use_delta"], delta_idx=aux["delta_idx"]
        )


jax.tree_util.register_dataclass(
    EditState,
    data_fields=[
        "blocks",
        "delta_rows",
        "hs_coeff",
        "use_delta",
        "delta_idx",
        "clip_direction",
        "alpha",
    ],
    meta_fields=[
        "mode", "flavor", "ignore_timestep", "use_mask", "input_style", "times",
    ],
)


def apply_edit(edit: EditState, h: jnp.ndarray, temb: jnp.ndarray):
    """Produce the edited bottleneck h2 (and the Δh used), gated by
    `edit.use_delta` — the compiled form of `t[0] >= t_edit`
    (models/ddpm/diffusion.py:507-542)."""
    hs_coeff = (
        edit.hs_coeff
        if edit.hs_coeff is not None
        else jnp.ones((len(edit.blocks) + 1,), h.dtype)
    )
    # coefficients arrive f32; h may be bf16 — without the cast `h *
    # hs_coeff[0]` promotes h2 to f32 and the whole edited decode runs f32
    hs_coeff = jnp.asarray(hs_coeff).astype(h.dtype)
    # [B, K] = PER-SAMPLE coefficients: one compiled chain evaluates a whole
    # --delta_interpolation sweep batched along the batch axis (the
    # reference loops full chains per coefficient, diffusion_latent.py:
    # 500-534 x :726-755); supported for the linear injections (deltablock,
    # input/add) — the slerp/mask styles keep the per-coeff loop
    per_sample = hs_coeff.ndim == 2
    n_coeff = hs_coeff.shape[-1] if per_sample else hs_coeff.shape[0]

    def _c(i):
        if per_sample:
            return hs_coeff[:, i].reshape((-1,) + (1,) * (h.ndim - 1))
        return hs_coeff[i]

    delta_h = None

    if edit.mode == "deltablock":
        assert n_coeff >= len(edit.blocks) + 1, (
            f"hs_coeff needs {len(edit.blocks) + 1} entries (original-h + one "
            f"per block), got {n_coeff} — JAX would silently clamp"
        )
        temb_in = None if edit.ignore_timestep else temb
        h2 = h * _c(0)
        for i, bp in enumerate(edit.blocks):
            delta_h = delta_block_apply(bp, h, temb_in, flavor=edit.flavor)
            h2 = h2 + delta_h * _c(i + 1)
    elif edit.mode == "input":
        # mode="clip": a mis-specified delta_idx must degrade to a wrong-but-
        # finite row, never to NaN fill (jnp.take's default OOB behavior)
        row = jnp.take(edit.delta_rows, edit.delta_idx, axis=0, mode="clip")
        delta_h = jnp.broadcast_to(row[None], h.shape).astype(h.dtype)
        if edit.input_style == "add":
            assert n_coeff >= 2, (
                f"'add' injection needs hs_coeff = (c_h, c_delta), got "
                f"{n_coeff} entries — JAX would silently clamp"
            )
            h2 = h * _c(0) + delta_h * _c(1)
        elif per_sample:
            raise ValueError(
                "per-sample hs_coeff ([B, K]) is only supported for the "
                "linear injections (deltablock, input/add) — the slerp/mask "
                "styles would silently misread hs_coeff[0] as a row"
            )
        elif edit.use_mask:
            # DiffStyle mask region (models/ddpm/diffusion.py:520-528);
            # reference NCHW [:, :, 4:-1, 3:5] → NHWC [:, 4:-1, 3:5, :].
            mask = jnp.zeros_like(h).at[:, 4:-1, 3:5, :].set(1.0)
            partial = slerp(1.0 - hs_coeff[0], h * mask, delta_h * mask)
            h2 = partial + (1.0 - mask) * h
        else:
            # norm-matched slerp (models/ddpm/diffusion.py:530-539); the
            # delta norm is floored so an all-zero row (e.g. the delta_idx=0
            # placeholder below t_edit) yields 0, not NaN — which would
            # survive the branch-free gate (0*NaN = NaN)
            b = h.shape[0]
            h_norm = jnp.linalg.norm(h.reshape(b, -1), axis=1)
            d_norm = jnp.maximum(
                jnp.linalg.norm(delta_h.reshape(b, -1), axis=1), 1e-12
            )
            shape = (b,) + (1,) * (h.ndim - 1)
            normalized = h_norm.reshape(shape) * delta_h / d_norm.reshape(shape)
            h2 = slerp(1.0 - hs_coeff[0], h, normalized)
    elif edit.mode == "global":
        delta_h = delta_block_global_apply(
            edit.blocks[0], h, temb, edit.clip_direction
        )
        h2 = h + delta_h
    elif edit.mode == "interp_batch":
        # batch-endpoint h interpolation (`interpolation2`,
        # models/ddpm/diffusion.py:761-832): every sample becomes
        # (1-alpha)·h[0] + alpha·h[-1]
        a = edit.alpha.reshape((-1,) + (1,) * (h.ndim - 1)).astype(h.dtype)
        h0 = jnp.broadcast_to(h[:1], h.shape)
        h1 = jnp.broadcast_to(h[-1:], h.shape)
        h2 = (1.0 - a) * h0 + a * h1
        delta_h = None
    else:
        raise ValueError(f"unknown edit mode: {edit.mode}")

    use = jnp.asarray(edit.use_delta, h.dtype)
    h2 = use * h2 + (1.0 - use) * h
    return h2, delta_h
