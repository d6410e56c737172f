"""DDPM++ UNet family (CelebA-HQ / LSUN church / LSUN bedroom / Dialog / CUSTOM).

Functional JAX re-design of the reference `models/ddpm/diffusion.py:327-580`
(SDEdit/DiffusionCLIP checkpoint-compatible via compat/torch converters):

  * NHWC layout, HWIO conv kernels, 1x1 convs lowered to channel matmuls.
  * Encoder runs ONCE; the asymmetric reverse process's two decoder passes
    (reference runs the edited decoder then the original, :544-578) are
    fused into a single decode over a 2B stacked batch — algebraically
    identical, double-size MXU matmuls, and no `hs.pop()` mutation-order
    hazard.
  * The `t[0] >= t_edit` runtime branch (:510) becomes a mask supplied by
    the step table (core/steptable.py) through `EditState`.

Forward contract (mirrors reference returns (et, et_modified, delta_h,
middle_h), :580):

    apply(params, cfg, x, t, edit=None) -> (eps, eps_mod|None, delta_h|None, middle_h)
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from asyrp_official_tpu.models import common as cm
from asyrp_official_tpu.models.delta import EditState, apply_edit

__all__ = ["DDPMppConfig", "init", "apply", "get_temb", "CELEBA_CONFIG"]


@dataclasses.dataclass(frozen=True)
class DDPMppConfig:
    ch: int = 128
    out_ch: int = 3
    ch_mult: Tuple[int, ...] = (1, 1, 2, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (16,)
    dropout: float = 0.0
    in_channels: int = 3
    resolution: int = 256
    resamp_with_conv: bool = True
    # rematerialize resblocks under grad (jax.checkpoint) — trades FLOPs for
    # activation memory when training Δ through the 256² dual decode
    remat: bool = False

    @property
    def temb_ch(self) -> int:
        return self.ch * 4

    @property
    def num_resolutions(self) -> int:
        return len(self.ch_mult)

    @property
    def bottleneck_ch(self) -> int:
        return self.ch * self.ch_mult[-1]

    def level_resolutions(self) -> List[int]:
        """Input resolution of each down level (reference curr_res walk)."""
        res = [self.resolution]
        for _ in range(self.num_resolutions - 1):
            res.append(res[-1] // 2)
        return res


# the active DDPM++ operating point (configs/celeba.yml et al. share it)
CELEBA_CONFIG = DDPMppConfig()


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _resblock_init(key, cin, cout, temb_ch):
    ks = cm.rsplit(key, 4)
    p = {
        "norm1": cm.norm_init(cin),
        "conv1": cm.conv_init(ks[0], 3, 3, cin, cout),
        "temb_proj": cm.linear_init(ks[1], temb_ch, cout),
        "norm2": cm.norm_init(cout),
        "conv2": cm.conv_init(ks[2], 3, 3, cout, cout),
    }
    if cin != cout:
        # reference uses the 1x1 nin_shortcut (conv_shortcut=False default)
        p["nin_shortcut"] = cm.linear_init(ks[3], cin, cout)
    return p


def _attn_init(key, ch):
    ks = cm.rsplit(key, 4)
    return {
        "norm": cm.norm_init(ch),
        "q": cm.linear_init(ks[0], ch, ch),
        "k": cm.linear_init(ks[1], ch, ch),
        "v": cm.linear_init(ks[2], ch, ch),
        "proj_out": cm.linear_init(ks[3], ch, ch),
    }


def init(key, cfg: DDPMppConfig) -> Dict[str, Any]:
    keys = iter(cm.rsplit(key, 4096))
    nxt = lambda: next(keys)

    params: Dict[str, Any] = {
        "temb": {
            "dense0": cm.linear_init(nxt(), cfg.ch, cfg.temb_ch),
            "dense1": cm.linear_init(nxt(), cfg.temb_ch, cfg.temb_ch),
        },
        "conv_in": cm.conv_init(nxt(), 3, 3, cfg.in_channels, cfg.ch),
    }

    level_res = cfg.level_resolutions()
    in_ch_mult = (1,) + tuple(cfg.ch_mult)

    down = []
    block_in = cfg.ch
    for i_level in range(cfg.num_resolutions):
        block_in = cfg.ch * in_ch_mult[i_level]
        block_out = cfg.ch * cfg.ch_mult[i_level]
        blocks, attns = [], []
        for _ in range(cfg.num_res_blocks):
            blocks.append(_resblock_init(nxt(), block_in, block_out, cfg.temb_ch))
            block_in = block_out
            if level_res[i_level] in cfg.attn_resolutions:
                attns.append(_attn_init(nxt(), block_in))
        lvl = {"block": blocks, "attn": attns}
        if i_level != cfg.num_resolutions - 1 and cfg.resamp_with_conv:
            # with_conv=False resamples parameter-free (avg pool / nearest
            # interpolate, models/ddpm/diffusion.py:73-113)
            lvl["downsample"] = cm.conv_init(nxt(), 3, 3, block_in, block_in)
        down.append(lvl)
    params["down"] = down

    params["mid"] = {
        "block_1": _resblock_init(nxt(), block_in, block_in, cfg.temb_ch),
        "attn_1": _attn_init(nxt(), block_in),
        "block_2": _resblock_init(nxt(), block_in, block_in, cfg.temb_ch),
    }

    # up levels — reference builds reversed and prepends; we store by level
    # index (params["up"][i_level]) and walk reversed in decode.
    up: List[Optional[dict]] = [None] * cfg.num_resolutions
    curr_res = level_res[-1]
    for i_level in reversed(range(cfg.num_resolutions)):
        block_out = cfg.ch * cfg.ch_mult[i_level]
        skip_in = cfg.ch * cfg.ch_mult[i_level]
        blocks, attns = [], []
        for i_block in range(cfg.num_res_blocks + 1):
            if i_block == cfg.num_res_blocks:
                skip_in = cfg.ch * in_ch_mult[i_level]
            blocks.append(
                _resblock_init(nxt(), block_in + skip_in, block_out, cfg.temb_ch)
            )
            block_in = block_out
            if curr_res in cfg.attn_resolutions:
                attns.append(_attn_init(nxt(), block_in))
        lvl = {"block": blocks, "attn": attns}
        if i_level != 0:
            if cfg.resamp_with_conv:
                lvl["upsample"] = cm.conv_init(nxt(), 3, 3, block_in, block_in)
            curr_res = curr_res * 2
        up[i_level] = lvl
    params["up"] = up

    params["norm_out"] = cm.norm_init(block_in)
    params["conv_out"] = cm.conv_init(nxt(), 3, 3, block_in, cfg.out_ch)
    return params


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------


_mat = cm.mat1x1


def _gn_silu(p, x):
    """GroupNorm+SiLU. XLA fuses this chain into the following conv; a
    hand-written Pallas version was measured 17% SLOWER end-to-end at
    batch 1 on the v5e (1213 vs 1003 ms fused invert+edit p50) and blocked
    GSPMD partitioning, so it was removed (BASELINE.md round 2)."""
    return cm.swish(cm.group_norm(p, x, eps=1e-6))


def _resblock(p, x, temb):
    h = _gn_silu(p["norm1"], x)
    h = cm.conv2d(p["conv1"], h)
    h = h + cm.linear(p["temb_proj"], cm.swish(temb))[:, None, None, :]
    h = _gn_silu(p["norm2"], h)
    h = cm.conv2d(p["conv2"], h)
    if "nin_shortcut" in p:
        x = _mat(p["nin_shortcut"], x)
    elif "conv_shortcut" in p:
        x = cm.conv2d(p["conv_shortcut"], x)
    return x + h


def _attn(p, x):
    b, hh, ww, c = x.shape
    h_ = cm.group_norm(p["norm"], x, eps=1e-6)
    flat = h_.reshape(b, hh * ww, c)
    q = cm.linear(p["q"], flat)
    k = cm.linear(p["k"], flat)
    v = cm.linear(p["v"], flat)
    out = cm.spatial_attention(q, k, v, num_heads=1, legacy_scale=False)
    out = cm.linear(p["proj_out"], out).reshape(b, hh, ww, c)
    return x + out


def get_temb(params, cfg: DDPMppConfig, t):
    """Timestep embedding MLP (reference get_temb, models/ddpm/diffusion.py:464-470)."""
    temb = cm.timestep_embedding_ddpm(t, cfg.ch)
    temb = cm.linear(params["temb"]["dense0"], temb)
    temb = cm.swish(temb)
    temb = cm.linear(params["temb"]["dense1"], temb)
    return temb


def _block_fn(cfg):
    if cfg.remat:
        return jax.checkpoint(_resblock)
    return _resblock


def _encode(params, cfg, x, temb):
    resblock = _block_fn(cfg)
    hs = [cm.conv2d(params["conv_in"], x)]
    for i_level in range(cfg.num_resolutions):
        lvl = params["down"][i_level]
        for i_block in range(cfg.num_res_blocks):
            h = resblock(lvl["block"][i_block], hs[-1], temb)
            if lvl["attn"]:
                h = _attn(lvl["attn"][i_block], h)
            hs.append(h)
        if i_level != cfg.num_resolutions - 1:
            hs.append(
                cm.downsample_pad_conv(lvl["downsample"], hs[-1])
                if cfg.resamp_with_conv
                else cm.avg_pool_2x(hs[-1])
            )
    return hs


def _middle(params, h, temb):
    h = _resblock(params["mid"]["block_1"], h, temb)
    h = _attn(params["mid"]["attn_1"], h)
    h = _resblock(params["mid"]["block_2"], h, temb)
    return h


def _decode(params, cfg, h, hs, temb):
    resblock = _block_fn(cfg)
    hs = list(hs)  # fresh copy — decode owns its skip stack
    for i_level in reversed(range(cfg.num_resolutions)):
        lvl = params["up"][i_level]
        for i_block in range(cfg.num_res_blocks + 1):
            h = resblock(
                lvl["block"][i_block],
                jnp.concatenate([h, hs.pop()], axis=-1),
                temb,
            )
            if lvl["attn"]:
                h = _attn(lvl["attn"][i_block], h)
        if i_level != 0:
            h = cm.upsample_nearest_2x(h)
            if cfg.resamp_with_conv:
                h = cm.conv2d(lvl["upsample"], h)
    h = _gn_silu(params["norm_out"], h)
    return cm.conv2d(params["conv_out"], h)


def apply(
    params,
    cfg: DDPMppConfig,
    x: jnp.ndarray,
    t: jnp.ndarray,
    edit: Optional[EditState] = None,
    decode_mode: str = "auto",
):
    """Full forward. `x` is [B, H, W, C] NHWC; `t` is [B] float timesteps.

    With `edit`, both eps and eps_mod are produced via ONE decode over the
    2B stacked batch (fusing the reference's two sequential decoder passes,
    models/ddpm/diffusion.py:544-578). `decode_mode="split"` forces two
    B-sized decodes instead: identical math (batching is per-sample
    independent), but under `jax.grad` the plain decode carries no
    dependence on the trainable Δ, so XLA drops its entire backward (and
    remat recompute) — with the 2B stack the zero cotangent of the plain
    rows is invisible to AD and the backward runs at 2B. Training defaults
    to "split": measured 1.50x (bs2) / 1.40x (bs8) per-image on-chip;
    stacked wins 1.09x only at bs4 where 2B=8 is the v5e conv sweet spot
    (BASELINE.md round 4).
    """
    if decode_mode not in ("auto", "split"):
        raise ValueError(f"decode_mode must be 'auto'|'split', got {decode_mode!r}")
    assert x.shape[1] == x.shape[2] == cfg.resolution, (
        f"expected {cfg.resolution}, got {x.shape}"
    )
    # the embedding MLP runs in f32 (tiny); cast to the activation dtype so
    # the per-block temb adds don't promote a bf16 network back to f32 —
    # without this EVERY conv after the first resblock silently ran f32
    temb = get_temb(params, cfg, t).astype(x.dtype)
    hs = _encode(params, cfg, x, temb)
    h = _middle(params, hs[-1], temb)
    middle_h = h

    if edit is None:
        eps = _decode(params, cfg, h, hs, temb)
        return eps, None, None, middle_h

    h2, delta_h = apply_edit(edit, h, temb)
    if x.shape[0] == 1 or decode_mode == "split":
        # batch-1 serving: two batch-1 decodes beat one batch-2 stacked
        # decode — batch 2 is the v5e's least efficient conv batch
        # (16.3 ms/eval vs 13.8 at batch 1, BASELINE.md round 2); identical
        # math either way (batching is independent per sample)
        eps = _decode(params, cfg, h, hs, temb)
        eps_mod = _decode(params, cfg, h2, hs, temb)
    else:
        stacked = jnp.concatenate([h, h2], axis=0)
        skips = [jnp.concatenate([s, s], axis=0) for s in hs]
        temb2 = jnp.concatenate([temb, temb], axis=0)
        out = _decode(params, cfg, stacked, skips, temb2)
        eps, eps_mod = jnp.split(out, 2, axis=0)
    return eps, eps_mod, delta_h, middle_h
