"""EncoderUNetModel (the ADM classifier half-UNet) and SuperResModel — the
two guided_diffusion variants the reference ships but never drives
(models/guided_diffusion/unet.py:860-875 SuperRes, :877-1088 Encoder).
Ported so the model surface is complete: classifier-guidance and
super-resolution users of the reference find working equivalents.

Functional like the rest of models/: plain param pytrees, NHWC, the same
static plan machinery as openai_unet (the encoder IS the UNet's input +
middle stems). Pool heads:

  * 'adaptive'   — GN → SiLU → global avg-pool → zero-init 1x1 → [N, K]
  * 'attention'  — GN → SiLU → AttentionPool2d (CLIP-style mean-token
                   attention pool, unet.py:64-93)
  * 'spatial'    — per-block spatial means concatenated → MLP (ReLU)
  * 'spatial_v2' — same, with GN32 + SiLU inside the MLP
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from asyrp_official_tpu.models import common as cm
from asyrp_official_tpu.models.openai_unet import (
    OpenAIUNetConfig,
    _apply_layer,
    _layer_init,
    build_plan,
)

__all__ = [
    "EncoderUNetConfig",
    "encoder_plan",
    "encoder_init",
    "encoder_apply",
    "encoder_params_from_torch",
    "superres_config",
    "superres_apply",
]


@dataclasses.dataclass(frozen=True)
class EncoderUNetConfig(OpenAIUNetConfig):
    pool: str = "adaptive"  # adaptive | attention | spatial | spatial_v2


def encoder_plan(cfg: EncoderUNetConfig) -> Dict[str, Any]:
    """Input + middle stems of the UNet plan, plus the spatial-pool feature
    size (the reference's running `_feature_size`, unet.py:936-994)."""
    plan = build_plan(cfg)

    def block_out_ch(block):
        for spec in reversed(block):
            if "cout" in spec:
                return spec["cout"]
            if "ch" in spec:
                return spec["ch"]
        raise ValueError(block)

    feature_size = sum(block_out_ch(b) for b in plan["input"])
    feature_size += cfg.bottleneck_ch  # middle
    return {
        "input": plan["input"],
        "middle": plan["middle"],
        "feature_size": feature_size,
    }


def encoder_init(key, cfg: EncoderUNetConfig) -> Dict[str, Any]:
    plan = encoder_plan(cfg)
    keys = iter(cm.rsplit(key, 4096))
    nxt = lambda: next(keys)
    params: Dict[str, Any] = {
        "time_embed": {
            "dense0": cm.linear_init(nxt(), cfg.model_channels, cfg.temb_ch),
            "dense1": cm.linear_init(nxt(), cfg.temb_ch, cfg.temb_ch),
        },
        "input_blocks": [
            [_layer_init(nxt(), spec, cfg) for spec in block]
            for block in plan["input"]
        ],
        "middle_block": [
            _layer_init(nxt(), spec, cfg) for spec in plan["middle"]
        ],
    }
    ch = cfg.bottleneck_ch
    if cfg.pool == "adaptive":
        params["out"] = {
            "norm": cm.norm_init(ch),
            "conv": cm.linear_init(nxt(), ch, cfg.out_channels, zero=True),
        }
    elif cfg.pool == "attention":
        assert cfg.num_head_channels != -1, "attention pool needs head channels"
        ds = 2 ** (len(cfg.channel_mult) - 1)
        t = (cfg.image_size // ds) ** 2
        params["out"] = {
            "norm": cm.norm_init(ch),
            "pool": {
                # stored [T+1, C] (torch keeps [C, T+1], unet.py:76-78)
                "positional_embedding": (
                    cm.rnormal(nxt(), (t + 1, ch)) / ch ** 0.5
                ),
                "qkv": cm.linear_init(nxt(), ch, 3 * ch),
                "c_proj": cm.linear_init(nxt(), ch, cfg.out_channels),
            },
        }
    elif cfg.pool in ("spatial", "spatial_v2"):
        fs = plan["feature_size"]
        params["out"] = {
            "lin1": cm.linear_init(nxt(), fs, 2048),
            "lin2": cm.linear_init(nxt(), 2048, cfg.out_channels),
        }
        if cfg.pool == "spatial_v2":
            params["out"]["norm"] = cm.norm_init(2048)
    else:
        raise ValueError(f"Unexpected {cfg.pool} pooling")
    return params


def _attention_pool(p, cfg: EncoderUNetConfig, h: jnp.ndarray) -> jnp.ndarray:
    """AttentionPool2d (unet.py:64-93): prepend the mean token, add the
    positional embedding, one QKVAttention (new order), take token 0."""
    b, hh, ww, c = h.shape
    flat = h.reshape(b, hh * ww, c)
    flat = jnp.concatenate([flat.mean(axis=1, keepdims=True), flat], axis=1)
    flat = flat + p["positional_embedding"][None].astype(flat.dtype)
    qkv = cm.linear(p["qkv"], flat)
    t = flat.shape[1]
    heads = c // cfg.num_head_channels
    ch = c // heads
    qkv = qkv.reshape(b, t, 3, heads, ch)  # conv1d(C→3C) ≡ new-order layout
    q, k, v = (qkv[:, :, i].reshape(b, t, c) for i in range(3))
    out = cm.spatial_attention(q, k, v, num_heads=heads, legacy_scale=True)
    out = cm.linear(p["c_proj"], out)
    return out[:, 0]


def encoder_apply(
    params, cfg: EncoderUNetConfig, x: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """[B, H, W, C] + [B] timesteps → [B, out_channels] logits
    (unet.py:1063-1088)."""
    plan = encoder_plan(cfg)
    emb = cm.timestep_embedding_openai(t, cfg.model_channels)
    emb = cm.linear(params["time_embed"]["dense0"], emb)
    emb = cm.swish(emb)
    emb = cm.linear(params["time_embed"]["dense1"], emb)
    emb = emb.astype(x.dtype)  # keep bf16 activations bf16 (see ddpmpp.apply)

    spatial = cfg.pool.startswith("spatial")
    results = []
    h = x
    for block, bparams in zip(plan["input"], params["input_blocks"]):
        for spec, p in zip(block, bparams):
            h = _apply_layer(p, spec, cfg, h, emb)
        if spatial:
            results.append(h.mean(axis=(1, 2)))
    for spec, p in zip(plan["middle"], params["middle_block"]):
        h = _apply_layer(p, spec, cfg, h, emb)

    out = params["out"]
    if spatial:
        results.append(h.mean(axis=(1, 2)))
        feats = jnp.concatenate(results, axis=-1)
        y = cm.linear(out["lin1"], feats)
        if cfg.pool == "spatial_v2":
            y = cm.group_norm(
                out["norm"], y[:, None, None, :], eps=1e-5
            )[:, 0, 0, :]
            y = cm.swish(y)
        else:
            y = jnp.maximum(y, 0.0)
        return cm.linear(out["lin2"], y)

    h = cm.group_norm(out["norm"], h, eps=1e-5)
    h = cm.swish(h)
    if cfg.pool == "adaptive":
        pooled = h.mean(axis=(1, 2))  # AdaptiveAvgPool2d((1,1))
        return cm.linear(out["conv"], pooled)  # zero-init 1x1 conv
    return _attention_pool(out["pool"], cfg, h)


def encoder_params_from_torch(sd, cfg: EncoderUNetConfig) -> Dict[str, Any]:
    """Convert a reference EncoderUNetModel state_dict (torch layouts per
    compat/torch_convert helpers)."""
    from asyrp_official_tpu.compat import torch_convert as tc

    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}
    params: Dict[str, Any] = {
        "time_embed": {
            "dense0": tc._lin(sd, "time_embed.0"),
            "dense1": tc._lin(sd, "time_embed.2"),
        }
    }

    # one shared walker owns the torch-layout key detection
    # (compat/torch_convert.classify_openai_layer); this model stores bare
    # layer params (the kind tag is recomputed from structure at apply)
    convert_layer = lambda p: tc.classify_openai_layer(sd, p)[1]
    params["input_blocks"] = tc.walk_openai_blocks(sd, "input_blocks", convert_layer)
    params["middle_block"] = tc.walk_openai_middle(sd, convert_layer)

    if cfg.pool == "adaptive":
        w = sd["out.3.weight"]  # [K, C, 1, 1] zero-init 1x1
        params["out"] = {
            "norm": tc._norm(sd, "out.0"),
            "conv": {"w": w[:, :, 0, 0].T, "b": sd["out.3.bias"]},
        }
    elif cfg.pool == "attention":
        qkv = sd["out.2.qkv_proj.weight"][:, :, 0]    # [3C, C] conv1d
        cpr = sd["out.2.c_proj.weight"][:, :, 0]      # [K, C]
        params["out"] = {
            "norm": tc._norm(sd, "out.0"),
            "pool": {
                "positional_embedding": sd["out.2.positional_embedding"].T,
                "qkv": {"w": qkv.T, "b": sd["out.2.qkv_proj.bias"]},
                "c_proj": {"w": cpr.T, "b": sd["out.2.c_proj.bias"]},
            },
        }
    elif cfg.pool in ("spatial", "spatial_v2"):
        params["out"] = {
            "lin1": tc._lin(sd, "out.0"),
            "lin2": tc._lin(sd, "out.3" if cfg.pool == "spatial_v2" else "out.2"),
        }
        if cfg.pool == "spatial_v2":
            params["out"]["norm"] = tc._norm(sd, "out.1")
    else:
        raise ValueError(cfg.pool)
    return jax.tree.map(jnp.asarray, params)


# ---------------------------------------------------------------------------
# SuperResModel (unet.py:860-875): a UNetModel over [x ; bilinear(low_res)]
# ---------------------------------------------------------------------------


def superres_config(cfg: OpenAIUNetConfig) -> OpenAIUNetConfig:
    """The SuperRes constructor doubles in_channels (unet.py:867-868);
    init/params_from_torch take this doubled config."""
    return dataclasses.replace(cfg, in_channels=cfg.in_channels * 2)


def superres_apply(params, cfg, x, t, low_res, **kw):
    """forward(x, t, low_res) (unet.py:870-875): bilinear-upsample the
    conditioning image to x's resolution (align_corners=False ≡ jax.image
    half-pixel centers), concat on channels, run the standard UNet apply."""
    from asyrp_official_tpu.models.openai_unet import apply

    up = jax.image.resize(
        low_res,
        (low_res.shape[0], x.shape[1], x.shape[2], low_res.shape[3]),
        method="bilinear",
    )
    return apply(params, cfg, jnp.concatenate([x, up], axis=-1), t, **kw)
