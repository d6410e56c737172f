"""Torch state_dict → JAX param-pytree converters.

Covers the reference checkpoint layouts:
  * DDPM++ UNet (SDEdit celeba_hq.ckpt / LSUN ckpts — layout of
    models/ddpm/diffusion.py:327-430);
  * OpenAI UNet (iDDPM P2/ILVR AFHQ/FFHQ/IMAGENET and ADM MetFACE /
    CelebA_HQ_P2 — layout of models/improved_ddpm/unet.py:438-658 and
    models/guided_diffusion/unet.py:437-658, which share key names);
  * DeltaBlock checkpoints, both flavors — the 36 released Δh `.pth`
    files (`checkpoint/{attr}_LC_..._{iter}.pth`, key "0" per block,
    diffusion_latent.py:392-404).

Layout conversions (torch → ours):
  conv kxk: OIHW → HWIO;  conv 1x1: [O,I,1,1] → [I,O] matrix;
  linear:   [O,I] → [I,O];  GroupNorm: weight/bias → scale/bias.

These functions take a dict of numpy arrays; use `load_state_dict_numpy`
to read a `.pth`/`.ckpt` without keeping torch tensors alive.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

__all__ = [
    "load_state_dict_numpy",
    "convert_ddpmpp",
    "convert_openai_unet",
    "convert_delta_block",
]


def load_state_dict_numpy(path: str) -> Dict[str, np.ndarray]:
    """Read a torch checkpoint into {key: float32 numpy} (host-side only).

    Accepts plain pickles, {'state_dict': ...} wrappers, DataParallel
    'module.'-prefixed keys, and TorchScript archives (the OpenAI CLIP
    release format — `clip.load` tries jit first, losses/clip_loss.py:35)."""
    import torch

    try:
        sd = torch.load(path, map_location="cpu", weights_only=False)
    except RuntimeError:
        sd = torch.jit.load(path, map_location="cpu").state_dict()
    if hasattr(sd, "state_dict") and not isinstance(sd, dict):
        sd = sd.state_dict()  # a ScriptModule/Module pickled whole
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):  # DataParallel-saved checkpoints
            k = k[len("module."):]
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
        else:
            out[k] = v
    return out


def _conv(sd, prefix):
    w = np.asarray(sd[f"{prefix}.weight"], np.float32)
    return {
        "w": np.transpose(w, (2, 3, 1, 0)),  # OIHW → HWIO
        "b": np.asarray(sd[f"{prefix}.bias"], np.float32),
    }


def _mat(sd, prefix):
    """1x1 conv → [in, out] channel matrix."""
    w = np.asarray(sd[f"{prefix}.weight"], np.float32)
    assert w.shape[2:] == (1, 1), f"{prefix}: expected 1x1 conv, got {w.shape}"
    return {"w": w[:, :, 0, 0].T, "b": np.asarray(sd[f"{prefix}.bias"], np.float32)}


def _lin(sd, prefix):
    w = np.asarray(sd[f"{prefix}.weight"], np.float32)
    return {"w": w.T, "b": np.asarray(sd[f"{prefix}.bias"], np.float32)}


def _norm(sd, prefix):
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"], np.float32),
        "bias": np.asarray(sd[f"{prefix}.bias"], np.float32),
    }


# ---------------------------------------------------------------------------
# DDPM++
# ---------------------------------------------------------------------------


def _ddpmpp_resblock(sd, p):
    out = {
        "norm1": _norm(sd, f"{p}.norm1"),
        "conv1": _conv(sd, f"{p}.conv1"),
        "temb_proj": _lin(sd, f"{p}.temb_proj"),
        "norm2": _norm(sd, f"{p}.norm2"),
        "conv2": _conv(sd, f"{p}.conv2"),
    }
    if f"{p}.nin_shortcut.weight" in sd:
        out["nin_shortcut"] = _mat(sd, f"{p}.nin_shortcut")
    if f"{p}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, f"{p}.conv_shortcut")
    return out


def _ddpmpp_attn(sd, p):
    return {
        "norm": _norm(sd, f"{p}.norm"),
        "q": _mat(sd, f"{p}.q"),
        "k": _mat(sd, f"{p}.k"),
        "v": _mat(sd, f"{p}.v"),
        "proj_out": _mat(sd, f"{p}.proj_out"),
    }


def convert_ddpmpp(sd: Dict[str, np.ndarray], cfg) -> Dict[str, Any]:
    """cfg: models.ddpmpp.DDPMppConfig."""
    params: Dict[str, Any] = {
        "temb": {
            "dense0": _lin(sd, "temb.dense.0"),
            "dense1": _lin(sd, "temb.dense.1"),
        },
        "conv_in": _conv(sd, "conv_in"),
    }

    down = []
    for i in range(cfg.num_resolutions):
        lvl = {"block": [], "attn": []}
        for j in range(cfg.num_res_blocks):
            lvl["block"].append(_ddpmpp_resblock(sd, f"down.{i}.block.{j}"))
            if f"down.{i}.attn.{j}.norm.weight" in sd:
                lvl["attn"].append(_ddpmpp_attn(sd, f"down.{i}.attn.{j}"))
        if f"down.{i}.downsample.conv.weight" in sd:
            lvl["downsample"] = _conv(sd, f"down.{i}.downsample.conv")
        down.append(lvl)
    params["down"] = down

    params["mid"] = {
        "block_1": _ddpmpp_resblock(sd, "mid.block_1"),
        "attn_1": _ddpmpp_attn(sd, "mid.attn_1"),
        "block_2": _ddpmpp_resblock(sd, "mid.block_2"),
    }

    up = []
    for i in range(cfg.num_resolutions):
        lvl = {"block": [], "attn": []}
        for j in range(cfg.num_res_blocks + 1):
            lvl["block"].append(_ddpmpp_resblock(sd, f"up.{i}.block.{j}"))
            if f"up.{i}.attn.{j}.norm.weight" in sd:
                lvl["attn"].append(_ddpmpp_attn(sd, f"up.{i}.attn.{j}"))
        if f"up.{i}.upsample.conv.weight" in sd:
            lvl["upsample"] = _conv(sd, f"up.{i}.upsample.conv")
        up.append(lvl)
    params["up"] = up

    params["norm_out"] = _norm(sd, "norm_out")
    params["conv_out"] = _conv(sd, "conv_out")
    return params


# ---------------------------------------------------------------------------
# DeltaBlock (both flavors)
# ---------------------------------------------------------------------------


def convert_delta_block(sd: Dict[str, np.ndarray], prefix: str = "") -> Dict[str, Any]:
    """Auto-detects flavor from key names.

    DDPM flavor keys: conv1 / temb_proj / norm2 / conv2
    (models/ddpm/diffusion.py:236-248 — verified against the released
    `checkpoint/*.pth` tensor shapes, SURVEY.md §2.1 #8).
    OpenAI flavor keys: in_layers.{0,2} / emb_layers.1 / out_layers.{0,3}
    (models/improved_ddpm/unet.py:815-834)."""
    p = prefix + "." if prefix and not prefix.endswith(".") else prefix
    if f"{p}conv1.weight" in sd:
        return {
            "conv1": _mat(sd, f"{p}conv1"),
            "temb_proj": _lin(sd, f"{p}temb_proj"),
            "norm2": _norm(sd, f"{p}norm2"),
            "conv2": _mat(sd, f"{p}conv2"),
        }
    if f"{p}in_layers.0.weight" in sd:
        return {
            "in_norm": _norm(sd, f"{p}in_layers.0"),
            "in_conv": _mat(sd, f"{p}in_layers.2"),
            "emb": _lin(sd, f"{p}emb_layers.1"),
            "out_norm": _norm(sd, f"{p}out_layers.0"),
            "out_conv": _mat(sd, f"{p}out_layers.3"),
        }
    raise KeyError(
        f"no DeltaBlock found at prefix {prefix!r}; keys: {sorted(sd)[:8]}..."
    )


# ---------------------------------------------------------------------------
# OpenAI UNet (iDDPM + ADM share state_dict key names)
# ---------------------------------------------------------------------------


def _openai_resblock(sd, p):
    out = {
        "in_norm": _norm(sd, f"{p}.in_layers.0"),
        "in_conv": _conv(sd, f"{p}.in_layers.2"),
        "emb": _lin(sd, f"{p}.emb_layers.1"),
        "out_norm": _norm(sd, f"{p}.out_layers.0"),
        "out_conv": _conv(sd, f"{p}.out_layers.3"),
    }
    if f"{p}.skip_connection.weight" in sd:
        w = sd[f"{p}.skip_connection.weight"]
        if w.shape[2:] == (1, 1):
            out["skip_mat"] = _mat(sd, f"{p}.skip_connection")
        else:
            out["skip_conv"] = _conv(sd, f"{p}.skip_connection")
    return out


def _openai_attn(sd, p):
    return {
        "norm": _norm(sd, f"{p}.norm"),
        "qkv": _mat1d(sd, f"{p}.qkv"),
        "proj_out": _mat1d(sd, f"{p}.proj_out"),
    }


def _mat1d(sd, prefix):
    """conv_nd(1, ...) 1x1 conv → [in, out] matrix ([O, I, 1] kernels)."""
    w = np.asarray(sd[f"{prefix}.weight"], np.float32)
    assert w.shape[2:] == (1,), f"{prefix}: expected 1d 1x conv, got {w.shape}"
    return {"w": w[:, :, 0].T, "b": np.asarray(sd[f"{prefix}.bias"], np.float32)}


def classify_openai_layer(sd, p):
    """OpenAI-UNet layer key detection — the ONE place that knows the
    torch checkpoint layout (shared by convert_openai_unet and
    models/encoder_unet.encoder_params_from_torch). Returns
    ('res'|'attn'|'down'|'up'|'conv', converted_params)."""
    if f"{p}.in_layers.0.weight" in sd:
        return ("res", _openai_resblock(sd, p))
    if f"{p}.qkv.weight" in sd:
        return ("attn", _openai_attn(sd, p))
    if f"{p}.op.weight" in sd:
        return ("down", _conv(sd, f"{p}.op"))
    if f"{p}.conv.weight" in sd:
        return ("up", _conv(sd, f"{p}.conv"))
    if f"{p}.weight" in sd:  # bare conv (input_blocks.0.0)
        return ("conv", _conv(sd, p))
    raise KeyError(f"unrecognized layer at {p}")


def walk_openai_blocks(sd, stem: str, convert_layer):
    """Group '{stem}.{bi}.{li}.*' keys by block and convert in order."""
    idx = set()
    for k in sd:
        if k.startswith(stem + "."):
            parts = k[len(stem) + 1 :].split(".")
            idx.add((int(parts[0]), int(parts[1])))
    blocks, cur = [], -1
    for bi, li in sorted(idx):
        if bi != cur:
            blocks.append([])
            cur = bi
        blocks[-1].append(convert_layer(f"{stem}.{bi}.{li}"))
    return blocks


def walk_openai_middle(sd, convert_layer):
    return [
        convert_layer(f"middle_block.{li}")
        for li in sorted(
            {int(k.split(".")[1]) for k in sd if k.startswith("middle_block.")}
        )
    ]


def convert_openai_unet(sd: Dict[str, np.ndarray], cfg) -> Dict[str, Any]:
    """cfg: models.openai_unet.OpenAIUNetConfig. Walks input_blocks /
    middle_block / output_blocks by index, detecting each sub-layer kind
    from its keys (ResBlock vs AttentionBlock vs Up/Downsample)."""
    params: Dict[str, Any] = {
        "time_embed": {
            "dense0": _lin(sd, "time_embed.0"),
            "dense1": _lin(sd, "time_embed.2"),
        }
    }
    if "label_emb.weight" in sd:
        params["label_emb"] = {
            "w": np.asarray(sd["label_emb.weight"], np.float32)
        }

    convert_layer = lambda p: classify_openai_layer(sd, p)
    for stem in ("input_blocks", "output_blocks"):
        params[stem] = walk_openai_blocks(sd, stem, convert_layer)
    params["middle_block"] = walk_openai_middle(sd, convert_layer)

    params["out_norm"] = _norm(sd, "out.0")
    params["out_conv"] = _conv(sd, "out.2")
    return params
