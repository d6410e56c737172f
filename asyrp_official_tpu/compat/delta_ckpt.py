"""Δ checkpoint IO — read the 36 released `.pth` files and write
reference-compatible checkpoints, plus a native npz format.

Reference format (diffusion_latent.py:392-404): a dict with
  * key "i" (str) → DeltaBlock state_dict, for i in range(get_h_num)
    (`--train_delta_block`), or
  * key "t" (str timestep) → Δh tensor [512, 8, 8] (`--train_delta_h`;
    key "0" when `--ignore_timesteps`), and
  * optional "optimizer" / "scheduler" states.

Naming convention: `checkpoint/{exp}_LC_{category}_t{t0}_ninv{ninv}_ngen{ngen}_{iter}.pth`
(main.py:235, diffusion_latent.py:232-234) — see `checkpoint_name`.
"""
from __future__ import annotations

import os
import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from asyrp_official_tpu.compat.torch_convert import convert_delta_block

__all__ = [
    "checkpoint_name",
    "load_delta_checkpoint",
    "save_delta_checkpoint",
    "blocks_to_torch_sd",
    "save_delta_npz",
    "load_delta_npz",
]


def checkpoint_name(
    exp: str, category: str, t_0: int, n_inv: int, n_gen: int, it: int,
    extra: Optional[int] = None,
) -> str:
    base = f"{exp}_LC_{category}_t{t_0}_ninv{n_inv}_ngen{n_gen}_{it}"
    if extra is not None:
        base += f"_{extra}"
    return base + ".pth"


def load_delta_checkpoint(path: str) -> Dict[str, Any]:
    """Returns {"blocks": [block_params...]} (train_delta_block ckpts) or
    {"delta_rows": {t: [h, w, C] numpy (NHWC)}} (train_delta_h ckpts),
    plus raw "optimizer"/"scheduler" states when present."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    out: Dict[str, Any] = {}
    blocks: Dict[int, Any] = {}
    rows: Dict[int, np.ndarray] = {}
    for k, v in raw.items():
        if k in ("optimizer", "scheduler"):
            out[k] = v
            continue
        try:
            ki = int(k)
        except (TypeError, ValueError):
            continue
        if v is None:
            # --ignore_timesteps train_delta_h ckpts keep None holes for
            # every non-zero timestep (the reference saves the whole
            # delta_h_dict incl. its None inits, diffusion_latent.py:
            # 172-174,188-189,398-400)
            continue
        if isinstance(v, dict):  # DeltaBlock state_dict
            sd = {kk: vv.detach().cpu().numpy() for kk, vv in v.items()}
            blocks[ki] = convert_delta_block(sd)
        else:  # Δh tensor [C, h, w] → NHWC [h, w, C]
            arr = v.detach().cpu().numpy().astype(np.float32)
            rows[ki] = np.transpose(arr, (1, 2, 0))
    if blocks:
        out["blocks"] = [blocks[i] for i in sorted(blocks)]
    if rows:
        out["delta_rows"] = rows
    return out


def _inv_mat(p):
    """[I, O] channel matrix → torch 1x1 conv [O, I, 1, 1]."""
    return {"weight": np.asarray(p["w"]).T[:, :, None, None], "bias": np.asarray(p["b"])}


def _inv_lin(p):
    return {"weight": np.asarray(p["w"]).T, "bias": np.asarray(p["b"])}


def _inv_norm(p):
    return {"weight": np.asarray(p["scale"]), "bias": np.asarray(p["bias"])}


def blocks_to_torch_sd(block, flavor: str) -> Dict[str, np.ndarray]:
    """Our DeltaBlock params → torch state_dict (numpy values), matching
    the reference key layouts so ours load into the reference and vice
    versa."""
    out: Dict[str, np.ndarray] = {}
    if flavor == "ddpm":
        groups = {
            "conv1": _inv_mat(block["conv1"]),
            "temb_proj": _inv_lin(block["temb_proj"]),
            "norm2": _inv_norm(block["norm2"]),
            "conv2": _inv_mat(block["conv2"]),
        }
    elif flavor == "openai":
        # the reference DeltaBlock uses conv_nd(dims=2, ..., 1) → Conv2d with
        # [O, I, 1, 1] kernels (verified against the released dog_* ckpts)
        groups = {
            "in_layers.0": _inv_norm(block["in_norm"]),
            "in_layers.2": _inv_mat(block["in_conv"]),
            "emb_layers.1": _inv_lin(block["emb"]),
            "out_layers.0": _inv_norm(block["out_norm"]),
            "out_layers.3": _inv_mat(block["out_conv"]),
        }
    else:
        raise ValueError(f"unknown flavor {flavor}")
    for g, kv in groups.items():
        for k, v in kv.items():
            out[f"{g}.{k}"] = v
    return out


def save_delta_checkpoint(
    path: str,
    *,
    blocks: Optional[Sequence[Any]] = None,
    flavor: str = "ddpm",
    delta_rows: Optional[Dict[int, np.ndarray]] = None,
    optimizer: Any = None,
    scheduler: Any = None,
) -> None:
    """Write a reference-compatible `.pth` (torch serialization).
    delta_rows values are NHWC [h, w, C] → stored NCHW [C, h, w]."""
    import torch

    dicts: Dict[str, Any] = {}
    if blocks is not None:
        for i, b in enumerate(blocks):
            sd = blocks_to_torch_sd(b, flavor)
            dicts[f"{i}"] = {
                k: torch.from_numpy(np.array(v, copy=True)) for k, v in sd.items()
            }
    if delta_rows is not None:
        for t, row in delta_rows.items():
            dicts[f"{t}"] = torch.from_numpy(
                np.ascontiguousarray(np.transpose(np.asarray(row), (2, 0, 1)))
            )
    if optimizer is not None:
        dicts["optimizer"] = optimizer
    if scheduler is not None:
        dicts["scheduler"] = scheduler
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    torch.save(dicts, path)


# ---------------------------------------------------------------------------
# native npz format (torch-free fast path)
# ---------------------------------------------------------------------------


def _flatten(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, f"{prefix}{k}/")
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _flatten(v, f"{prefix}{i}/")
    else:
        yield prefix[:-1], np.asarray(tree)


def save_delta_npz(path: str, *, blocks=None, delta_rows=None) -> None:
    arrays = {}
    if blocks is not None:
        for i, b in enumerate(blocks):
            for k, v in _flatten(b):
                arrays[f"block{i}/{k}"] = v
    if delta_rows is not None:
        for t, row in delta_rows.items():
            arrays[f"row/{t}"] = np.asarray(row)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **arrays)


def _unflatten(flat: Dict[str, np.ndarray]):
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def load_delta_npz(path: str) -> Dict[str, Any]:
    data = dict(np.load(path))
    out: Dict[str, Any] = {}
    block_flat: Dict[str, np.ndarray] = {}
    rows: Dict[int, np.ndarray] = {}
    for k, v in data.items():
        if k.startswith("row/"):
            rows[int(k[4:])] = v
        else:
            block_flat[k] = v
    if block_flat:
        tree = _unflatten(block_flat)
        out["blocks"] = [tree[f"block{i}"] for i in range(len(tree))]
    if rows:
        out["delta_rows"] = rows
    return out
