"""Output-fidelity gate: LPIPS between this framework's outputs and the
PyTorch reference's, image by image — the BASELINE.json acceptance metric
(LPIPS ≤ 0.01). Weights-gated like everything CLIP/LPIPS: supply converted
LPIPS params; the harness itself is weight-agnostic.

Usage:
    lp = lpips_jax.params_from_torch(alex_sd, lin_sd)
    report = compare_output_dirs("runs/ours/test_images", "ref_outputs", lp)
    assert report["mean"] <= 0.01
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import jax.numpy as jnp
import numpy as np
from PIL import Image

from asyrp_official_tpu.losses import lpips_jax

__all__ = ["compare_images", "compare_output_dirs"]


def _load_pm1(path: str, size: Optional[int] = None) -> np.ndarray:
    img = Image.open(path).convert("RGB")
    if size is not None:
        img = img.resize((size, size), Image.BILINEAR)
    return np.asarray(img, np.float32) / 127.5 - 1.0


def compare_images(
    lpips_params, ours: Sequence[str], theirs: Sequence[str],
    *, batch_size: int = 8, size: Optional[int] = None,
) -> Dict[str, float]:
    """Pairwise LPIPS over two equal-length image lists."""
    assert len(ours) == len(theirs), (len(ours), len(theirs))
    dists = []
    for ofs in range(0, len(ours), batch_size):
        a = np.stack([_load_pm1(p, size) for p in ours[ofs : ofs + batch_size]])
        b = np.stack([_load_pm1(p, size) for p in theirs[ofs : ofs + batch_size]])
        d = lpips_jax.lpips(lpips_params, jnp.asarray(a), jnp.asarray(b))
        dists.extend(np.asarray(d).tolist())
    arr = np.asarray(dists)
    return {
        "mean": float(arr.mean()),
        "max": float(arr.max()),
        "n": int(arr.size),
        "per_image": dists,
    }


def compare_output_dirs(
    ours_dir: str, theirs_dir: str, lpips_params,
    *, batch_size: int = 8, size: Optional[int] = None,
) -> Dict[str, float]:
    """Match images by filename intersection of two output directories."""
    a = {f for f in os.listdir(ours_dir) if f.lower().endswith((".png", ".jpg"))}
    b = {f for f in os.listdir(theirs_dir) if f.lower().endswith((".png", ".jpg"))}
    common = sorted(a & b)
    if not common:
        raise ValueError(
            f"no matching filenames between {ours_dir} ({len(a)} imgs) and "
            f"{theirs_dir} ({len(b)} imgs)"
        )
    return compare_images(
        lpips_params,
        [os.path.join(ours_dir, f) for f in common],
        [os.path.join(theirs_dir, f) for f in common],
        batch_size=batch_size, size=size,
    )
