"""Bundled data assets (extracted from the reference's data tables into
compact JSON/npz form — data, not code):

  * src_trg_prompts.json — the 106 predefined attribute → (src texts, trg
    texts) pairs (reference utils/text_dic.py SRC_TRG_TXT_DIC);
  * clip_templates.json — CLIP prompt-augmentation template lists
    (reference utils/text_templates.py, originally from OpenAI CLIP);
  * t_edit_presets.json — known-good t_edit values per dataset at LPIPS
    thresholds 0.3 / 0.2 (reference utils/t_edit_dic.py);
  * calibration_tables.npz — all 27 per-timestep LPIPS mean/std and SNR
    tables (reference utils/*.tsv; LPIPS tables are [N, 2] (t, value),
    SNR tables are [1000] indexed by t).
"""
from __future__ import annotations

import functools
import json
import os
from typing import Dict, List, Tuple

import numpy as np

_ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets")


@functools.lru_cache()
def src_trg_prompts() -> Dict[str, Tuple[List[str], List[str]]]:
    with open(os.path.join(_ASSETS, "src_trg_prompts.json")) as f:
        return {k: (v[0], v[1]) for k, v in json.load(f).items()}


@functools.lru_cache()
def clip_templates() -> Dict[str, List[str]]:
    with open(os.path.join(_ASSETS, "clip_templates.json")) as f:
        return json.load(f)


@functools.lru_cache()
def t_edit_presets() -> Dict[str, Dict[str, int]]:
    with open(os.path.join(_ASSETS, "t_edit_presets.json")) as f:
        return json.load(f)


@functools.lru_cache()
def _calibration() -> Dict[str, np.ndarray]:
    return dict(np.load(os.path.join(_ASSETS, "calibration_tables.npz")))


def lpips_curve(dataset: str, kind: str = "x0_t") -> Dict[int, float]:
    """Per-timestep LPIPS curve as {t: value} — the consumption format of
    `set_t_edit_t_addnoise` (diffusion_latent.py:1355-1360).
    kind: 'x0_t' | 'x' | 'x0_t_std' | 'x_std'."""
    name = f"{dataset}_LPIPS_distance_{kind}"
    tab = _calibration().get(name)
    if tab is None:
        raise KeyError(
            f"no calibration table {name}; available: "
            f"{sorted(k for k in _calibration() if 'LPIPS' in k)}"
        )
    return {int(t): float(v) for t, v in tab}


def snr_curve(dataset: str) -> np.ndarray:
    tab = _calibration().get(f"{dataset}_SNR")
    if tab is None:
        raise KeyError(f"no SNR table for {dataset}")
    return tab


def compute_snr_table(alphas_cumprod: np.ndarray) -> np.ndarray:
    """Analytic per-timestep SNR: ᾱ_t / (1 − ᾱ_t) — reproduces the shipped
    `*_SNR.tsv` tables (e.g. celeba t=0: 9999.0)."""
    acp = np.asarray(alphas_cumprod, np.float64)
    return acp / (1.0 - acp)


def write_snr_tsv(out_dir: str, dataset: str, snr: np.ndarray) -> None:
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, f"{dataset}_SNR.tsv"), "w") as f:
        for v in snr:
            f.write(f"{v}\n")


def write_lpips_tsv(
    out_dir: str, dataset: str, curves: Dict[str, Dict[int, float]]
) -> None:
    """Write curves in the reference's tsv format (the `--lpips` stage
    output, diffusion_latent.py:1296-1303) so both frameworks can consume
    each other's calibration runs."""
    os.makedirs(out_dir, exist_ok=True)
    for kind, curve in curves.items():
        path = os.path.join(out_dir, f"{dataset}_LPIPS_distance_{kind}.tsv")
        with open(path, "w") as f:
            for t in curve:
                f.write(f"{t}\t{curve[t]}\n")


def load_lpips_tsv(path: str) -> Dict[int, float]:
    out = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                t, v = line.split("\t")
                out[int(t)] = float(v)
    return out
