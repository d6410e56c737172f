"""Interval selection: t_edit / t_addnoise from LPIPS curves scaled by the
CLIP text cosine (`set_t_edit_t_addnoise`, diffusion_latent.py:1307-1412).

Decision procedure (faithful):
  * cosine = CLIP text cosine of src/trg prompts (:1319-1329);
  * LPIPS_th = lpips_edit_th · cosine (:1334, default 0.33 → main.py);
  * t_edit = first t (ascending) with LPIPS(x0_t, x0)[t] ≥ LPIPS_th
    (:1373-1376) from the x0_t curve;
  * t_addnoise = first t with curve[t] ≥ lpips_addnoise_th (:1402-1405) —
    from the x0_t curve by default, or the x curve when
    `add_noise_from_xt` (:1386-1399);
  * user overrides short-circuit each (:1342-1351, :1368-1370, :1382-1384).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

from asyrp_official_tpu.utils.assets import lpips_curve

__all__ = ["select_interval"]


def _first_at_threshold(curve: Dict[int, float], th: float) -> int:
    for t in sorted(curve):
        if curve[t] >= th:
            return t
    raise ValueError(f"no timestep reaches LPIPS threshold {th}")


def select_interval(
    dataset: str,
    cosine: float,
    *,
    lpips_edit_th: float = 0.33,
    lpips_addnoise_th: float = 0.1,
    add_noise_from_xt: bool = False,
    user_defined_t_edit: Optional[int] = None,
    user_defined_t_addnoise: Optional[int] = None,
    curve_x0_t: Optional[Dict[int, float]] = None,
    curve_x: Optional[Dict[int, float]] = None,
) -> Tuple[int, int]:
    """Returns (t_edit, t_addnoise). `dataset` names the bundled calibration
    curve (celeba/church/bedroom/afhq/metface/vilab); pass explicit curves
    (e.g. from a fresh `--lpips` run) to override."""
    if user_defined_t_edit is not None and user_defined_t_addnoise is not None:
        return user_defined_t_edit, user_defined_t_addnoise

    if curve_x0_t is None:
        curve_x0_t = lpips_curve(dataset, "x0_t")

    if user_defined_t_edit is not None:
        t_edit = user_defined_t_edit
    else:
        t_edit = _first_at_threshold(curve_x0_t, lpips_edit_th * cosine)

    if user_defined_t_addnoise is not None:
        t_addnoise = user_defined_t_addnoise
    else:
        curve = curve_x0_t
        if add_noise_from_xt:
            curve = curve_x if curve_x is not None else lpips_curve(dataset, "x")
        t_addnoise = _first_at_threshold(curve, lpips_addnoise_th)

    return t_edit, t_addnoise
