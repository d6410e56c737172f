"""Checkpoint fetchers (reference utils/colab_utils.py:8-36 +
diffusion_latent.py:81-95 URL routing). Zero-egress environments will fail
the fetch — the registry is still the authoritative URL map for users.
"""
from __future__ import annotations

import os
import urllib.request
from typing import Optional

from asyrp_official_tpu.models.registry import PRETRAINED_URLS

__all__ = ["download_pretrained", "GDRIVE_NOTES", "download_url"]

# manual-download sources (no stable direct URL; recorded for users,
# matching the reference's comments diffusion_latent.py:86-98)
GDRIVE_NOTES = {
    "AFHQ/FFHQ/MetFACE": "https://1drv.ms/u/s!AkQjJhxDm0Fyhqp_4gkYjwVRBe8V_w?e=Et3ITH (ILVR/P2 checkpoints)",
    "IMAGENET": "https://openaipublic.blob.core.windows.net/diffusion/jul-2021/256x256_diffusion_uncond.pt",
    "ir_se50": "InsightFace_Pytorch releases (IR-SE50 ArcFace)",
    "shape_predictor": "dlib shape_predictor_68_face_landmarks.dat",
}


def download_url(url: str, dest: str, *, timeout: int = 600) -> str:
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    # per-process temp name: two concurrent fetchers of the same artifact
    # must not append to one file (whichever os.replace()s last wins with a
    # complete copy); cleaned up on failure instead of left behind
    tmp = f"{dest}.part.{os.getpid()}"
    try:
        with urllib.request.urlopen(url, timeout=timeout) as r, open(tmp, "wb") as f:
            while True:
                chunk = r.read(1 << 20)
                if not chunk:
                    break
                f.write(chunk)
        os.replace(tmp, dest)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return dest


def download_pretrained(dataset_key: str, dest_dir: str = "pretrained") -> Optional[str]:
    """Fetch the SDEdit base-diffusion checkpoint for a DDPM++ dataset key
    (CelebA_HQ / CUSTOM / LSUN_bedroom / LSUN_church_outdoor)."""
    url = PRETRAINED_URLS.get(dataset_key)
    if url is None:
        raise KeyError(
            f"no auto-download URL for {dataset_key!r}; see GDRIVE_NOTES for "
            "manual sources"
        )
    dest = os.path.join(dest_dir, os.path.basename(url))
    if os.path.exists(dest):
        return dest
    return download_url(url, dest)
