"""FFHQ-style face alignment (reference utils/align_utils.py:33-213).

The geometry — eye/mouth anchored quad, shrink, pad with reflection +
gaussian blend, quad transform to (256, 256) — is implemented here in pure
numpy/PIL/scipy and takes 68-point landmarks as INPUT, so any detector can
drive it. `run_alignment(path)` mirrors the reference entry point and is
gated on dlib (not present in this image): it raises with instructions
unless a landmarks array or a custom detector is supplied.
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import PIL.Image
import scipy.ndimage

__all__ = ["align_face_from_landmarks", "run_alignment"]


def align_face_from_landmarks(
    img: PIL.Image.Image,
    lm: np.ndarray,
    *,
    output_size: int = 256,
    transform_size: int = 256,
    enable_padding: bool = True,
) -> PIL.Image.Image:
    """lm: [68, 2] landmark array (dlib 68-point convention)."""
    lm = np.asarray(lm, np.float64)
    lm_eye_left = lm[36:42]
    lm_eye_right = lm[42:48]
    lm_mouth_outer = lm[48:60]

    eye_left = np.mean(lm_eye_left, axis=0)
    eye_right = np.mean(lm_eye_right, axis=0)
    eye_avg = (eye_left + eye_right) * 0.5
    eye_to_eye = eye_right - eye_left
    mouth_avg = (lm_mouth_outer[0] + lm_mouth_outer[6]) * 0.5
    eye_to_mouth = mouth_avg - eye_avg

    # oriented crop rectangle
    x = eye_to_eye - np.flipud(eye_to_mouth) * [-1, 1]
    x /= np.hypot(*x)
    x *= max(np.hypot(*eye_to_eye) * 2.0, np.hypot(*eye_to_mouth) * 1.8)
    y = np.flipud(x) * [-1, 1]
    c = eye_avg + eye_to_mouth * 0.1
    quad = np.stack([c - x - y, c - x + y, c + x + y, c + x - y])
    qsize = np.hypot(*x) * 2

    # shrink
    shrink = int(np.floor(qsize / output_size * 0.5))
    if shrink > 1:
        rsize = (
            int(np.rint(float(img.size[0]) / shrink)),
            int(np.rint(float(img.size[1]) / shrink)),
        )
        img = img.resize(rsize, PIL.Image.LANCZOS)
        quad /= shrink
        qsize /= shrink

    # crop
    border = max(int(np.rint(qsize * 0.1)), 3)
    crop = (
        int(np.floor(min(quad[:, 0]))), int(np.floor(min(quad[:, 1]))),
        int(np.ceil(max(quad[:, 0]))), int(np.ceil(max(quad[:, 1]))),
    )
    crop = (
        max(crop[0] - border, 0), max(crop[1] - border, 0),
        min(crop[2] + border, img.size[0]), min(crop[3] + border, img.size[1]),
    )
    if crop[2] - crop[0] < img.size[0] or crop[3] - crop[1] < img.size[1]:
        img = img.crop(crop)
        quad -= crop[0:2]

    # pad
    pad = (
        int(np.floor(min(quad[:, 0]))), int(np.floor(min(quad[:, 1]))),
        int(np.ceil(max(quad[:, 0]))), int(np.ceil(max(quad[:, 1]))),
    )
    pad = (
        max(-pad[0] + border, 0), max(-pad[1] + border, 0),
        max(pad[2] - img.size[0] + border, 0), max(pad[3] - img.size[1] + border, 0),
    )
    if enable_padding and max(pad) > border - 4:
        pad = np.maximum(pad, int(np.rint(qsize * 0.3)))
        arr = np.pad(
            np.float32(img), ((pad[1], pad[3]), (pad[0], pad[2]), (0, 0)), "reflect"
        )
        h, w, _ = arr.shape
        yy, xx, _ = np.ogrid[:h, :w, :1]
        mask = np.maximum(
            1.0 - np.minimum(np.float32(xx) / pad[0], np.float32(w - 1 - xx) / pad[2]),
            1.0 - np.minimum(np.float32(yy) / pad[1], np.float32(h - 1 - yy) / pad[3]),
        )
        blur = qsize * 0.02
        arr += (scipy.ndimage.gaussian_filter(arr, [blur, blur, 0]) - arr) * np.clip(
            mask * 3.0 + 1.0, 0.0, 1.0
        )
        arr += (np.median(arr, axis=(0, 1)) - arr) * np.clip(mask, 0.0, 1.0)
        img = PIL.Image.fromarray(
            np.uint8(np.clip(np.rint(arr), 0, 255)), "RGB"
        )
        quad += pad[:2]

    # transform
    img = img.transform(
        (transform_size, transform_size), PIL.Image.QUAD,
        (quad + 0.5).flatten(), PIL.Image.BILINEAR,
    )
    if output_size < transform_size:
        img = img.resize((output_size, output_size), PIL.Image.LANCZOS)
    return img


def run_alignment(
    image_path: str,
    *,
    landmarks: Optional[np.ndarray] = None,
    detector: Optional[Callable] = None,
    output_size: int = 256,
) -> PIL.Image.Image:
    """Reference entry point (utils/align_utils.py:33). Supply `landmarks`
    directly, or a `detector(PIL.Image) -> [68, 2]` callable; otherwise dlib
    is attempted (not present in this image)."""
    img = PIL.Image.open(image_path).convert("RGB")
    if landmarks is None:
        if detector is not None:
            landmarks = detector(img)
        else:
            try:
                import dlib  # noqa: F401
            except ImportError as e:
                raise ImportError(
                    "face alignment needs 68-point landmarks: pass "
                    "`landmarks=`, a `detector=` callable, or install dlib "
                    "with the shape_predictor_68_face_landmarks model"
                ) from e
            raise NotImplementedError(
                "dlib detected but automatic detection is not wired; pass "
                "a detector callable"
            )
    return align_face_from_landmarks(img, landmarks, output_size=output_size)
