"""ctypes binding for the native C++ image batch loader
(asyrp_official_tpu/native/imgloader.cpp).

Builds the shared library on first use (g++ + libjpeg/libpng); transparently
falls back to the PIL path when the toolchain or libraries are unavailable.

    ds = NativeImageFolderDataset("images/", image_size=256)
    batch = ds.load_batch(range(64))      # [64, 256, 256, 3] f32 in [-1,1]
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

log = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libasyrpimg.so")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_BUILD_FAILED = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "imgloader.cpp")
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", src,
        "-ljpeg", "-lpng", "-pthread", "-o", _SO_PATH,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired,
            FileNotFoundError) as e:
        detail = getattr(e, "stderr", b"")
        log.warning("native imgloader build failed (%s); using PIL fallback. %s",
                    e, detail[:500] if detail else "")
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native loader, or None if unavailable."""
    global _LIB, _BUILD_FAILED
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if _BUILD_FAILED:
            return None
        src = os.path.join(_NATIVE_DIR, "imgloader.cpp")
        stale = os.path.exists(_SO_PATH) and os.path.exists(src) and (
            os.path.getmtime(src) > os.path.getmtime(_SO_PATH)
        )
        if (not os.path.exists(_SO_PATH) or stale) and not _build():
            # a stale prebuilt .so would bind the current argtypes to an
            # old ABI (this repo already changed the signature once)
            _BUILD_FAILED = True
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError as e:
            log.warning("native imgloader load failed: %s", e)
            _BUILD_FAILED = True
            return None
        lib.asyrp_decode_resize_batch.restype = ctypes.c_int
        lib.asyrp_decode_resize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _LIB = lib
        return lib


def _pil_decode_one(path: str, image_size: int) -> np.ndarray:
    from PIL import Image

    img = Image.open(path).convert("RGB").resize(
        (image_size, image_size), Image.BILINEAR
    )
    return np.asarray(img, np.float32) / 127.5 - 1.0


def decode_resize_batch(
    paths: Sequence[str], image_size: int, n_threads: int = 0
) -> np.ndarray:
    """Decode+resize a list of JPEG/PNG files into one [N, S, S, 3] float32
    batch in [-1, 1] using the native loader; PIL handles only the files the
    native path can't decode (the rest of the batch keeps its native result)."""
    n = len(paths)
    lib = get_lib()
    out = np.empty((n, image_size, image_size, 3), np.float32)
    if lib is not None:
        nt = n_threads or min(os.cpu_count() or 4, 16)
        encoded = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * n)(*encoded)
        status = np.zeros((n,), np.uint8)
        n_failed = lib.asyrp_decode_resize_batch(
            arr, n, image_size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nt,
            status.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if n_failed:
            # repair exactly the failed files with PIL (native results for
            # the rest of the batch are kept)
            for i in np.nonzero(status)[0]:
                log.warning("native decode failed on %s; PIL for that file", paths[i])
                out[i] = _pil_decode_one(paths[i], image_size)
        return out
    for i, p in enumerate(paths):
        out[i] = _pil_decode_one(p, image_size)
    return out


class NativeImageFolderDataset:
    """Drop-in for data.datasets.ImageFolderDataset with native batch IO.
    Listing / split semantics are DELEGATED to ImageFolderDataset so the two
    can never diverge."""

    def __init__(self, img_dir: str, image_size: int = 256,
                 test_nums: Optional[int] = None, train: bool = True):
        from asyrp_official_tpu.data.datasets import ImageFolderDataset

        base = ImageFolderDataset(img_dir, image_size, test_nums, train)
        self.paths = [os.path.join(img_dir, f) for f in base.files]
        self.image_size = image_size

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx) -> np.ndarray:
        return self.load_batch([idx])[0]

    def load_batch(self, indices: Sequence[int]) -> np.ndarray:
        return decode_resize_batch(
            [self.paths[i] for i in indices], self.image_size
        )
