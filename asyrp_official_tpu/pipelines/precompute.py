"""Latent precompute stage — `precompute_pairs` / `random_noise_pairs`
(diffusion_latent.py:951-1188) redesigned for TPU batching.

The reference inverts ONE image at a time (forced bs=1 with an apology
comment, :1010, :259-260); here inversion runs in device-sized batches
through one jitted scan. The cache keeps the reference naming convention
(`{category}_{mode}_t{t0}_nim{N}_ninv{ninv}_pairs`, :973-978) with a native
`.npz` payload, can READ the reference's `.pth` caches for interop, and
keeps the partial-resume behavior (scan for the largest smaller cached
nim, :993-1001).
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from asyrp_official_tpu.core.schedule import Schedule, uniform_seq
from asyrp_official_tpu.models.registry import ModelSpec
from asyrp_official_tpu.parallel import mesh as pmesh
from asyrp_official_tpu.pipelines import engine

__all__ = ["pairs_cache_path", "load_pairs_cache", "precompute_pairs", "random_noise_pairs"]


def _default_put(x) -> jax.Array:
    """Commit a host batch to the default device: uncommitted arrays take
    a ~50x slower dispatch path through the TPU relay (CLAUDE.md); runner
    callers override with mesh-aware `put` callbacks."""
    return jax.device_put(jnp.asarray(x), jax.local_devices()[0])


def pairs_cache_path(
    cache_dir: str, category: str, mode: str, t_0: int, nim: int, n_inv: int,
    *, random_noise: bool = False, class_name: Optional[str] = None,
) -> str:
    cat = f"{category}_{class_name}" if class_name else category
    mid = "random_noise_" if random_noise else f"t{t_0}_"
    return os.path.join(
        cache_dir, f"{cat}_{mode}_{mid}nim{nim}_ninv{n_inv}_pairs"
    )


def load_pairs_cache(base_path: str) -> Optional[Dict[str, np.ndarray]]:
    """Load `{base}.npz` (native) or `{base}.pth` (reference torch cache:
    a list of [x0, x_rec, x_lat] NCHW tensors) → dict of NHWC arrays."""
    if os.path.exists(base_path + ".npz"):
        d = np.load(base_path + ".npz")
        return {k: d[k] for k in ("x0", "x_rec", "x_lat")}
    if os.path.exists(base_path + ".pth"):
        import torch

        pairs = torch.load(base_path + ".pth", map_location="cpu", weights_only=False)
        x0 = np.concatenate([p[0].numpy() for p in pairs])
        x_rec = np.concatenate([p[1].numpy() for p in pairs])
        x_lat = np.concatenate([p[2].numpy() for p in pairs])
        tr = lambda a: np.transpose(a, (0, 2, 3, 1)).astype(np.float32)
        return {"x0": tr(x0), "x_rec": tr(x_rec), "x_lat": tr(x_lat)}
    return None


def _atomic_savez(path: str, **arrays) -> None:
    """tmp-then-replace: a crash mid-write of a (possibly hours-long)
    precompute must not leave a truncated .npz that poisons every later
    run's cache probe."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    # the tmp name must keep the .npz suffix — np.savez APPENDS it otherwise
    tmp = f"{path}.{os.getpid()}.tmp.npz"
    try:
        np.savez(tmp, **arrays)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def _save_cache(base_path: str, pairs: Dict[str, np.ndarray]) -> None:
    _atomic_savez(base_path + ".npz", **pairs)


def precompute_pairs(
    spec: ModelSpec,
    params,
    schedule: Schedule,
    dataset,
    *,
    n_img: int,
    n_inv_step: int,
    t_0: int = 999,
    mode: str = "train",
    category: str = "CUSTOM",
    cache_dir: str = "precomputed",
    batch_size: int = 8,
    re_precompute: bool = False,
    compute_dtype=jnp.float32,
    class_name: Optional[str] = None,
    save_imgs_dir: Optional[str] = None,
    shuffle_seed: Optional[int] = None,
    put=None,
) -> Dict[str, np.ndarray]:
    """Invert the first `n_img` dataset images and reconstruct them.
    Returns {"x0", "x_rec", "x_lat"} each [n_img, H, W, C].

    `save_imgs_dir` writes `{mode}_{i}_0_orig.png` / `_1_lat_ninv{n}.png` /
    `_1_rec_ninv{n}.png` per image (`--save_precomputed_images`,
    diffusion_latent.py:1026-1076). `shuffle_seed` permutes the dataset
    order (`--shuffle_train_dataloader`). `put` commits a numpy batch to
    device(s) — e.g. mesh batch-sharding; it may PAD the batch axis (outputs
    are sliced back to the real count here)."""
    # clamp by what the dataset can provide BEFORE naming the cache: an
    # over-requested nim would otherwise name a cache whose row-count probe
    # can never pass, re-precomputing on every run
    n_img = min(n_img, len(dataset))
    base = pairs_cache_path(
        cache_dir, category, mode, t_0, n_img, n_inv_step, class_name=class_name
    )
    if not re_precompute:
        cached = load_pairs_cache(base)
        if cached is not None and cached["x0"].shape[0] >= n_img:
            return {k: v[:n_img] for k, v in cached.items()}

    # partial resume: largest smaller cached nim (diffusion_latent.py:993-1001)
    done: Optional[Dict[str, np.ndarray]] = None
    if not re_precompute:
        for nim in reversed(range(1, n_img)):
            smaller = load_pairs_cache(
                pairs_cache_path(
                    cache_dir, category, mode, t_0, nim, n_inv_step,
                    class_name=class_name,
                )
            )
            if smaller is not None:
                done = smaller
                break

    seq = uniform_seq(n_inv_step, t_0)
    invert = engine.make_invert(spec, schedule, seq, compute_dtype=compute_dtype)
    generate = engine.make_generate(spec, schedule, seq, compute_dtype=compute_dtype)

    order = list(range(len(dataset)))
    if shuffle_seed is not None:
        import random as _random

        _random.Random(shuffle_seed).shuffle(order)

    start = 0 if done is None else done["x0"].shape[0]
    xs: List[np.ndarray] = []
    for i in order[start : min(n_img, len(dataset))]:
        item = dataset[i]
        xs.append(item[0] if isinstance(item, tuple) else item)
    out = {k: [done[k]] if done is not None else [] for k in ("x0", "x_rec", "x_lat")}

    for ofs in range(0, len(xs), batch_size):
        chunk = np.stack(xs[ofs : ofs + batch_size]).astype(np.float32)
        n_real = chunk.shape[0]
        # default commit: an explicit device_put — uncommitted arrays
        # dispatch ~50x slower through the TPU relay (CLAUDE.md)
        x0 = _default_put(chunk) if put is None else put(chunk)
        x_lat, _ = invert(params, x0)
        x_rec, _ = generate(params, x_lat, jax.random.PRNGKey(0))
        out["x0"].append(chunk)
        out["x_rec"].append(pmesh.fetch(x_rec)[:n_real])
        out["x_lat"].append(pmesh.fetch(x_lat)[:n_real])

    pairs = {k: np.concatenate(v)[:n_img] if v else np.zeros((0,)) for k, v in out.items()}
    _save_cache(base, pairs)
    if save_imgs_dir:
        from asyrp_official_tpu.data.imageio import save_image

        for i in range(pairs["x0"].shape[0]):
            save_image(pairs["x0"][i], os.path.join(
                save_imgs_dir, f"{mode}_{i}_0_orig.png"), pm1=True)
            save_image(pairs["x_lat"][i], os.path.join(
                save_imgs_dir, f"{mode}_{i}_1_lat_ninv{n_inv_step}.png"), pm1=True)
            save_image(pairs["x_rec"][i], os.path.join(
                save_imgs_dir, f"{mode}_{i}_1_rec_ninv{n_inv_step}.png"), pm1=True)
    return pairs


def precompute_with_h(
    spec: ModelSpec,
    params,
    schedule: Schedule,
    x0: np.ndarray,
    *,
    n_inv_step: int,
    t_0: int = 999,
    cache_key: Optional[str] = None,
    category: str = "CUSTOM",
    cache_dir: str = "precomputed",
    compute_dtype=jnp.float32,
) -> Dict[str, np.ndarray]:
    """`precompute_pairs_with_h` (diffusion_latent.py:877-947): invert one
    image recording the bottleneck h at every timestep (keyed by the pair's
    source t). Cached as `{category}_inv{n}_{key}.npz`."""
    base = None
    if cache_key is not None:
        base = os.path.join(cache_dir, f"{category}_inv{n_inv_step}_{cache_key}")
        if os.path.exists(base + ".npz"):
            d = np.load(base + ".npz")
            return {k: d[k] for k in d.files}

    seq = uniform_seq(n_inv_step, t_0)
    run = engine.make_invert_with_h(spec, schedule, seq, compute_dtype=compute_dtype)
    x_lat, h_traj = run(params, _default_put(x0))
    out = {
        "x0": np.asarray(x0),
        "x_lat": np.asarray(x_lat),
        "h_traj": np.asarray(h_traj),          # [S-1, B, h, w, C]
        "h_times": np.asarray(seq[:-1], np.int32),
    }
    if base is not None:
        _atomic_savez(base + ".npz", **out)
    return out


def random_noise_pairs(
    spec: ModelSpec,
    params,
    schedule: Schedule,
    *,
    n_img: int,
    n_inv_step: int,
    image_size: int = 256,
    channels: int = 3,
    mode: str = "train",
    category: str = "CUSTOM",
    cache_dir: str = "precomputed",
    saved_noise: bool = False,
    batch_size: int = 8,
    seed: int = 0,
    compute_dtype=jnp.float32,
    t_0: int = 999,
    put=None,
) -> Dict[str, np.ndarray]:
    """`--load_random_noise` path (diffusion_latent.py:1087-1188): xT ~
    N(0,I); with `saved_noise` also generate x0 by a full reverse pass and
    cache the triple."""
    rng = np.random.RandomState(seed + (0 if mode == "train" else 1))
    x_lat = rng.randn(n_img, image_size, image_size, channels).astype(np.float32)

    if not saved_noise:
        zeros = np.zeros_like(x_lat)
        return {"x0": zeros, "x_rec": zeros, "x_lat": x_lat}

    base = pairs_cache_path(
        cache_dir, category, mode, t_0, n_img, n_inv_step, random_noise=True
    )
    cached = load_pairs_cache(base)
    if cached is not None and cached["x_lat"].shape[0] >= n_img:
        return {k: v[:n_img] for k, v in cached.items()}

    seq = uniform_seq(n_inv_step, t_0)
    generate = engine.make_generate(spec, schedule, seq, compute_dtype=compute_dtype)
    recs = []
    for ofs in range(0, n_img, batch_size):
        chunk_np = x_lat[ofs : ofs + batch_size]
        chunk = _default_put(chunk_np) if put is None else put(chunk_np)
        x, _ = generate(params, chunk, jax.random.PRNGKey(ofs))
        recs.append(pmesh.fetch(x)[: chunk_np.shape[0]])
    x_rec = np.concatenate(recs)
    pairs = {"x0": x_rec, "x_rec": x_rec, "x_lat": x_lat}
    _save_cache(base, pairs)
    return pairs
