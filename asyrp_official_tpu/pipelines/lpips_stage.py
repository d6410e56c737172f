"""LPIPS-distance calibration stage (`--lpips`,
`compute_lpips_distance`, diffusion_latent.py:1190-1303).

Per train image: run the (typically 1000-step) DDIM inversion and record
LPIPS(x_t, x0) and LPIPS(x0_t, x0) at every step; aggregate mean/std per
timestep; write the four tsv tables the interval-selection stage consumes.

TPU-first: the LPIPS network runs INSIDE the inversion scan, so only two
scalars per (step, image) ever leave the device — the reference hauls every
intermediate image through a separate LPIPS forward (:1260-1263).
"""
from __future__ import annotations

import logging
import os
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger(__name__)

from asyrp_official_tpu.core.ddim import ddim_step
from asyrp_official_tpu.core.sampler import ScanArrays
from asyrp_official_tpu.core.schedule import Schedule, uniform_seq
from asyrp_official_tpu.core.steptable import inversion_table
from asyrp_official_tpu.losses import lpips_jax
from asyrp_official_tpu.models.registry import ModelSpec
from asyrp_official_tpu.utils.assets import write_lpips_tsv

__all__ = ["make_lpips_chain", "compute_lpips_distance"]


def make_lpips_chain(
    spec: ModelSpec,
    schedule: Schedule,
    seq,
    lpips_params,
    *,
    compute_dtype=jnp.float32,
):
    """Returns jitted fn(params, x0) -> (lpips_x [S, B], lpips_x0t [S, B])."""
    table = inversion_table(seq)
    arrays = ScanArrays.from_table(table)
    acp_ext = jnp.asarray(schedule.alphas_cumprod_ext)

    @jax.jit
    def run(params, x0):
        bsz = x0.shape[0]

        def body(x, per_step):
            t_i, t_next_i, _, _, _, _ = per_step
            t_b = jnp.full((bsz,), t_i, jnp.float32)
            eps_raw, *_ = spec.apply(params, x.astype(compute_dtype), t_b)
            if spec.learn_sigma:
                eps_raw = eps_raw[..., : eps_raw.shape[-1] // 2]
            eps = eps_raw.astype(jnp.float32)
            at = jnp.full((bsz,), acp_ext[t_i + 1])
            at_next = jnp.full((bsz,), acp_ext[t_next_i + 1])
            x_next, x0_t = ddim_step(x, eps, eps, at, at_next, 0.0, jnp.zeros_like(x))
            d_x = lpips_jax.lpips(lpips_params, x_next, x0)
            d_x0t = lpips_jax.lpips(lpips_params, x0_t, x0)
            return x_next, (d_x, d_x0t)

        _, (d_x, d_x0t) = jax.lax.scan(body, x0, arrays)
        return d_x, d_x0t

    return run


def compute_lpips_distance(
    spec: ModelSpec,
    params,
    schedule: Schedule,
    dataset,
    lpips_params,
    *,
    n_img: int,
    n_inv_step: int = 1000,
    t_0: int = 999,
    batch_size: int = 4,
    out_dir: Optional[str] = None,
    dataset_name: str = "custom",
    compute_dtype=jnp.float32,
    put=None,
) -> Dict[str, Dict[int, float]]:
    """Returns curves {"x": {t: mean}, "x_std": ..., "x0_t": ...,
    "x0_t_std": ...}; writes reference-format tsvs when `out_dir` given
    (diffusion_latent.py:1296-1303)."""
    seq = uniform_seq(n_inv_step, t_0)
    chain = make_lpips_chain(spec, schedule, seq, lpips_params,
                             compute_dtype=compute_dtype)

    all_x, all_x0t = [], []
    count = 0
    buf = []
    for i in range(min(n_img, len(dataset))):
        item = dataset[i]
        buf.append(item[0] if isinstance(item, tuple) else item)
        if len(buf) == batch_size or i == min(n_img, len(dataset)) - 1:
            chunk = np.stack(buf).astype(np.float32)
            # pad the final partial batch to batch_size: a changed batch
            # axis would retrace + recompile the whole (up to 1000-step)
            # scanned chain — minutes on the relay TPU for zero benefit
            if chunk.shape[0] < batch_size:
                pad = batch_size - chunk.shape[0]
                chunk_in = np.concatenate([chunk, chunk[-1:].repeat(pad, 0)])
            else:
                chunk_in = chunk
            x0 = (
                jax.device_put(jnp.asarray(chunk_in), jax.local_devices()[0])
                if put is None
                else put(chunk_in)
            )
            t0 = time.perf_counter()
            d_x, d_x0t = chain(params, x0)
            # slice off any mesh padding `put` added ([S, B] outputs); the
            # np.asarray host fetch is the honest completion barrier
            all_x.append(np.asarray(d_x)[:, : chunk.shape[0]])
            all_x0t.append(np.asarray(d_x0t)[:, : chunk.shape[0]])
            dt = time.perf_counter() - t0
            log.info(
                "lpips chain batch of %d: %.0f ms (%.0f ms/image%s)",
                chunk.shape[0], dt * 1e3, dt * 1e3 / chunk.shape[0],
                "; incl. compile" if count == 0 else "",
            )
            count += len(buf)
            buf = []

    d_x = np.concatenate(all_x, axis=1)  # [S, N]
    d_x0t = np.concatenate(all_x0t, axis=1)
    # timesteps recorded under the *destination* index j (zip(seq_next[1:],
    # seq[1:]) keyed by j, diffusion_latent.py:1262-1263)
    ts = seq[1:]
    curves = {
        "x": {t: float(m) for t, m in zip(ts, d_x.mean(axis=1))},
        "x_std": {t: float(s) for t, s in zip(ts, d_x.std(axis=1))},
        "x0_t": {t: float(m) for t, m in zip(ts, d_x0t.mean(axis=1))},
        "x0_t_std": {t: float(s) for t, s in zip(ts, d_x0t.std(axis=1))},
    }
    if out_dir:
        write_lpips_tsv(out_dir, dataset_name, curves)
    return curves
