"""Fused spatial self-attention Pallas kernel.

The UNets attend over flattened spatial maps of 256–1024 tokens
(attn@16 → 256 tokens for most configs; ImageNet adds 32x32=1024 — SURVEY.md
§5). At these sizes an entire (tokens × channels) tile fits comfortably in
VMEM, so the whole attention — logits, softmax, value mix — runs as ONE
kernel with a single HBM round-trip, instead of XLA materializing the
[B, H, T, T] logits tensor between fusions.

Layout: q, k, v are [B, T, C] with head-major channel layout (C = heads·ch,
matching models/common.spatial_attention). Grid is (B,); heads unroll as a
static Python loop inside the kernel.

`fused_attention` auto-dispatches: Pallas on TPU when the tile fits VMEM,
reference XLA path otherwise (and always under `interpret=True` on CPU for
tests).
"""
from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from asyrp_official_tpu.models.common import spatial_attention as xla_attention

__all__ = ["fused_attention", "attention_kernel_applicable"]

_VMEM_BUDGET = 10 * 1024 * 1024  # leave headroom of the ~16MB/core


def attention_kernel_applicable(b: int, t: int, c: int, dtype_bytes: int = 4) -> bool:
    # q, k, v, out tiles + one [T, T] logits buffer per head iteration
    need = 4 * t * c * dtype_bytes + t * t * 4
    return need <= _VMEM_BUDGET and t % 8 == 0


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, num_heads: int, legacy_scale: bool):
    _, t, c = q_ref.shape  # block is (1, T, C)
    ch = c // num_heads
    for h in range(num_heads):
        sl = slice(h * ch, (h + 1) * ch)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        if legacy_scale:
            s = 1.0 / math.sqrt(math.sqrt(ch))
            logits = jax.lax.dot_general(
                (q * s).astype(jnp.float32),
                (k * s).astype(jnp.float32),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            logits = jax.lax.dot_general(
                q.astype(jnp.float32),
                k.astype(jnp.float32),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * (ch ** -0.5)
        w = jax.nn.softmax(logits, axis=-1)
        out = jax.lax.dot_general(
            w, v.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, sl] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "legacy_scale", "interpret")
)
def _pallas_attention(q, k, v, *, num_heads: int, legacy_scale: bool, interpret: bool):
    b, t, c = q.shape
    kernel = functools.partial(
        _attn_kernel, num_heads=num_heads, legacy_scale=legacy_scale
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, t, c), q.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ]
        * 3,
        out_specs=pl.BlockSpec(
            (1, t, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(q, k, v)


# Differentiable wrapper: Pallas forward, XLA-vjp backward. The training
# path differentiates through the whole UNet (Δ grads flow through the
# decoder), and a bare pallas_call has no VJP — so the backward pass
# recomputes via the mathematically identical XLA implementation.
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _pallas_attention_diff(q, k, v, num_heads, legacy_scale, interpret):
    return _pallas_attention(
        q, k, v, num_heads=num_heads, legacy_scale=legacy_scale,
        interpret=interpret,
    )


def _pad_fwd(q, k, v, num_heads, legacy_scale, interpret):
    out = _pallas_attention_diff(q, k, v, num_heads, legacy_scale, interpret)
    return out, (q, k, v)


def _pad_bwd(num_heads, legacy_scale, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: xla_attention(
            q_, k_, v_, num_heads=num_heads, legacy_scale=legacy_scale
        ),
        q, k, v,
    )
    return vjp(g)


_pallas_attention_diff.defvjp(_pad_fwd, _pad_bwd)


def fused_attention(
    q, k, v, *, num_heads: int = 1, legacy_scale: bool = False,
    force: Optional[str] = None,
):
    """Drop-in replacement for models.common.spatial_attention.
    force: None (auto) | 'pallas' | 'xla' | 'interpret'."""
    mode = force or os.environ.get("ASYRP_TPU_ATTN", "auto")
    b, t, c = q.shape
    if mode == "xla":
        return xla_attention(q, k, v, num_heads=num_heads, legacy_scale=legacy_scale)
    applicable = attention_kernel_applicable(b, t, c, dtype_bytes=q.dtype.itemsize)
    if force in ("pallas", "interpret") and not applicable:
        # an EXPLICIT kernel request must not silently become XLA — that
        # would make pallas-vs-xla validation runs compare XLA to itself.
        # (env-var forcing is advisory: models mix applicable and
        # non-applicable layer shapes)
        raise ValueError(
            f"attention kernel explicitly forced but not applicable for "
            f"({b}, {t}, {c}) {q.dtype} (VMEM/alignment constraints)"
        )
    if mode == "interpret" and applicable:
        return _pallas_attention_diff(q, k, v, num_heads, legacy_scale, True)
    on_tpu = jax.default_backend() == "tpu"
    if (mode == "pallas" or on_tpu) and applicable:
        return _pallas_attention_diff(
            q, k, v, num_heads, legacy_scale, not on_tpu
        )
    return xla_attention(q, k, v, num_heads=num_heads, legacy_scale=legacy_scale)
