"""Pallas kernels (interpret mode on CPU) vs the XLA reference paths."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asyrp_official_tpu.models import common as cm
from asyrp_official_tpu.ops.attention import attention_kernel_applicable, fused_attention
from asyrp_official_tpu.ops.groupnorm import fused_groupnorm_silu, gn_kernel_applicable


@pytest.mark.parametrize("heads,legacy", [(1, False), (4, True), (8, True)])
def test_fused_attention_matches_xla(heads, legacy):
    rng = np.random.RandomState(0)
    b, t, c = 2, 256, 512
    q = jnp.asarray(rng.randn(b, t, c).astype(np.float32) * 0.1)
    k = jnp.asarray(rng.randn(b, t, c).astype(np.float32) * 0.1)
    v = jnp.asarray(rng.randn(b, t, c).astype(np.float32) * 0.1)
    ref = cm.spatial_attention(q, k, v, num_heads=heads, legacy_scale=legacy)
    got = fused_attention(
        q, k, v, num_heads=heads, legacy_scale=legacy, force="interpret"
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_fused_attention_applicability():
    assert attention_kernel_applicable(1, 256, 512)
    # 1024 tokens fit in bf16 but not f32 (per-head logits are 4MB alone)
    assert attention_kernel_applicable(1, 1024, 512, dtype_bytes=2)
    assert not attention_kernel_applicable(1, 1024, 512, dtype_bytes=4)
    assert not attention_kernel_applicable(1, 250, 512)  # not multiple of 8


def test_fused_groupnorm_silu_matches_xla():
    rng = np.random.RandomState(1)
    b, h, w, c = 2, 16, 16, 256
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    p = {
        "scale": jnp.asarray(rng.randn(c).astype(np.float32)),
        "bias": jnp.asarray(rng.randn(c).astype(np.float32)),
    }
    ref = cm.swish(cm.group_norm(p, x, eps=1e-6))
    got = fused_groupnorm_silu(p, x, eps=1e-6, force="interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_fused_groupnorm_no_silu():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 8, 128).astype(np.float32))
    p = {"scale": jnp.ones(128), "bias": jnp.zeros(128)}
    ref = cm.group_norm(p, x, eps=1e-5)
    got = fused_groupnorm_silu(p, x, eps=1e-5, with_silu=False, force="interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_gn_applicability_rules():
    assert gn_kernel_applicable(16, 16, 512)
    assert gn_kernel_applicable(64, 64, 256, dtype_bytes=2)  # bf16 fits
    assert not gn_kernel_applicable(256, 256, 128)  # too big for VMEM
    assert not gn_kernel_applicable(16, 16, 96)  # lane misaligned


def test_xla_fallback_path():
    # shapes that fail applicability must transparently use XLA
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 10, 10, 96).astype(np.float32))
    p = {"scale": jnp.ones(96), "bias": jnp.zeros(96)}
    got = fused_groupnorm_silu(p, x, groups=32, eps=1e-6)
    ref = cm.swish(cm.group_norm(p, x, groups=32, eps=1e-6))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)
