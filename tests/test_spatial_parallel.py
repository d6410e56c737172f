"""Spatial tensor-parallelism: a single image's trajectory sharded over the
8-device virtual mesh must match the unsharded result (XLA inserts the conv
halo exchanges + norm/attention collectives)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asyrp_official_tpu.core.schedule import make_schedule, uniform_seq
from asyrp_official_tpu.models import ddpmpp
from asyrp_official_tpu.models.delta import EditState, delta_block_init
from asyrp_official_tpu.models.registry import ModelSpec
from asyrp_official_tpu.parallel import mesh as pmesh
from asyrp_official_tpu.parallel.spatial import spatial_shard, spatial_spec
from asyrp_official_tpu.pipelines import engine

CFG = ddpmpp.DDPMppConfig(
    ch=32, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(16,), resolution=32
)
SPEC = ModelSpec("ddpmpp", CFG, False, "ddpm")
SCHED = make_schedule()


# the compute path is pure XLA — GSPMD partitions it with no special setup


def test_spatially_sharded_inversion_matches():
    m = pmesh.make_mesh()
    if m.devices.size < 2:
        pytest.skip("needs multiple devices")
    params = SPEC.init(jax.random.PRNGKey(0))
    x0 = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3).astype(np.float32))

    seq = uniform_seq(4, 999)
    invert = engine.make_invert(SPEC, SCHED, seq)
    ref, _ = invert(params, x0)

    params_r = pmesh.replicate(m, params)
    xs = spatial_shard(m, x0)
    sharded, _ = invert(params_r, xs)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_spatially_sharded_edit_matches():
    m = pmesh.make_mesh()
    if m.devices.size < 2:
        pytest.skip("needs multiple devices")
    params = SPEC.init(jax.random.PRNGKey(0))
    block = delta_block_init(jax.random.PRNGKey(1), CFG.bottleneck_ch, CFG.temb_ch)
    edit = EditState(blocks=(block,), hs_coeff=jnp.array([1.0, 1.0]))
    x_lat = jnp.asarray(np.random.RandomState(1).randn(1, 32, 32, 3).astype(np.float32))

    seq = uniform_seq(4, 999)
    run = engine.make_edit_generate(SPEC, SCHED, seq, t_edit=500)
    ref, _ = run(params, edit, x_lat, jax.random.PRNGKey(0))

    params_r = pmesh.replicate(m, params)
    edit_r = pmesh.replicate(m, edit)
    out, _ = run(params_r, edit_r, spatial_shard(m, x_lat), jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_spatial_shard_guard():
    m = pmesh.make_mesh()
    # ValueError (not assert): must stay loud under python -O
    with pytest.raises(ValueError, match="not divisible"):
        spatial_shard(m, jnp.zeros((1, 30, 32, 3)))  # 30 % 8 != 0


def test_2d_mesh_compiles_to_collectives():
    """The 2D (data, spatial) program must also contain real inter-chip
    communication, and its output must stay sharded over BOTH axes."""
    from asyrp_official_tpu.parallel.spatial import batch_spatial_shard

    m = pmesh.make_mesh(4, spatial=2)
    params = pmesh.replicate(m, SPEC.init(jax.random.PRNGKey(0)))
    x0 = batch_spatial_shard(
        m, jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3), jnp.float32)
    )
    seq = uniform_seq(4, 999)
    invert = engine.make_invert(SPEC, SCHED, seq)
    hlo = invert.lower(params, x0).compile().as_text()
    found = [
        op for op in
        ("collective-permute", "all-reduce", "all-gather", "reduce-scatter")
        if op in hlo
    ]
    assert found, "no collectives in the 2D-sharded program"
    out, _ = invert(params, x0)
    assert not out.sharding.is_fully_replicated
    # height stays split over 'spatial' and batch over 'data'
    spec = out.sharding.spec
    assert tuple(spec)[:2] == ("data", "spatial"), spec


def test_spatial_tp_compiles_to_collectives():
    """The compiled spatially-sharded program must contain real inter-chip
    communication (conv halo exchanges / norm reductions): collective ops in
    the optimized HLO — proof the sharding is engineered parallelism, not a
    silently-replicated fallback."""
    m = pmesh.make_mesh()
    if m.devices.size < 2:
        pytest.skip("needs multiple devices")
    params = pmesh.replicate(m, SPEC.init(jax.random.PRNGKey(0)))
    x0 = spatial_shard(
        m, jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3), jnp.float32)
    )
    seq = uniform_seq(4, 999)
    invert = engine.make_invert(SPEC, SCHED, seq)
    compiled = invert.lower(params, x0).compile()
    hlo = compiled.as_text()
    found = [
        op for op in
        ("collective-permute", "all-reduce", "all-gather", "reduce-scatter")
        if op in hlo
    ]
    assert found, "no collectives in the spatially-sharded program"
    # and the output really is sharded over the height axis
    out, _ = invert(params, x0)
    assert not out.sharding.is_fully_replicated


def test_spatially_sharded_bf16_chain_finite_and_close():
    """bf16 + spatial TP is the real multi-chip serving configuration
    (--dp --tp_spatial --bf16): the sharded bf16 chain must stay finite
    and track the unsharded bf16 chain within chaotic-amplification
    bounds on a SHORT (2-step) chain, where bf16 reduce-order noise has
    not yet amplified."""
    m = pmesh.make_mesh()
    if m.devices.size < 2:
        pytest.skip("needs multiple devices")
    params = SPEC.init(jax.random.PRNGKey(0))
    x0 = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3), jnp.float32)

    seq = [100, 300, 500]  # 2 inversion steps
    invert = engine.make_invert(SPEC, SCHED, seq, compute_dtype=jnp.bfloat16)
    ref, _ = invert(params, x0)
    assert bool(jnp.isfinite(ref).all())

    params_r = pmesh.replicate(m, params)
    sharded, _ = invert(params_r, spatial_shard(m, x0))
    assert bool(jnp.isfinite(sharded).all())
    scale = float(jnp.abs(ref).max())
    rel = float(jnp.abs(np.asarray(sharded) - np.asarray(ref)).max()) / scale
    assert rel < 0.05, rel  # bf16 mantissa + reduce-order noise only
