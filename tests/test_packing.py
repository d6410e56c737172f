"""ParamPacker / PackedSpec: exact round-trip and engine integration."""
import numpy as np

import jax
import jax.numpy as jnp

from asyrp_official_tpu.core.schedule import make_schedule, uniform_seq
from asyrp_official_tpu.models import ddpmpp
from asyrp_official_tpu.models.registry import ModelSpec
from asyrp_official_tpu.parallel.packing import PackedSpec, ParamPacker
from asyrp_official_tpu.pipelines import engine

CFG = ddpmpp.DDPMppConfig(
    ch=32, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(16,), resolution=32
)
SPEC = ModelSpec(family="ddpmpp", config=CFG, learn_sigma=False, delta_flavor="ddpm")


def test_pack_unpack_roundtrip():
    params = SPEC.init(jax.random.PRNGKey(0))
    packer = ParamPacker(params)
    flat = packer.pack(params)
    assert flat.ndim == 1
    back = packer.unpack(flat)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_packed_spec_identical_outputs():
    params = SPEC.init(jax.random.PRNGKey(0))
    packed = PackedSpec(SPEC, params)
    flat = packed.pack(params)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3).astype(np.float32))
    t = jnp.full((1,), 100.0)
    eps_ref, *_ = SPEC.apply(params, x, t)
    eps_packed, *_ = packed.apply(flat, x, t)
    np.testing.assert_allclose(np.asarray(eps_packed), np.asarray(eps_ref), rtol=1e-6)


def test_packed_spec_through_engine():
    params = SPEC.init(jax.random.PRNGKey(0))
    packed = PackedSpec(SPEC, params)
    flat = packed.pack(params)
    sched = make_schedule()
    seq = uniform_seq(4, 999)
    x0 = jnp.asarray(np.random.RandomState(1).randn(2, 32, 32, 3).astype(np.float32))
    ref, _ = engine.make_invert(SPEC, sched, seq)(params, x0)
    got, _ = engine.make_invert(packed, sched, seq)(flat, x0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_packed_spec_pack_numpy_tree():
    """A host (numpy) tree — the converted-torch-weights case — must take
    the single-transfer host path and equal the per-leaf device pack."""
    params = SPEC.init(jax.random.PRNGKey(0))
    np_params = jax.tree.map(np.asarray, params)
    ps = PackedSpec(SPEC, params)
    flat_host = ps.pack(np_params)
    flat_dev = ps.packer.pack(params)
    np.testing.assert_array_equal(np.asarray(flat_host), np.asarray(flat_dev))
    # committed to a concrete device (the relay dispatch requirement)
    assert len(flat_host.devices()) == 1
