"""AOT serving export: the serialized invert+edit program must reproduce
the live engine bit-for-bit and restore without model code (beyond-parity
production-serving surface; pipelines/export.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import asyrp_official_tpu as asyrp
from asyrp_official_tpu.models.delta import EditState, delta_block_init
from asyrp_official_tpu.pipelines import engine
from asyrp_official_tpu.pipelines.export import (
    export_invert_edit,
    load_serving,
    save_serving,
)
from asyrp_official_tpu.runner import spec_from_config
from asyrp_official_tpu.utils.tinyws import TINY_DDPMPP_CONFIG


@pytest.fixture(scope="module")
def setup():
    spec = spec_from_config(TINY_DDPMPP_CONFIG)
    params = spec.init(jax.random.PRNGKey(0))
    block = delta_block_init(
        jax.random.PRNGKey(1), spec.bottleneck_ch, spec.temb_ch
    )
    edit = EditState(blocks=(block,), hs_coeff=jnp.array([1.0, 1.0]))
    sched = asyrp.make_schedule()
    seq = asyrp.uniform_seq(4, 999)
    return spec, params, edit, sched, seq


def test_export_roundtrip_matches_live_engine(setup, tmp_path):
    spec, params, edit, sched, seq = setup
    artifact, meta = export_invert_edit(
        spec, sched, seq, seq, params, edit,
        t_edit=500, t_addnoise=100, batch=2, image_size=32,
        platforms=[jax.default_backend()],
    )
    path = str(tmp_path / "serve.jaxexp")
    save_serving(path, artifact, meta)

    fn = load_serving(path)
    assert fn.meta["t_edit"] == 500

    x0 = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3), jnp.float32)
    rng = jax.random.PRNGKey(7)
    got = fn(params, edit, x0, rng)

    live = engine.make_invert_edit(
        spec, sched, seq, seq, t_edit=500, t_addnoise=100
    )(params, edit, x0, rng)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(live))


def test_export_leaf_count_guard(setup, tmp_path):
    spec, params, edit, sched, seq = setup
    artifact, meta = export_invert_edit(
        spec, sched, seq, seq, params, edit,
        t_edit=500, batch=1, image_size=32,
        platforms=[jax.default_backend()],
    )
    path = str(tmp_path / "serve2.jaxexp")
    save_serving(path, artifact, meta)
    fn = load_serving(path)
    x0 = jnp.zeros((1, 32, 32, 3), jnp.float32)
    with pytest.raises(ValueError, match="param leaves"):
        fn({}, edit, x0, jax.random.PRNGKey(0))


def test_export_cross_platform_lowering(setup):
    """Exporting FOR TPU from a CPU host must lower (the production
    artifact is built off-device); execution is validated on the real
    backend elsewhere."""
    spec, params, edit, sched, seq = setup
    artifact, meta = export_invert_edit(
        spec, sched, seq, seq, params, edit,
        t_edit=500, batch=1, image_size=32, platforms=["tpu"],
    )
    assert meta["platforms"] == ["tpu"] and len(artifact) > 0
