"""Research edit modes: interp_batch, global delta, image-space noise,
style transfer pipeline."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asyrp_official_tpu.core.schedule import make_schedule, uniform_seq
from asyrp_official_tpu.models import ddpmpp
from asyrp_official_tpu.models.delta import (
    EditState,
    apply_edit,
    delta_block_global_init,
)
from asyrp_official_tpu.models.registry import ModelSpec
from asyrp_official_tpu.pipelines import engine
from asyrp_official_tpu.pipelines.style_transfer import style_transfer

CFG = ddpmpp.DDPMppConfig(
    ch=32, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(16,), resolution=32
)
SPEC = ModelSpec(family="ddpmpp", config=CFG, learn_sigma=False, delta_flavor="ddpm")
SCHED = make_schedule()


@pytest.fixture(scope="module")
def params():
    return SPEC.init(jax.random.PRNGKey(0))


def test_interp_batch_mode_endpoints():
    rng = np.random.RandomState(0)
    h = jnp.asarray(rng.randn(3, 4, 4, 8).astype(np.float32))
    temb = jnp.zeros((3, 16))
    edit = EditState(mode="interp_batch", alpha=jnp.array([0.0, 0.5, 1.0]),
                     use_delta=jnp.asarray(1.0))
    h2, _ = apply_edit(edit, h, temb)
    np.testing.assert_allclose(np.asarray(h2[0]), np.asarray(h[0]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(h2[2]), np.asarray(h[2]), rtol=1e-6)
    mid = 0.5 * (np.asarray(h[0]) + np.asarray(h[2]))
    np.testing.assert_allclose(np.asarray(h2[1]), mid, rtol=1e-5)


def test_global_delta_mode():
    key = jax.random.PRNGKey(1)
    block = delta_block_global_init(key, 64, 16, clip_ch=32, hw=4)
    h = jnp.asarray(np.random.RandomState(1).randn(1, 4, 4, 64).astype(np.float32))
    temb = jnp.zeros((1, 16))
    direction = jnp.ones((1, 32))
    edit = EditState(mode="global", blocks=(block,), clip_direction=direction,
                     use_delta=jnp.asarray(1.0))
    h2, dh = apply_edit(edit, h, temb)
    assert h2.shape == h.shape and dh.shape == h.shape
    assert not np.allclose(np.asarray(h2), np.asarray(h))


def test_image_space_noise_generate_and_grad(params):
    seq = uniform_seq(4, 999)
    run = engine.make_image_noise_generate(SPEC, SCHED, seq, t_edit=500)
    x_lat = jnp.asarray(np.random.RandomState(2).randn(1, 32, 32, 3).astype(np.float32))
    noise = 0.1 * jax.random.normal(jax.random.PRNGKey(3), (32, 32, 3))
    out, _ = run(params, noise, x_lat, jax.random.PRNGKey(0))
    out0, _ = run(params, jnp.zeros_like(noise), x_lat, jax.random.PRNGKey(0))
    assert not np.allclose(np.asarray(out), np.asarray(out0))

    def loss(n):
        o, _ = run(params, n, x_lat, jax.random.PRNGKey(0))
        return jnp.abs(o).mean()

    g = jax.grad(loss)(noise)
    assert float(jnp.abs(g).max()) > 0


def test_style_transfer_pipeline(params):
    rng = np.random.RandomState(4)
    content = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32) * 0.3)
    style = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32) * 0.3)
    out, x_lat = style_transfer(
        SPEC, params, SCHED, content, style,
        n_inv_step=5, n_gen_step=5, t_edit=400, hs_coeff=0.9,
    )
    assert out.shape == content.shape
    assert bool(jnp.isfinite(out).all())
    # style injection must change the output vs plain reconstruction
    gen = engine.make_generate(SPEC, SCHED, uniform_seq(5, 999))
    plain, _ = gen(params, x_lat, jax.random.PRNGKey(0))
    assert not np.allclose(np.asarray(out), np.asarray(plain), atol=1e-4)


def test_style_transfer_masked(params):
    rng = np.random.RandomState(5)
    content = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32) * 0.3)
    style = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32) * 0.3)
    out, _ = style_transfer(
        SPEC, params, SCHED, content, style,
        n_inv_step=5, n_gen_step=5, t_edit=400, use_mask=True,
    )
    assert bool(jnp.isfinite(out).all())
    # the use_mask flag must actually reach the injection (the mask math
    # itself is parity-tested in test_diffstyle_injection_parity.py): a
    # pipeline that drops the argument would produce the unmasked output
    unmasked, _ = style_transfer(
        SPEC, params, SCHED, content, style,
        n_inv_step=5, n_gen_step=5, t_edit=400, use_mask=False,
    )
    assert not np.allclose(np.asarray(out), np.asarray(unmasked), atol=1e-5)


def test_style_transfer_below_tedit_errors(params):
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    with pytest.raises(ValueError):
        style_transfer(SPEC, params, SCHED, x, x, n_inv_step=5, n_gen_step=5,
                       t_edit=2000)
