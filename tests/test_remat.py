"""Rematerialization flag: identical outputs and grads, both families."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asyrp_official_tpu.models import ddpmpp, openai_unet
from asyrp_official_tpu.models.registry import ModelSpec

@pytest.mark.slow
def test_ddpmpp_remat_identical():
    cfg = ddpmpp.DDPMppConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                              attn_resolutions=(16,), resolution=32)
    cfg_r = dataclasses.replace(cfg, remat=True)
    params = ddpmpp.init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3).astype(np.float32))
    t = jnp.full((1,), 100.0)
    eps, *_ = ddpmpp.apply(params, cfg, x, t)
    eps_r, *_ = ddpmpp.apply(params, cfg_r, x, t)
    np.testing.assert_allclose(np.asarray(eps_r), np.asarray(eps), rtol=1e-4, atol=2e-6)

    # grads identical (remat changes memory, not math)
    def loss(cfg_):
        def f(xx):
            e, *_ = ddpmpp.apply(params, cfg_, xx, t)
            return jnp.abs(e).mean()
        return jax.grad(f)(x)

    np.testing.assert_allclose(
        np.asarray(loss(cfg_r)), np.asarray(loss(cfg)), rtol=1e-4, atol=1e-6
    )


def test_openai_remat_identical():
    cfg = openai_unet.OpenAIUNetConfig(
        image_size=32, model_channels=32, out_channels=6, num_res_blocks=1,
        attention_ds=(2,), channel_mult=(1, 2))
    cfg_r = dataclasses.replace(cfg, remat=True)
    params = openai_unet.init(jax.random.PRNGKey(1), cfg)
    x = jnp.asarray(np.random.RandomState(1).randn(1, 32, 32, 3).astype(np.float32))
    t = jnp.full((1,), 100.0)
    eps, *_ = openai_unet.apply(params, cfg, x, t)
    eps_r, *_ = openai_unet.apply(params, cfg_r, x, t)
    np.testing.assert_allclose(np.asarray(eps_r), np.asarray(eps), rtol=1e-4, atol=2e-6)
