"""decode_mode="split" ≡ the 2B-stacked dual decode (models/{ddpmpp,
openai_unet}.apply).

Batching a conv is per-sample independent, so two B-sized decodes and one
2B-stacked decode compute the same values — but under `jax.grad` only the
split form lets XLA drop the plain decode's backward (its output never
reaches the loss and carries no Δ dependence). Training forces "split"
(pipelines/train.py); these tests pin that the fast path changes nothing
numerically, values AND Δ-gradients, for both UNet families at bs > 1.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asyrp_official_tpu.models import ddpmpp, openai_unet
from asyrp_official_tpu.models.delta import EditState, delta_block_init
from asyrp_official_tpu.models.registry import ModelSpec

BS = 3  # > 1 so "auto" takes the stacked branch


def _spec(family):
    if family == "ddpmpp":
        cfg = ddpmpp.DDPMppConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                                  attn_resolutions=(16,), resolution=32)
        return ModelSpec("ddpmpp", cfg, False, "ddpm")
    cfg = openai_unet.OpenAIUNetConfig(
        image_size=32, model_channels=32, out_channels=6, num_res_blocks=1,
        attention_ds=(2,), channel_mult=(1, 2), num_heads=4,
        num_head_channels=16, use_scale_shift_norm=True, resblock_updown=True,
    )
    return ModelSpec("openai", cfg, True, "openai")


@pytest.mark.parametrize("family", ["ddpmpp", "openai"])
def test_split_decode_matches_stacked(family):
    spec = _spec(family)
    params = spec.init(jax.random.PRNGKey(0))
    block = delta_block_init(
        jax.random.PRNGKey(1), spec.bottleneck_ch, spec.config.temb_ch,
        flavor=spec.delta_flavor,
    )
    edit = EditState(mode="deltablock", blocks=(block,),
                     hs_coeff=jnp.asarray([1.0, 1.0]),
                     flavor=spec.delta_flavor, use_delta=jnp.asarray(1.0))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(BS, 32, 32, 3).astype(np.float32))
    t = jnp.full((BS,), 241.0, jnp.float32)

    eps_a, mod_a, dh_a, _ = spec.apply(params, x, t, edit=edit)
    eps_s, mod_s, dh_s, _ = spec.apply(params, x, t, edit=edit,
                                       decode_mode="split")
    np.testing.assert_allclose(np.asarray(eps_a), np.asarray(eps_s),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mod_a), np.asarray(mod_s),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dh_a), np.asarray(dh_s),
                               rtol=1e-6, atol=1e-6)

    # Δ-gradients through eps_mod (the training loss path) agree too
    def loss(blocks, mode):
        e = EditState(mode="deltablock", blocks=blocks,
                      hs_coeff=jnp.asarray([1.0, 1.0]),
                      flavor=spec.delta_flavor, use_delta=jnp.asarray(1.0))
        _, mod, _, _ = spec.apply(params, x, t, edit=e, decode_mode=mode)
        return jnp.abs(mod).mean()

    g_a = jax.grad(lambda b: loss(b, "auto"))((block,))
    g_s = jax.grad(lambda b: loss(b, "split"))((block,))
    for la, ls in zip(jax.tree.leaves(g_a), jax.tree.leaves(g_s)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(ls),
                                   rtol=1e-4, atol=1e-5)


def test_serve_decode_env_knob_matches_auto(monkeypatch):
    """ASYRP_TPU_SERVE_DECODE=split ≡ default at the engine surface.

    The serving analogue of the training knob: pipelines/engine._edited_chain
    threads the env into every dual-decode step; a full edited-generation
    chain at bs > 1 must be numerically unchanged (it is the same math in a
    different conv batch shape — the knob exists because conv batch
    efficiency is non-monotonic on the v5e, BASELINE.md)."""
    from asyrp_official_tpu.core.schedule import make_schedule
    from asyrp_official_tpu.pipelines import engine

    spec = _spec("ddpmpp")
    params = spec.init(jax.random.PRNGKey(0))
    block = delta_block_init(
        jax.random.PRNGKey(1), spec.bottleneck_ch, spec.config.temb_ch,
        flavor=spec.delta_flavor,
    )
    edit = EditState(mode="deltablock", blocks=(block,),
                     hs_coeff=jnp.asarray([1.0, 1.0]),
                     flavor=spec.delta_flavor, use_delta=jnp.asarray(1.0))
    sched = make_schedule()
    seq = [601, 401, 201, 1]
    rng = np.random.RandomState(1)
    x_lat = jnp.asarray(rng.randn(BS, 32, 32, 3).astype(np.float32))
    key = jax.random.PRNGKey(7)

    monkeypatch.delenv("ASYRP_TPU_SERVE_DECODE", raising=False)
    run_auto = engine.make_edit_generate(spec, sched, seq, t_edit=300)
    x_auto, _ = run_auto(params, edit, x_lat, key)

    monkeypatch.setenv("ASYRP_TPU_SERVE_DECODE", "split")
    run_split = engine.make_edit_generate(spec, sched, seq, t_edit=300)
    x_split, _ = run_split(params, edit, x_lat, key)

    np.testing.assert_allclose(np.asarray(x_auto), np.asarray(x_split),
                               rtol=1e-5, atol=1e-5)


def test_decode_mode_rejects_unknown():
    spec = _spec("ddpmpp")
    params = spec.init(jax.random.PRNGKey(0))
    x = jnp.zeros((2, 32, 32, 3))
    t = jnp.zeros((2,))
    with pytest.raises(ValueError, match="decode_mode"):
        spec.apply(params, x, t, decode_mode="stacked")
