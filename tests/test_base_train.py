"""Base diffusion-model training (pipelines/base_train — the upstream
TrainLoop equivalent): the loss must actually decrease, EMA must track,
importance sampling must integrate, and the step must run sharded on the
virtual mesh with replicated grads."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from asyrp_official_tpu.core import gaussian as G
from asyrp_official_tpu.core.resample import LossSecondMomentResampler
from asyrp_official_tpu.models import ddpmpp
from asyrp_official_tpu.models.registry import ModelSpec
from asyrp_official_tpu.parallel import mesh as pmesh
from asyrp_official_tpu.pipelines.base_train import (
    init_train_state,
    make_base_train_step,
)

CFG = ddpmpp.DDPMppConfig(
    ch=32, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(16,),
    resolution=16,
)
SPEC = ModelSpec("ddpmpp", CFG, False, "ddpm")
TAB = G.make_tables(np.linspace(1e-4, 0.02, 50))


def _apply(params, x, t):
    eps, *_ = SPEC.apply(params, x, t)
    return eps


def _data(n, rng):
    # a simple structured dataset: smooth gradients + noise
    yy, xx = np.mgrid[0:16, 0:16] / 15.0
    base = np.stack([xx, yy, xx * yy], axis=-1)[None] * 2 - 1
    return np.clip(
        base + rng.randn(n, 16, 16, 3) * 0.05, -1, 1
    ).astype(np.float32)

@pytest.mark.slow
def test_base_training_learns(tmp_path):
    rng = np.random.RandomState(0)
    params = SPEC.init(jax.random.PRNGKey(0))
    opt = optax.adam(2e-4)
    params, ema, opt_state = init_train_state(params, opt)
    step = make_base_train_step(_apply, TAB, opt, ema_rate=0.99)

    sampler = LossSecondMomentResampler(TAB.num_timesteps, history_per_term=2)
    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(30):
        x0 = jnp.asarray(_data(4, rng))
        ts, w = sampler.sample(4, np.random.RandomState(i))
        key, nk = jax.random.split(key)
        noise = jax.random.normal(nk, x0.shape)
        params, ema, opt_state, m = step(
            params, ema, opt_state, x0, jnp.asarray(ts), noise, jnp.asarray(w)
        )
        sampler.update_with_local_losses(ts, np.asarray(m["loss_per_sample"]))
        losses.append(float(m["loss"]))
    first, last = np.mean(losses[:5]), np.mean(losses[-5:])
    assert last < first * 0.7, (first, last)
    assert sampler._loss_counts.sum() > 0

    # EMA lags the raw params but is no longer the init
    d_ema = max(
        float(jnp.abs(a - b).max())
        for a, b in zip(jax.tree.leaves(ema), jax.tree.leaves(params))
    )
    assert 0 < d_ema

    # the trained (EMA) model samples without NaNs through the full loop
    out = G.ddim_sample_loop(
        lambda x, t: _apply(ema, x, t.astype(jnp.float32)),
        TAB, jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 3)),
        jax.random.PRNGKey(3),
    )
    assert np.isfinite(np.asarray(out)).all()


def test_base_training_hybrid_objective():
    """learned_range + rescaled_mse (the iDDPM hybrid loss) end-to-end."""
    cfg6 = ddpmpp.DDPMppConfig(
        ch=32, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(16,),
        resolution=16, out_ch=6,
    )
    spec = ModelSpec("ddpmpp", cfg6, True, "ddpm")

    def apply6(p, x, t):
        eps, *_ = spec.apply(p, x, t)
        return eps

    params = spec.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-4)
    params, ema, opt_state = init_train_state(params, opt)
    step = make_base_train_step(
        apply6, TAB, opt, var_type="learned_range", loss_type="rescaled_mse",
    )
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(_data(2, rng))
    t = jnp.asarray([3, 40])
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    params, ema, opt_state, m = step(
        params, ema, opt_state, x0, t, noise, jnp.ones((2,))
    )
    assert np.isfinite(float(m["loss"]))
    assert "vb" in m and np.isfinite(float(m["vb"]))


def test_base_training_sharded_on_mesh():
    m = pmesh.make_mesh()
    if m.devices.size < 2:
        pytest.skip("needs multiple devices")
    params = pmesh.replicate(m, SPEC.init(jax.random.PRNGKey(0)))
    opt = optax.adam(1e-4)
    params, ema, opt_state = init_train_state(params, opt)
    ema = pmesh.replicate(m, ema)
    opt_state = pmesh.replicate(m, opt_state)
    step = make_base_train_step(_apply, TAB, opt)

    n = m.devices.size
    rng = np.random.RandomState(0)
    x0 = pmesh.shard_batch(m, jnp.asarray(_data(n, rng)))
    t = pmesh.shard_batch(m, jnp.arange(n, dtype=jnp.int32))
    noise = pmesh.shard_batch(
        m, jax.random.normal(jax.random.PRNGKey(1), (n, 16, 16, 3))
    )
    w = pmesh.shard_batch(m, jnp.ones((n,)))
    params, ema, opt_state, metrics = step(
        params, ema, opt_state, x0, t, noise, w
    )
    assert np.isfinite(float(metrics["loss"]))
    # grads all-reduced → params remain replicated
    for leaf in jax.tree.leaves(params):
        assert leaf.sharding.is_fully_replicated, leaf.sharding


def test_base_step_feedback_does_not_recompile():
    """Weak-typed opt_state scalars (inject_hyperparams python float) must
    not change the jit signature when state is fed back (same trap as
    pipelines/train.py; one silent full-size recompile otherwise)."""
    rng = np.random.RandomState(0)
    params = SPEC.init(jax.random.PRNGKey(0))
    opt = optax.inject_hyperparams(optax.sgd)(learning_rate=2e-4)
    params, ema, opt_state = init_train_state(params, opt)
    step = make_base_train_step(_apply, TAB, opt)
    key = jax.random.PRNGKey(1)
    for i in range(3):
        x0 = jnp.asarray(_data(2, rng))
        key, nk = jax.random.split(key)
        params, ema, opt_state, _ = step(
            params, ema, opt_state, x0,
            jnp.asarray(np.array([1, 5])), jax.random.normal(nk, x0.shape),
            jnp.ones((2,), jnp.float32),
        )
    assert step.cache_size() == 1, step.cache_size()
