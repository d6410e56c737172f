"""Respacing (SpacedDiffusion) and timestep importance samplers vs the
reference's vestigial tier (respace.py, resample.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asyrp_official_tpu.core import gaussian as G
from asyrp_official_tpu.core.resample import (
    LossSecondMomentResampler,
    UniformSampler,
    create_named_schedule_sampler,
)
from asyrp_official_tpu.core.schedule import space_timesteps

T = 100


def _betas():
    return np.linspace(1e-4, 0.02, T, dtype=np.float64)


def test_respaced_tables_match_reference(reference_path):
    from models.guided_diffusion.gaussian_diffusion import (
        GaussianDiffusion, LossType, ModelMeanType, ModelVarType,
    )
    from models.guided_diffusion.respace import SpacedDiffusion
    from models.guided_diffusion.respace import space_timesteps as ref_space

    use = ref_space(T, "10")
    assert sorted(use) == sorted(space_timesteps(T, "10"))

    ref = SpacedDiffusion(
        use_timesteps=use, betas=_betas(),
        model_mean_type=ModelMeanType.EPSILON,
        model_var_type=ModelVarType.FIXED_SMALL, loss_type=LossType.MSE,
    )
    tab, tmap = G.respaced_tables(_betas(), use)
    np.testing.assert_allclose(tab.betas, ref.betas, rtol=1e-12)
    np.testing.assert_allclose(tab.alphas_cumprod, ref.alphas_cumprod, rtol=1e-12)
    np.testing.assert_allclose(tmap, ref.timestep_map)


def test_respaced_sampling_matches_reference(reference_path):
    """A ddim step on the respaced grid: wrapped model receives ORIGINAL
    timesteps; outputs match the reference SpacedDiffusion."""
    import torch
    from models.guided_diffusion.gaussian_diffusion import (
        LossType, ModelMeanType, ModelVarType,
    )
    from models.guided_diffusion.respace import SpacedDiffusion, space_timesteps as ref_space

    use = ref_space(T, "10")
    ref = SpacedDiffusion(
        use_timesteps=use, betas=_betas(),
        model_mean_type=ModelMeanType.EPSILON,
        model_var_type=ModelVarType.FIXED_SMALL, loss_type=LossType.MSE,
    )
    tab, tmap = G.respaced_tables(_betas(), use)

    seen_ts = []

    def model_np(x, t):
        seen_ts.append(np.asarray(t))
        return np.tanh(x) * 0.3 + np.asarray(t, np.float32).reshape(-1, 1, 1, 1) / 300.0

    def torch_model(x, t, **kw):
        return torch.from_numpy(
            np.transpose(
                model_np(np.transpose(x.numpy(), (0, 2, 3, 1)), t.numpy()),
                (0, 3, 1, 2),
            )
        )

    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    t = np.array([3, 7], np.int64)  # respaced indices

    with torch.no_grad():
        r = ref.ddim_sample(
            torch_model, torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
            torch.from_numpy(t), eta=0.0,
        )
    wrapped = G.wrap_model_for_respacing(
        lambda xx, tt: jnp.asarray(
            model_np(np.asarray(xx), np.asarray(tt))
        ),
        tmap,
    )
    o = G.ddim_sample(tab, wrapped(jnp.asarray(x), jnp.asarray(t)),
                      jnp.asarray(x), jnp.asarray(t), eta=0.0)
    np.testing.assert_allclose(
        np.asarray(o["sample"]),
        np.transpose(r["sample"].numpy(), (0, 2, 3, 1)), rtol=1e-5, atol=1e-6,
    )
    # the model saw ORIGINAL timesteps (mapped through timestep_map)
    assert all((np.isin(ts, tmap)).all() for ts in seen_ts), seen_ts


def _ref_resampler(reference_path, num_timesteps):
    import types

    from models.guided_diffusion import resample as ref_resample

    if not hasattr(np, "int"):  # the upstream uses the removed np.int alias
        np.int = int  # noqa: NPY001
    diffusion = types.SimpleNamespace(num_timesteps=num_timesteps)
    return ref_resample.LossSecondMomentResampler(diffusion)


def test_loss_second_moment_weights_match(reference_path):
    ours = LossSecondMomentResampler(20)
    ref = _ref_resampler(reference_path, 20)

    rng = np.random.RandomState(0)
    for _ in range(30):
        ts = rng.randint(0, 20, size=8)
        losses = rng.rand(8) * 2
        ours.update_with_all_losses(ts, losses)
        ref.update_with_all_losses(ts.tolist(), losses.tolist())
    np.testing.assert_allclose(ours.weights(), ref.weights(), rtol=1e-12)
    assert ours._warmed_up() == ref._warmed_up()

    # sampled indices + importance weights match under the same RNG stream
    np.random.seed(123)
    w = ref.weights()
    p = w / w.sum()
    exp_idx = np.random.choice(len(p), size=(8,), p=p)
    ts, iw = ours.sample(8, np.random.RandomState(123))
    np.testing.assert_array_equal(ts, exp_idx)
    np.testing.assert_allclose(iw, 1.0 / (len(p) * p[exp_idx]), rtol=1e-6)


def test_uniform_sampler_and_factory():
    s = create_named_schedule_sampler("uniform", 50)
    assert isinstance(s, UniformSampler)
    ts, w = s.sample(16, np.random.RandomState(0))
    assert ts.shape == (16,) and (0 <= ts).all() and (ts < 50).all()
    np.testing.assert_allclose(w, 1.0)
    with pytest.raises(NotImplementedError):
        create_named_schedule_sampler("nope", 50)
