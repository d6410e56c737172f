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


def test_local_losses_sync_pads_ragged_batches(monkeypatch):
    """Multi-process loss-history sync must survive unequal per-host batch
    sizes (the reference pads to max_bs, resample.py:82-104;
    process_allgather requires identical shapes). Simulated with a faked
    2-process world: each 'process' contributes its own ragged batch and
    both histories must equal the plain concatenated update."""
    from jax.experimental import multihost_utils

    batches = {  # ragged: 5 vs 3 samples
        0: (np.array([1, 2, 3, 4, 5]), np.array([0.1, 0.2, 0.3, 0.4, 0.5])),
        1: (np.array([6, 7, 8]), np.array([0.6, 0.7, 0.8])),
    }
    world = {}

    def fake_allgather(x):
        # echo what each process WOULD contribute: recorded per call index
        world.setdefault("calls", []).append(np.asarray(x))
        i = len(world["calls"]) - 1
        other = world["other_calls"][i]
        mine = np.asarray(x)
        return np.stack([mine, other] if world["rank"] == 0 else [other, mine])

    monkeypatch.setattr("jax.process_count", lambda: 2)
    monkeypatch.setattr(multihost_utils, "process_allgather", fake_allgather)

    results = []
    for rank in (0, 1):
        peer = batches[1 - rank]
        pad_to = max(len(batches[0][0]), len(batches[1][0]))

        def peer_pad(a):
            return np.pad(np.asarray(a), (0, pad_to - len(a)))

        world.clear()
        world["rank"] = rank
        world["other_calls"] = [
            np.array([len(peer[0])], np.int32),
            peer_pad(peer[0]).astype(np.int64),
            peer_pad(peer[1]).astype(np.float64),
        ]
        r = LossSecondMomentResampler(10, history_per_term=4)
        r.update_with_local_losses(*batches[rank])
        results.append((r._loss_history.copy(), r._loss_counts.copy()))

    # both 'processes' converge to the same history == the plain update
    expected = LossSecondMomentResampler(10, history_per_term=4)
    expected.update_with_all_losses(
        np.concatenate([batches[0][0], batches[1][0]]),
        np.concatenate([batches[0][1], batches[1][1]]),
    )
    for hist, counts in results:
        np.testing.assert_allclose(hist, expected._loss_history)
        np.testing.assert_array_equal(counts, expected._loss_counts)


def test_wrap_model_rescale_requires_original_num_steps():
    with pytest.raises(ValueError, match="original_num_steps"):
        G.wrap_model_for_respacing(
            lambda x, t: x, np.arange(10), rescale_timesteps=True
        )
