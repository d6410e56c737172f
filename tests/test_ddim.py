"""DDIM step + scan sampler: closed-form identities and torch-reference parity.

Key closed-form property: with a LINEAR eps model eps(x,t) = x (so the DDIM
map is linear and exactly invertible), inversion followed by generation over
the same grid must reproduce x0 to float tolerance.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from asyrp_official_tpu.core.ddim import ddim_step, ddpm_step
from asyrp_official_tpu.core.sampler import sample_chain
from asyrp_official_tpu.core.schedule import make_schedule, uniform_seq
from asyrp_official_tpu.core.steptable import generation_table, inversion_table


SCHED = make_schedule(num_timesteps=1000)


def test_ddim_step_eta0_matches_reference_formula():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 4, 4, 3).astype(np.float32))
    eps = jnp.asarray(rng.randn(2, 4, 4, 3).astype(np.float32))
    eps_mod = jnp.asarray(rng.randn(2, 4, 4, 3).astype(np.float32))
    at = jnp.full((2,), SCHED.alphas_cumprod[500])
    at_next = jnp.full((2,), SCHED.alphas_cumprod[400])
    noise = jnp.zeros_like(x)

    x_next, x0_t = ddim_step(x, eps, eps_mod, at, at_next, 0.0, noise)

    a = SCHED.alphas_cumprod[500]
    an = SCHED.alphas_cumprod[400]
    x0_ref = (np.asarray(x) - np.asarray(eps_mod) * np.sqrt(1 - a)) / np.sqrt(a)
    xn_ref = np.sqrt(an) * x0_ref + np.sqrt(1 - an) * np.asarray(eps)
    np.testing.assert_allclose(np.asarray(x0_t), x0_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(x_next), xn_ref, rtol=1e-5, atol=1e-6)


def test_ddim_step_eta1_coefficients():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 2, 2, 3).astype(np.float32))
    eps = jnp.asarray(rng.randn(1, 2, 2, 3).astype(np.float32))
    noise = jnp.asarray(rng.randn(1, 2, 2, 3).astype(np.float32))
    t, tn = 500, 400
    a = float(SCHED.alphas_cumprod[t])
    an = float(SCHED.alphas_cumprod[tn])
    x_next, x0_t = ddim_step(
        x, eps, eps, jnp.full((1,), a), jnp.full((1,), an), 1.0, noise
    )
    c1 = 1.0 * np.sqrt((1 - a / an) * (1 - an) / (1 - a))
    c2 = np.sqrt((1 - an) - c1**2)
    x0_ref = (np.asarray(x) - np.asarray(eps) * np.sqrt(1 - a)) / np.sqrt(a)
    xn_ref = np.sqrt(an) * x0_ref + c2 * np.asarray(eps) + c1 * np.asarray(noise)
    np.testing.assert_allclose(np.asarray(x_next), xn_ref, rtol=1e-5, atol=1e-5)


def test_t_next_minus_one_gives_alpha_one():
    # final generation step lands exactly on x0_t.
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 2, 2, 3).astype(np.float32))
    eps = jnp.asarray(rng.randn(1, 2, 2, 3).astype(np.float32))
    at = jnp.full((1,), SCHED.alphas_cumprod_ext[0 + 1])  # t = 0
    at_next = jnp.full((1,), SCHED.alphas_cumprod_ext[-1 + 1])  # t_next = -1 → 1.0
    x_next, x0_t = ddim_step(x, eps, eps, at, at_next, 0.0, jnp.zeros_like(x))
    np.testing.assert_allclose(np.asarray(x_next), np.asarray(x0_t), rtol=1e-5)


def _linear_eps_fn(x, t, aux):
    return x, None


def test_inversion_generation_roundtrip_zero_eps_exact():
    """With eps ≡ 0 every DDIM step is x' = sqrt(at_next/at)·x, so the
    inversion∘generation product telescopes exactly (up to the final
    t=0 → t_next=-1 factor sqrt(1/a0) ≈ 1.00005)."""
    seq = uniform_seq(40, 999)
    inv = inversion_table(seq)
    gen = generation_table(seq)
    rng = np.random.RandomState(3)
    x0 = jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32) * 0.1)

    zero_fn = lambda x, t, aux: (jnp.zeros_like(x), None)
    x_lat, _ = sample_chain(zero_fn, SCHED, inv, x0)
    x_rec, _ = sample_chain(zero_fn, SCHED, gen, x_lat)
    a0 = float(SCHED.alphas_cumprod[0])
    np.testing.assert_allclose(
        np.asarray(x_rec), np.asarray(x0) / np.sqrt(a0), rtol=1e-4, atol=1e-6
    )


def test_inversion_generation_roundtrip_linear_model_approx():
    """With eps(x) = x the DDIM map is linear but inversion is only the
    first-order approximate inverse (as in the real use: the reference also
    stores x_rec for visual inspection rather than asserting identity,
    diffusion_latent.py:1054-1076). 40 steps ⇒ a few % discretization error."""
    seq = uniform_seq(40, 999)
    inv = inversion_table(seq)
    gen = generation_table(seq)
    rng = np.random.RandomState(3)
    x0 = jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32) * 0.1)

    x_lat, _ = sample_chain(_linear_eps_fn, SCHED, inv, x0)
    x_rec, _ = sample_chain(_linear_eps_fn, SCHED, gen, x_lat)
    rel = np.abs(np.asarray(x_rec) - np.asarray(x0)) / (np.abs(np.asarray(x0)) + 1e-3)
    assert rel.mean() < 0.08, f"mean relative roundtrip error {rel.mean():.4f}"


def test_generation_table_masks():
    seq = uniform_seq(40, 999)
    tab = generation_table(seq, t_edit=516, t_addnoise=200)
    # descending t
    assert tab.t[0] == 999 and tab.t_next[-1] == -1
    assert all(
        (u == 1.0) == (t >= 516) for t, u in zip(tab.t, tab.use_delta)
    )
    assert all((e == 1.0) == (t < 200) for t, e in zip(tab.t, tab.eta))


def test_delta_idx_mapping():
    seq = [0, 100, 516, 700, 999]
    tab = generation_table(seq, t_edit=516, delta_times=[516, 700, 999])
    # reversed order: t = 999, 700, 516, 100, 0
    np.testing.assert_array_equal(tab.delta_idx, [2, 1, 0, 0, 0])


def test_collect_trajectories():
    seq = uniform_seq(10, 999)
    gen = generation_table(seq)
    x = jnp.ones((1, 4, 4, 3), jnp.float32)
    x_final, ys = sample_chain(
        _linear_eps_fn, SCHED, gen, x, collect=("x", "x0_t")
    )
    assert ys["x"].shape == (10, 1, 4, 4, 3)
    assert ys["x0_t"].shape == (10, 1, 4, 4, 3)
    np.testing.assert_allclose(np.asarray(ys["x"][-1]), np.asarray(x_final))


def test_ddpm_step_t0_is_deterministic():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 2, 2, 3).astype(np.float32))
    eps = jnp.asarray(rng.randn(2, 2, 2, 3).astype(np.float32))
    noise = jnp.asarray(rng.randn(2, 2, 2, 3).astype(np.float32))
    t = jnp.array([0, 0])
    bt = jnp.full((2,), SCHED.betas[0])
    at = jnp.full((2,), SCHED.alphas_cumprod[0])
    lv = jnp.full((2,), SCHED.logvar[0])
    out1 = ddpm_step(x, eps, lv, bt, at, t, noise)
    out2 = ddpm_step(x, eps, lv, bt, at, t, noise * 100.0)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))


@pytest.mark.parametrize("eta,t,tn", [(0.0, 500, 400), (1.0, 300, 200), (0.5, 999, 900)])
def test_step_vs_torch_reference(reference_path, eta, t, tn):
    """Bit-level comparison of one step vs the reference denoising_step with a
    stub model (random weights irrelevant — model output is injected)."""
    import torch

    rng = np.random.RandomState(7)
    x_np = rng.randn(2, 3, 8, 8).astype(np.float32)
    eps_np = rng.randn(2, 3, 8, 8).astype(np.float32)
    noise_np = rng.randn(2, 3, 8, 8).astype(np.float32)

    # --- reference math, replicated with torch ops on the same inputs ---
    b = torch.from_numpy(SCHED.betas)
    at_t = (1.0 - b).cumprod(dim=0)[t]
    at_next_t = (1.0 - b).cumprod(dim=0)[tn]
    xt = torch.from_numpy(x_np)
    et = torch.from_numpy(eps_np)
    x0_t_ref = (xt - et * (1 - at_t).sqrt()) / at_t.sqrt()
    if eta == 0:
        xt_next_ref = at_next_t.sqrt() * x0_t_ref + (1 - at_next_t).sqrt() * et
    else:
        c1 = eta * ((1 - at_t / at_next_t) * (1 - at_next_t) / (1 - at_t)).sqrt()
        c2 = ((1 - at_next_t) - c1**2).sqrt()
        xt_next_ref = (
            at_next_t.sqrt() * x0_t_ref
            + c2 * et
            + c1 * torch.from_numpy(noise_np)
        )

    # --- ours (NHWC) ---
    x = jnp.asarray(np.transpose(x_np, (0, 2, 3, 1)))
    eps = jnp.asarray(np.transpose(eps_np, (0, 2, 3, 1)))
    noise = jnp.asarray(np.transpose(noise_np, (0, 2, 3, 1)))
    at = jnp.full((2,), SCHED.alphas_cumprod[t])
    atn = jnp.full((2,), SCHED.alphas_cumprod[tn])
    x_next, x0_t = ddim_step(x, eps, eps, at, atn, eta, noise)

    np.testing.assert_allclose(
        np.transpose(np.asarray(x_next), (0, 3, 1, 2)),
        xt_next_ref.numpy(),
        rtol=1e-5,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(x0_t), (0, 3, 1, 2)),
        x0_t_ref.numpy(),
        rtol=1e-5,
        atol=1e-6,
    )


def test_ddpm_step_bf16_carry_is_finite():
    """bf16 carries collapse alpha-bar ~0.9999 to exactly 1.0 (8-bit
    mantissa), which made weight = bt/sqrt(1-at) inf before the
    f32-coefficient rule was applied to the ddpm branch too."""
    import jax.numpy as jnp

    from asyrp_official_tpu.core.ddim import ddpm_step

    x = jnp.ones((1, 4, 4, 3), jnp.bfloat16)
    eps = jnp.ones_like(x) * 0.1
    out = ddpm_step(
        x, eps,
        logvar=jnp.array([-5.0]), bt=jnp.array([1e-4]),
        at=jnp.array([0.99995]), t=jnp.array([3]),
        noise=jnp.zeros_like(x),
    )
    assert out.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_generation_table_masks_delta_holes():
    """Sparse delta_times: a step >= t_edit with NO delta row must not
    inject (use_delta=0) — the old table fell back to row 0, silently
    applying the delta trained for a different timestep (the reference
    hard-errors on a missing delta_h_dict key instead)."""
    from asyrp_official_tpu.core.steptable import generation_table

    seq = [100, 300, 500, 700, 900]
    tab = generation_table(seq, t_edit=400, delta_times=[900, 500])
    # descending t: 900, 700, 500, 300, 100
    assert list(tab.use_delta) == [1.0, 0.0, 1.0, 0.0, 0.0]
    assert tab.delta_idx[0] == 0 and tab.delta_idx[2] == 1
    # full coverage unchanged
    tab2 = generation_table(seq, t_edit=400, delta_times=[900, 700, 500])
    assert list(tab2.use_delta) == [1.0, 1.0, 1.0, 0.0, 0.0]
