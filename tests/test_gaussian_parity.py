"""core/gaussian.py vs the reference's GaussianDiffusion
(models/guided_diffusion/gaussian_diffusion.py) — the upstream tier the
Asyrp runner never exercises, ported for surface completeness and verified
here distribution-by-distribution with a shared deterministic model."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asyrp_official_tpu.core import gaussian as G

T = 20
SHAPE = (2, 8, 8, 3)  # NHWC


def _betas():
    return np.linspace(1e-4, 0.05, T, dtype=np.float64)


def _model_np(x_nhwc, t, out_ch):
    """Deterministic stand-in model: smooth function of (x, t)."""
    b = x_nhwc.shape[0]
    t = np.asarray(t, np.float32).reshape(b, 1, 1, 1)
    base = np.tanh(x_nhwc) * 0.5 + np.sin(t / 7.0) * 0.1
    if out_ch == x_nhwc.shape[-1]:
        return base
    return np.concatenate([base, np.cos(x_nhwc + t / 11.0) * 0.3], axis=-1)


def _model_jnp(x, t, out_ch):
    """The same model in jnp (traceable inside lax.scan loops)."""
    tt = t.astype(jnp.float32).reshape(x.shape[0], 1, 1, 1)
    base = jnp.tanh(x) * 0.5 + jnp.sin(tt / 7.0) * 0.1
    if out_ch == x.shape[-1]:
        return base
    return jnp.concatenate([base, jnp.cos(x + tt / 11.0) * 0.3], axis=-1)


def _ref(mean_type, var_type, loss_type="mse", **kw):
    import sys

    from models.guided_diffusion.gaussian_diffusion import (
        GaussianDiffusion, LossType, ModelMeanType, ModelVarType,
    )

    return GaussianDiffusion(
        betas=_betas(),
        model_mean_type={
            "eps": ModelMeanType.EPSILON,
            "xstart": ModelMeanType.START_X,
            "xprev": ModelMeanType.PREVIOUS_X,
        }[mean_type],
        model_var_type={
            "learned": ModelVarType.LEARNED,
            "learned_range": ModelVarType.LEARNED_RANGE,
            "fixedsmall": ModelVarType.FIXED_SMALL,
            "fixedlarge": ModelVarType.FIXED_LARGE,
        }[var_type],
        loss_type={
            "mse": LossType.MSE, "rescaled_mse": LossType.RESCALED_MSE,
            "kl": LossType.KL, "rescaled_kl": LossType.RESCALED_KL,
        }[loss_type],
        **kw,
    )


def _torch_model(out_ch):
    import torch

    def f(x_nchw, t, **kwargs):
        x = np.transpose(x_nchw.numpy(), (0, 2, 3, 1))
        y = _model_np(x, t.numpy(), out_ch)
        return torch.from_numpy(np.transpose(y, (0, 3, 1, 2)))

    return f


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    x0 = (rng.rand(*SHAPE).astype(np.float32) * 2 - 1)
    xt = rng.randn(*SHAPE).astype(np.float32)
    noise = rng.randn(*SHAPE).astype(np.float32)
    t = np.array([3, 0], np.int64)  # includes t == 0 (decoder-NLL branch)
    return x0, xt, noise, t


def _nchw(x):
    import torch

    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def _nhwc(x):
    return np.transpose(x.numpy(), (0, 2, 3, 1))


TAB = G.make_tables(_betas())


def test_q_distributions(reference_path, data):
    import torch

    x0, xt, noise, t = data
    ref = _ref("eps", "fixedsmall")
    tt = torch.from_numpy(t)

    m, v, lv = G.q_mean_variance(TAB, jnp.asarray(x0), jnp.asarray(t))
    rm, rv, rlv = ref.q_mean_variance(_nchw(x0), tt)
    np.testing.assert_allclose(np.asarray(m), _nhwc(rm), rtol=1e-5)
    np.testing.assert_allclose(
        np.broadcast_to(np.asarray(lv), SHAPE), _nhwc(rlv.expand_as(rm)), rtol=1e-5
    )

    s = G.q_sample(TAB, jnp.asarray(x0), jnp.asarray(t), jnp.asarray(noise))
    rs = ref.q_sample(_nchw(x0), tt, noise=_nchw(noise))
    np.testing.assert_allclose(np.asarray(s), _nhwc(rs), rtol=1e-5, atol=1e-6)

    pm, pv, plv = G.q_posterior_mean_variance(
        TAB, jnp.asarray(x0), jnp.asarray(xt), jnp.asarray(t)
    )
    rpm, rpv, rplv = ref.q_posterior_mean_variance(_nchw(x0), _nchw(xt), tt)
    np.testing.assert_allclose(np.asarray(pm), _nhwc(rpm), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.broadcast_to(np.asarray(plv), SHAPE), _nhwc(rplv.expand_as(rpm)), rtol=1e-5
    )


@pytest.mark.parametrize("mean_type", ["eps", "xstart", "xprev"])
@pytest.mark.parametrize(
    "var_type", ["fixedsmall", "fixedlarge", "learned", "learned_range"]
)
def test_p_mean_variance(reference_path, data, mean_type, var_type):
    import torch

    x0, xt, noise, t = data
    out_ch = 6 if var_type in ("learned", "learned_range") else 3
    ref = _ref(mean_type, var_type)
    rout = ref.p_mean_variance(
        _torch_model(out_ch), _nchw(xt), torch.from_numpy(t), clip_denoised=True
    )
    mo = jnp.asarray(_model_np(xt, t, out_ch))
    ours = G.p_mean_variance(
        TAB, mo, jnp.asarray(xt), jnp.asarray(t),
        mean_type=mean_type, var_type=var_type, clip_denoised=True,
    )
    for k in ("mean", "log_variance", "pred_xstart"):
        # fixed-variance tables stay [B,1,1,1] on our side (broadcasting is
        # free in XLA); compare value-wise on the broadcast shape
        np.testing.assert_allclose(
            np.broadcast_to(np.asarray(ours[k]), xt.shape),
            _nhwc(rout[k].expand(_nchw(xt).shape)),
            rtol=2e-5, atol=1e-6, err_msg=f"{k} {mean_type}/{var_type}",
        )


def test_ddim_steps(reference_path, data):
    import torch

    x0, xt, noise, t = data
    ref = _ref("eps", "fixedsmall")
    mo = jnp.asarray(_model_np(xt, t, 3))

    r = ref.ddim_sample(_torch_model(3), _nchw(xt), torch.from_numpy(t), eta=0.0)
    o = G.ddim_sample(TAB, mo, jnp.asarray(xt), jnp.asarray(t), eta=0.0)
    np.testing.assert_allclose(np.asarray(o["sample"]), _nhwc(r["sample"]),
                               rtol=1e-5, atol=1e-6)

    r = ref.ddim_reverse_sample(_torch_model(3), _nchw(xt), torch.from_numpy(t))
    o = G.ddim_reverse_sample(TAB, mo, jnp.asarray(xt), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(o["sample"]), _nhwc(r["sample"]),
                               rtol=1e-5, atol=1e-6)


def test_ddim_sample_loop(reference_path):
    import torch

    rng = np.random.RandomState(1)
    noise = rng.randn(*SHAPE).astype(np.float32)
    ref = _ref("eps", "fixedsmall")
    r = ref.ddim_sample_loop(
        _torch_model(3), SHAPE[:1] + (3, 8, 8),
        noise=_nchw(noise), eta=0.0, device="cpu",
    )
    o = G.ddim_sample_loop(
        lambda x, t: _model_jnp(x, t, 3),
        TAB, jnp.asarray(noise), jax.random.PRNGKey(0), eta=0.0,
    )
    np.testing.assert_allclose(np.asarray(o), _nhwc(r), rtol=1e-4, atol=1e-5)


def test_vb_terms_and_prior(reference_path, data):
    import torch

    x0, xt, noise, t = data
    ref = _ref("eps", "fixedsmall")
    r = ref._vb_terms_bpd(
        _torch_model(3), _nchw(x0), _nchw(xt), torch.from_numpy(t),
        clip_denoised=True,
    )
    o = G.vb_terms_bpd(
        TAB, jnp.asarray(_model_np(xt, t, 3)), jnp.asarray(x0),
        jnp.asarray(xt), jnp.asarray(t),
        clip_denoised=True, mean_type="eps", var_type="fixedsmall",
    )
    np.testing.assert_allclose(np.asarray(o["output"]), r["output"].numpy(),
                               rtol=1e-4, atol=1e-6)

    np.testing.assert_allclose(
        np.asarray(G.prior_bpd(TAB, jnp.asarray(x0))),
        ref._prior_bpd(_nchw(x0)).numpy(), rtol=1e-4,
    )


@pytest.mark.parametrize("loss_type,var_type,p2", [
    ("mse", "fixedsmall", 0.0),
    ("mse", "fixedsmall", 1.0),          # P2 weighting (AFHQ/FFHQ ckpts)
    ("rescaled_mse", "learned_range", 0.0),  # iDDPM hybrid objective
    ("kl", "fixedsmall", 0.0),
])
def test_training_losses(reference_path, data, loss_type, var_type, p2):
    import torch

    x0, xt, noise, t = data
    out_ch = 6 if var_type == "learned_range" else 3
    ref = _ref("eps", var_type, loss_type, p2_gamma=p2)
    r = ref.training_losses(
        _torch_model(out_ch), _nchw(x0), torch.from_numpy(t),
        noise=_nchw(noise),
    )
    o = G.training_losses(
        TAB,
        lambda x, tt: jnp.asarray(_model_np(np.asarray(x), np.asarray(tt), out_ch)),
        jnp.asarray(x0), jnp.asarray(t), jnp.asarray(noise),
        mean_type="eps", var_type=var_type, loss_type=loss_type, p2_gamma=p2,
    )
    for k in r:
        np.testing.assert_allclose(
            np.asarray(o[k]), r[k].numpy(), rtol=1e-4, atol=1e-6,
            err_msg=f"{k} ({loss_type}/{var_type}/p2={p2})",
        )


def test_cosine_schedule_matches(reference_path):
    from models.guided_diffusion.gaussian_diffusion import get_named_beta_schedule

    np.testing.assert_allclose(
        G.cosine_betas(50), get_named_beta_schedule("cosine", 50), rtol=1e-12
    )


def test_classifier_guidance_parity(reference_path, data):
    """condition_mean / condition_score vs the reference, with a smooth
    cond_fn standing in for grad(log p(y|x))."""
    import torch

    x0, xt, noise, t = data
    ref = _ref("eps", "fixedsmall")

    def cond_np(x, tt):
        return np.sin(x) * 0.2 + np.asarray(tt, np.float32).reshape(-1, 1, 1, 1) / 100.0

    def torch_cond(x, tt, **kw):
        return torch.from_numpy(np.transpose(
            cond_np(np.transpose(x.numpy(), (0, 2, 3, 1)), tt.numpy()), (0, 3, 1, 2)))

    pmv_ref = ref.p_mean_variance(
        _torch_model(3), _nchw(xt), torch.from_numpy(t), clip_denoised=True)
    pmv = G.p_mean_variance(
        TAB, jnp.asarray(_model_np(xt, t, 3)), jnp.asarray(xt), jnp.asarray(t),
        mean_type="eps", var_type="fixedsmall", clip_denoised=True)
    grad = jnp.asarray(cond_np(xt, t))

    rm = ref.condition_mean(torch_cond, pmv_ref, _nchw(xt), torch.from_numpy(t), model_kwargs={})
    om = G.condition_mean(pmv, grad)["mean"]
    np.testing.assert_allclose(np.asarray(om), _nhwc(rm), rtol=1e-5, atol=1e-6)

    rs = ref.condition_score(torch_cond, pmv_ref, _nchw(xt), torch.from_numpy(t), model_kwargs={})
    os_ = G.condition_score(TAB, pmv, jnp.asarray(xt), jnp.asarray(t), grad)
    for k in ("mean", "pred_xstart"):
        np.testing.assert_allclose(
            np.asarray(os_[k]), _nhwc(rs[k]), rtol=1e-5, atol=1e-6, err_msg=k)
