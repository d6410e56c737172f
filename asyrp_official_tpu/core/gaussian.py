"""Full Gaussian-diffusion distribution math — the TPU-native equivalent of
the reference's vestigial upstream tier
(models/guided_diffusion/gaussian_diffusion.py:101-904 and losses.py:12-78),
which the Asyrp runner never exercises but the reference ships. Implemented
so the framework's surface is COMPLETE: q/p distributions, VLB in bits,
discretized decoder likelihood, p_sample/ddim sample loops (as lax.scans),
and the iDDPM/ADM training losses (learned-range variance, P2 weighting).

Design: everything is a pure function over a precomputed `GaussianTables`
pytree — no class state, no torch-style per-call numpy→tensor rebuilds; the
sampling loops compile to single XLA programs.

Conventions: images are NHWC; `t` is an int32 [B] batch of timestep indices
(per-element gathers — unlike core/ddim.py's scalar-per-step tables, this
tier supports the upstream's per-sample random timesteps).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "GaussianTables", "make_tables", "cosine_betas",
    "q_mean_variance", "q_sample", "q_posterior_mean_variance",
    "predict_xstart_from_eps", "predict_xstart_from_xprev",
    "predict_eps_from_xstart", "p_mean_variance",
    "p_sample", "ddim_sample", "ddim_reverse_sample",
    "condition_mean", "condition_score",
    "p_sample_loop", "ddim_sample_loop",
    "normal_kl", "discretized_gaussian_log_likelihood",
    "vb_terms_bpd", "training_losses", "prior_bpd",
]


def cosine_betas(num_timesteps: int, max_beta: float = 0.999) -> np.ndarray:
    """The iDDPM cosine schedule (betas_for_alpha_bar,
    gaussian_diffusion.py:18-62)."""

    def alpha_bar(s):
        return math.cos((s + 0.008) / 1.008 * math.pi / 2) ** 2

    betas = [
        min(1 - alpha_bar((i + 1) / num_timesteps) / alpha_bar(i / num_timesteps),
            max_beta)
        for i in range(num_timesteps)
    ]
    return np.asarray(betas, np.float64)


@dataclasses.dataclass(frozen=True)
class GaussianTables:
    """Precomputed per-timestep constants (gaussian_diffusion.py:118-176),
    float64 numpy at build → float32 gathers at use (same truncation as the
    upstream's _extract_into_tensor)."""

    betas: np.ndarray
    alphas_cumprod: np.ndarray
    alphas_cumprod_prev: np.ndarray
    alphas_cumprod_next: np.ndarray
    sqrt_alphas_cumprod: np.ndarray
    sqrt_one_minus_alphas_cumprod: np.ndarray
    log_one_minus_alphas_cumprod: np.ndarray
    sqrt_recip_alphas_cumprod: np.ndarray
    sqrt_recipm1_alphas_cumprod: np.ndarray
    posterior_variance: np.ndarray
    posterior_log_variance_clipped: np.ndarray
    posterior_mean_coef1: np.ndarray
    posterior_mean_coef2: np.ndarray
    fixed_large_variance: np.ndarray   # [pvar[1], betas[1:]]
    snr: np.ndarray

    @property
    def num_timesteps(self) -> int:
        return int(self.betas.shape[0])


def make_tables(betas: np.ndarray) -> GaussianTables:
    betas = np.asarray(betas, np.float64)
    alphas = 1.0 - betas
    acp = np.cumprod(alphas)
    acp_prev = np.append(1.0, acp[:-1])
    acp_next = np.append(acp[1:], 0.0)
    pvar = betas * (1.0 - acp_prev) / (1.0 - acp)
    return GaussianTables(
        betas=betas,
        alphas_cumprod=acp,
        alphas_cumprod_prev=acp_prev,
        alphas_cumprod_next=acp_next,
        sqrt_alphas_cumprod=np.sqrt(acp),
        sqrt_one_minus_alphas_cumprod=np.sqrt(1.0 - acp),
        log_one_minus_alphas_cumprod=np.log(1.0 - acp),
        sqrt_recip_alphas_cumprod=np.sqrt(1.0 / acp),
        sqrt_recipm1_alphas_cumprod=np.sqrt(1.0 / acp - 1.0),
        posterior_variance=pvar,
        posterior_log_variance_clipped=np.log(np.append(pvar[1], pvar[1:])),
        posterior_mean_coef1=betas * np.sqrt(acp_prev) / (1.0 - acp),
        posterior_mean_coef2=(1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp),
        fixed_large_variance=np.append(pvar[1], betas[1:]),
        snr=acp / (1.0 - acp),
    )


def _gather(arr: np.ndarray, t, shape) -> jnp.ndarray:
    """_extract_into_tensor (gaussian_diffusion.py:906-916): per-sample
    gather broadcast to the image shape, in float32."""
    out = jnp.asarray(arr, jnp.float32)[t]
    return out.reshape(out.shape[0], *([1] * (len(shape) - 1)))


# ---------------------------------------------------------------------------
# q distributions
# ---------------------------------------------------------------------------

def q_mean_variance(tab: GaussianTables, x0, t):
    """q(x_t | x_0) → (mean, variance, log_variance)
    (gaussian_diffusion.py:178-193)."""
    mean = _gather(tab.sqrt_alphas_cumprod, t, x0.shape) * x0
    var = _gather(1.0 - tab.alphas_cumprod, t, x0.shape)
    logvar = _gather(tab.log_one_minus_alphas_cumprod, t, x0.shape)
    return mean, var, logvar


def q_sample(tab: GaussianTables, x0, t, noise):
    """Diffuse x_0 for t steps (gaussian_diffusion.py:195-213)."""
    return (
        _gather(tab.sqrt_alphas_cumprod, t, x0.shape) * x0
        + _gather(tab.sqrt_one_minus_alphas_cumprod, t, x0.shape) * noise
    )


def q_posterior_mean_variance(tab: GaussianTables, x0, xt, t):
    """q(x_{t-1} | x_t, x_0) (gaussian_diffusion.py:215-237)."""
    mean = (
        _gather(tab.posterior_mean_coef1, t, xt.shape) * x0
        + _gather(tab.posterior_mean_coef2, t, xt.shape) * xt
    )
    var = _gather(tab.posterior_variance, t, xt.shape)
    logvar = _gather(tab.posterior_log_variance_clipped, t, xt.shape)
    return mean, var, logvar


# ---------------------------------------------------------------------------
# x0 / eps reparameterizations
# ---------------------------------------------------------------------------

def predict_xstart_from_eps(tab, xt, t, eps):
    return (
        _gather(tab.sqrt_recip_alphas_cumprod, t, xt.shape) * xt
        - _gather(tab.sqrt_recipm1_alphas_cumprod, t, xt.shape) * eps
    )


def predict_xstart_from_xprev(tab, xt, t, xprev):
    return (
        _gather(1.0 / tab.posterior_mean_coef1, t, xt.shape) * xprev
        - _gather(tab.posterior_mean_coef2 / tab.posterior_mean_coef1, t, xt.shape) * xt
    )


def predict_eps_from_xstart(tab, xt, t, x0):
    return (
        _gather(tab.sqrt_recip_alphas_cumprod, t, xt.shape) * xt - x0
    ) / _gather(tab.sqrt_recipm1_alphas_cumprod, t, xt.shape)


# ---------------------------------------------------------------------------
# p distribution from a model OUTPUT (model call stays with the caller)
# ---------------------------------------------------------------------------

def p_mean_variance(
    tab: GaussianTables,
    model_output,
    x,
    t,
    *,
    mean_type: str = "eps",        # 'eps' | 'xstart' | 'xprev'
    var_type: str = "fixedsmall",  # 'learned' | 'learned_range' | 'fixedsmall' | 'fixedlarge'
    clip_denoised: bool = True,
    denoised_fn: Optional[Callable] = None,
) -> Dict[str, jnp.ndarray]:
    """p(x_{t-1} | x_t) (gaussian_diffusion.py:239-334) as a pure function
    of the model output — callers do `p_mean_variance(tab, model(x, t), ...)`,
    which keeps this jit/scan-composable and family-agnostic."""
    if var_type in ("learned", "learned_range"):
        c = model_output.shape[-1] // 2
        model_output, var_values = model_output[..., :c], model_output[..., c:]
        if var_type == "learned":
            logvar = var_values
            var = jnp.exp(logvar)
        else:
            min_log = _gather(tab.posterior_log_variance_clipped, t, x.shape)
            max_log = _gather(np.log(tab.betas), t, x.shape)
            frac = (var_values + 1.0) / 2.0
            logvar = frac * max_log + (1.0 - frac) * min_log
            var = jnp.exp(logvar)
    elif var_type == "fixedlarge":
        var = _gather(tab.fixed_large_variance, t, x.shape)
        logvar = _gather(np.log(tab.fixed_large_variance), t, x.shape)
    elif var_type == "fixedsmall":
        var = _gather(tab.posterior_variance, t, x.shape)
        logvar = _gather(tab.posterior_log_variance_clipped, t, x.shape)
    else:
        raise ValueError(f"unknown var_type {var_type!r}")

    def process(x0):
        if denoised_fn is not None:
            x0 = denoised_fn(x0)
        return jnp.clip(x0, -1.0, 1.0) if clip_denoised else x0

    if mean_type == "xprev":
        pred_xstart = process(predict_xstart_from_xprev(tab, x, t, model_output))
        mean = model_output
    elif mean_type in ("xstart", "eps"):
        pred_xstart = process(
            model_output if mean_type == "xstart"
            else predict_xstart_from_eps(tab, x, t, model_output)
        )
        mean, _, _ = q_posterior_mean_variance(tab, pred_xstart, x, t)
    else:
        raise ValueError(f"unknown mean_type {mean_type!r}")
    return {
        "mean": mean, "variance": var, "log_variance": logvar,
        "pred_xstart": pred_xstart,
    }


# ---------------------------------------------------------------------------
# classifier guidance (gaussian_diffusion.py:363-400) — pairs with the
# EncoderUNetModel classifier (models/encoder_unet.py): cond_grad is
# ∇_x log p(y|x), e.g. jax.grad of the classifier's selected log-prob
# ---------------------------------------------------------------------------

def condition_mean(p_mean_var: Dict[str, jnp.ndarray], cond_grad):
    """Sohl-Dickstein-style guidance: shift the posterior mean by
    variance·∇ log p(y|x)."""
    return {
        **p_mean_var,
        "mean": p_mean_var["mean"] + p_mean_var["variance"] * cond_grad,
    }


def condition_score(tab: GaussianTables, p_mean_var, x, t, cond_grad):
    """Song et al. guidance: condition the score (via eps), then rebuild
    pred_xstart and the posterior mean."""
    ab = _gather(tab.alphas_cumprod, t, x.shape)
    eps = predict_eps_from_xstart(tab, x, t, p_mean_var["pred_xstart"])
    eps = eps - jnp.sqrt(1.0 - ab) * cond_grad
    out = dict(p_mean_var)
    out["pred_xstart"] = predict_xstart_from_eps(tab, x, t, eps)
    out["mean"], _, _ = q_posterior_mean_variance(tab, out["pred_xstart"], x, t)
    return out


# ---------------------------------------------------------------------------
# single steps
# ---------------------------------------------------------------------------

def p_sample(tab, model_output, x, t, rng, **kw):
    """Ancestral step (gaussian_diffusion.py:402-446); no noise at t == 0."""
    out = p_mean_variance(tab, model_output, x, t, **kw)
    noise = jax.random.normal(rng, x.shape, x.dtype)
    nonzero = (t != 0).astype(x.dtype).reshape(-1, *([1] * (x.ndim - 1)))
    sample = out["mean"] + nonzero * jnp.exp(0.5 * out["log_variance"]) * noise
    return {"sample": sample, "pred_xstart": out["pred_xstart"]}


def ddim_sample(tab, model_output, x, t, rng=None, *, eta: float = 0.0, **kw):
    """DDIM step, eq. 12 (gaussian_diffusion.py:544-592)."""
    out = p_mean_variance(tab, model_output, x, t, **kw)
    eps = predict_eps_from_xstart(tab, x, t, out["pred_xstart"])
    ab = _gather(tab.alphas_cumprod, t, x.shape)
    ab_prev = _gather(tab.alphas_cumprod_prev, t, x.shape)
    sigma = eta * jnp.sqrt((1 - ab_prev) / (1 - ab)) * jnp.sqrt(1 - ab / ab_prev)
    mean_pred = (
        out["pred_xstart"] * jnp.sqrt(ab_prev)
        + jnp.sqrt(1 - ab_prev - sigma ** 2) * eps
    )
    if eta == 0.0 or rng is None:
        sample = mean_pred
    else:
        nonzero = (t != 0).astype(x.dtype).reshape(-1, *([1] * (x.ndim - 1)))
        sample = mean_pred + nonzero * sigma * jax.random.normal(rng, x.shape, x.dtype)
    return {"sample": sample, "pred_xstart": out["pred_xstart"]}


def ddim_reverse_sample(tab, model_output, x, t, **kw):
    """DDIM reverse ODE step x_t → x_{t+1}
    (gaussian_diffusion.py:594-631)."""
    out = p_mean_variance(tab, model_output, x, t, **kw)
    eps = predict_eps_from_xstart(tab, x, t, out["pred_xstart"])
    ab_next = _gather(tab.alphas_cumprod_next, t, x.shape)
    mean_pred = out["pred_xstart"] * jnp.sqrt(ab_next) + jnp.sqrt(1 - ab_next) * eps
    return {"sample": mean_pred, "pred_xstart": out["pred_xstart"]}


# ---------------------------------------------------------------------------
# sampling loops — lax.scan over the full T grid (vs the upstream's Python
# loops, gaussian_diffusion.py:448-542/632-714)
# ---------------------------------------------------------------------------

def _loop(step_fn, model_fn, tab, noise, rng, timesteps=None):
    ts = jnp.asarray(
        list(reversed(range(tab.num_timesteps))) if timesteps is None
        else timesteps, jnp.int32,
    )
    bsz = noise.shape[0]

    def body(carry, t_i):
        x, rng = carry
        rng, sub = jax.random.split(rng)
        t = jnp.full((bsz,), t_i, jnp.int32)
        out = step_fn(tab, model_fn(x, t), x, t, sub)
        return (out["sample"], rng), None

    (x, _), _ = jax.lax.scan(body, (noise, rng), ts)
    return x


def p_sample_loop(model_fn, tab, noise, rng, *, timesteps=None, **kw):
    """`timesteps` (descending) restricts the grid — pair with
    `respaced_tables` + `wrap_model_for_respacing` for SpacedDiffusion
    semantics, or pass a raw sub-grid here."""
    return _loop(
        lambda tab, mo, x, t, sub: p_sample(tab, mo, x, t, sub, **kw),
        model_fn, tab, noise, rng, timesteps=timesteps,
    )


def ddim_sample_loop(
    model_fn, tab, noise, rng, *, eta: float = 0.0, timesteps=None, **kw
):
    return _loop(
        lambda tab, mo, x, t, sub: ddim_sample(tab, mo, x, t, sub, eta=eta, **kw),
        model_fn, tab, noise, rng, timesteps=timesteps,
    )


# ---------------------------------------------------------------------------
# likelihoods / VLB (losses.py:12-78, gaussian_diffusion.py:716-904)
# ---------------------------------------------------------------------------

def normal_kl(mean1, logvar1, mean2, logvar2):
    return 0.5 * (
        -1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def _approx_std_normal_cdf(x):
    return 0.5 * (
        1.0 + jnp.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x ** 3))
    )


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of the Gaussian discretized to uint8 bins scaled to
    [-1, 1] (losses.py:49-78)."""
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    cdf_plus = _approx_std_normal_cdf(inv_stdv * (centered + 1.0 / 255.0))
    cdf_min = _approx_std_normal_cdf(inv_stdv * (centered - 1.0 / 255.0))
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, 1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, 1e-12))
    log_delta = jnp.log(jnp.clip(cdf_plus - cdf_min, 1e-12))
    return jnp.where(
        x < -0.999, log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min, log_delta),
    )


def _mean_flat(x):
    return x.reshape(x.shape[0], -1).mean(axis=1)


def vb_terms_bpd(
    tab, model_output, x0, xt, t, *, clip_denoised: bool = True, **kw
) -> Dict[str, jnp.ndarray]:
    """One VLB term in BITS (gaussian_diffusion.py:716-749): KL of the true
    posterior vs the model posterior, or the decoder NLL at t == 0."""
    true_mean, _, true_logvar = q_posterior_mean_variance(tab, x0, xt, t)
    out = p_mean_variance(
        tab, model_output, xt, t, clip_denoised=clip_denoised, **kw
    )
    kl = _mean_flat(
        normal_kl(true_mean, true_logvar, out["mean"], out["log_variance"])
    ) / np.log(2.0)
    decoder_nll = _mean_flat(
        -discretized_gaussian_log_likelihood(
            x0, means=out["mean"], log_scales=0.5 * out["log_variance"]
        )
    ) / np.log(2.0)
    return {
        "output": jnp.where(t == 0, decoder_nll, kl),
        "pred_xstart": out["pred_xstart"],
    }


def training_losses(
    tab: GaussianTables,
    model_fn: Callable,
    x0,
    t,
    noise,
    *,
    mean_type: str = "eps",
    var_type: str = "fixedsmall",
    loss_type: str = "mse",        # 'mse' | 'rescaled_mse' | 'kl' | 'rescaled_kl'
    p2_gamma: float = 0.0,
    p2_k: float = 1.0,
) -> Dict[str, jnp.ndarray]:
    """iDDPM/ADM training losses (gaussian_diffusion.py:751-828) incl. the
    learned-range hybrid objective (VB term with frozen mean) and the P2
    weighting the reference's AFHQ/FFHQ/MetFACE checkpoints were trained
    with."""
    xt = q_sample(tab, x0, t, noise)
    terms: Dict[str, jnp.ndarray] = {}
    if loss_type in ("kl", "rescaled_kl"):
        terms["loss"] = vb_terms_bpd(
            tab, model_fn(xt, t), x0, xt, t,
            clip_denoised=False, mean_type=mean_type, var_type=var_type,
        )["output"]
        if loss_type == "rescaled_kl":
            terms["loss"] = terms["loss"] * tab.num_timesteps
        return terms

    model_output = model_fn(xt, t)
    if var_type in ("learned", "learned_range"):
        c = model_output.shape[-1] // 2
        mean_out, var_values = model_output[..., :c], model_output[..., c:]
        frozen = jnp.concatenate(
            [jax.lax.stop_gradient(mean_out), var_values], axis=-1
        )
        terms["vb"] = vb_terms_bpd(
            tab, frozen, x0, xt, t,
            clip_denoised=False, mean_type=mean_type, var_type=var_type,
        )["output"]
        if loss_type == "rescaled_mse":
            terms["vb"] = terms["vb"] * (tab.num_timesteps / 1000.0)
        model_output = mean_out

    target = {
        "xprev": lambda: q_posterior_mean_variance(tab, x0, xt, t)[0],
        "xstart": lambda: x0,
        "eps": lambda: noise,
    }[mean_type]()
    weight = _gather(1.0 / (p2_k + tab.snr) ** p2_gamma, t, target.shape)
    terms["mse"] = _mean_flat(weight * (target - model_output) ** 2)
    terms["loss"] = terms["mse"] + terms["vb"] if "vb" in terms else terms["mse"]
    return terms


def prior_bpd(tab: GaussianTables, x0):
    """KL(q(x_T | x_0) || N(0, I)) in bits (gaussian_diffusion.py:830-846)."""
    t = jnp.full((x0.shape[0],), tab.num_timesteps - 1, jnp.int32)
    mean, _, logvar = q_mean_variance(tab, x0, t)
    return _mean_flat(normal_kl(mean, logvar, 0.0, 0.0)) / np.log(2.0)


# ---------------------------------------------------------------------------
# timestep respacing (respace.py:63-128) — functional SpacedDiffusion
# ---------------------------------------------------------------------------

def respaced_tables(
    betas: np.ndarray, use_timesteps
) -> Tuple[GaussianTables, np.ndarray]:
    """Retain a subset of the original process's timesteps: new betas are
    derived so alphas_cumprod is preserved at the kept steps
    (respace.py:72-86). Returns (tables over the respaced grid,
    timestep_map: respaced index → original timestep)."""
    keep = set(int(t) for t in use_timesteps)
    acp = np.cumprod(1.0 - np.asarray(betas, np.float64))
    last = 1.0
    new_betas, tmap = [], []
    for i, a in enumerate(acp):
        if i in keep:
            new_betas.append(1.0 - a / last)
            last = a
            tmap.append(i)
    return make_tables(np.asarray(new_betas)), np.asarray(tmap, np.int32)


def wrap_model_for_respacing(
    model_fn: Callable,
    timestep_map: np.ndarray,
    *,
    rescale_timesteps: bool = False,
    original_num_steps: Optional[int] = None,
) -> Callable:
    """_WrappedModel (respace.py:116-128): respaced indices → original
    timesteps before hitting the model."""
    if rescale_timesteps and original_num_steps is None:
        raise ValueError(
            "rescale_timesteps=True requires original_num_steps (the length "
            "of the UNRESPACED schedule — respace.py:128 divides by it)"
        )
    tmap = jnp.asarray(timestep_map)

    def wrapped(x, t, **kw):
        new_t = tmap[t]
        if rescale_timesteps:
            new_t = new_t.astype(jnp.float32) * (1000.0 / original_num_steps)
        return model_fn(x, new_t, **kw)

    return wrapped
