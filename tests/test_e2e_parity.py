"""End-to-end numerical parity: our compiled engines vs the torch reference
running its own denoising_step loop on the same random-weight model.

This catches wiring bugs the per-module parity tests can't: schedule
gathers, step-table ordering, learn_sigma splits, edit gating, scaling.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asyrp_official_tpu.compat.torch_convert import convert_ddpmpp, convert_delta_block
from asyrp_official_tpu.core.schedule import make_schedule, uniform_seq
from asyrp_official_tpu.models import ddpmpp
from asyrp_official_tpu.models.delta import EditState
from asyrp_official_tpu.models.registry import ModelSpec
from asyrp_official_tpu.pipelines import engine

CFG = ddpmpp.DDPMppConfig(
    ch=32, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(16,), resolution=32
)
SPEC = ModelSpec("ddpmpp", CFG, False, "ddpm")
SCHED = make_schedule()


def _torch_setup(reference_path, with_delta=False):
    import torch
    from types import SimpleNamespace
    from models.ddpm.diffusion import DDPM

    config = SimpleNamespace(
        model=SimpleNamespace(
            ch=32, out_ch=3, ch_mult=[1, 2], num_res_blocks=1,
            attn_resolutions=[16], dropout=0.0, in_channels=3,
            resamp_with_conv=True,
        ),
        data=SimpleNamespace(image_size=32),
    )
    torch.manual_seed(0)
    model = DDPM(config)
    if with_delta:
        torch.manual_seed(1)
        model.setattr_layers(1)
    model.eval()
    return model


def _torch_chain(reference_path, model, x0_nchw, seq, *, invert, index=None,
                 t_edit=0, hs_coeff=(1.0, 1.0)):
    """Run the REFERENCE denoising_step loop (utils/diffusion_utils.py)."""
    import torch
    from utils.diffusion_utils import denoising_step

    betas = torch.from_numpy(SCHED.betas)
    logvar = torch.from_numpy(SCHED.logvar)
    x = torch.from_numpy(x0_nchw)
    seq_next = [-1] + list(seq[:-1])
    if invert:
        pairs = list(zip(seq_next[1:], seq[1:]))  # ascending
    else:
        pairs = list(zip(reversed(seq), reversed(seq_next)))
    with torch.no_grad():
        for i, j in pairs:
            t = torch.full((x.shape[0],), float(i))
            tn = torch.full((x.shape[0],), float(j))
            x, _, _, _ = denoising_step(
                x, t=t, t_next=tn, models=model, logvars=logvar, b=betas,
                sampling_type="ddim", eta=0.0, learn_sigma=False,
                index=index, t_edit=t_edit, hs_coeff=hs_coeff,
            )
    return x.numpy()


def test_inversion_chain_parity(reference_path):
    model = _torch_setup(reference_path)
    params = convert_ddpmpp(
        {k: v.detach().numpy() for k, v in model.state_dict().items()}, CFG
    )
    seq = uniform_seq(5, 999)
    x0 = np.random.RandomState(0).randn(2, 3, 32, 32).astype(np.float32) * 0.5

    ref = _torch_chain(reference_path, model, x0, seq, invert=True)
    invert = engine.make_invert(SPEC, SCHED, seq)
    ours, _ = invert(params, jnp.asarray(np.transpose(x0, (0, 2, 3, 1))))
    np.testing.assert_allclose(
        np.transpose(np.asarray(ours), (0, 3, 1, 2)), ref, rtol=2e-3, atol=2e-3
    )


def test_generation_chain_parity(reference_path):
    model = _torch_setup(reference_path)
    params = convert_ddpmpp(
        {k: v.detach().numpy() for k, v in model.state_dict().items()}, CFG
    )
    seq = uniform_seq(5, 999)
    x_lat = np.random.RandomState(1).randn(1, 3, 32, 32).astype(np.float32)

    ref = _torch_chain(reference_path, model, x_lat, seq, invert=False)
    gen = engine.make_generate(SPEC, SCHED, seq)
    ours, _ = gen(
        params, jnp.asarray(np.transpose(x_lat, (0, 2, 3, 1))), jax.random.PRNGKey(0)
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(ours), (0, 3, 1, 2)), ref, rtol=2e-3, atol=2e-3
    )


def test_eta_and_ddpm_step_vs_real_reference(reference_path, monkeypatch):
    """The stochastic branches — eta=1.0 DDIM (quality boost, t < t_addnoise)
    and the DDPM ancestral step — against the ACTUAL reference
    `denoising_step` (utils/diffusion_utils.py:74-97), not a test-local
    re-transcription of its formula. The random draw is pinned by
    monkeypatching torch.randn_like so both sides use the same noise."""
    import torch
    from utils.diffusion_utils import denoising_step

    from asyrp_official_tpu.core.ddim import ddim_step, ddpm_step

    model = _torch_setup(reference_path)
    rng = np.random.RandomState(4)
    x = rng.randn(2, 3, 32, 32).astype(np.float32) * 0.5
    noise = rng.randn(2, 3, 32, 32).astype(np.float32)
    ti, tj = 500, 400
    monkeypatch.setattr(
        torch, "randn_like", lambda _x: torch.from_numpy(noise)
    )

    betas = torch.from_numpy(SCHED.betas)
    logvar = torch.from_numpy(SCHED.logvar)
    xt = torch.from_numpy(x)
    tt = torch.full((2,), float(ti))
    tn = torch.full((2,), float(tj))
    with torch.no_grad():
        et = model(xt, tt, index=None)[0].numpy()
        ref_eta, ref_x0, _, _ = denoising_step(
            xt, t=tt, t_next=tn, models=model, logvars=logvar, b=betas,
            sampling_type="ddim", eta=1.0, learn_sigma=False,
        )
        # the reference's ddpm branch computes xt_next but CRASHES at its
        # own return (x0_t is never bound in that branch — an upstream bug,
        # utils/diffusion_utils.py:77-82 vs :104); recover the computed
        # xt_next from the crashing frame so we still compare against the
        # reference's real arithmetic, not a transcription of it
        def _ref_ddpm(t_tensor):
            try:
                out = denoising_step(
                    xt, t=t_tensor, t_next=tn, models=model, logvars=logvar,
                    b=betas, sampling_type="ddpm", learn_sigma=False,
                )
                return out[0]  # in case upstream ever fixes the bug
            except UnboundLocalError as e:
                tb = e.__traceback__
                while tb.tb_next:
                    tb = tb.tb_next
                return tb.tb_frame.f_locals["xt_next"]

        ref_ddpm = _ref_ddpm(tt)
        ref_ddpm0 = _ref_ddpm(torch.zeros(2))

    nhwc = lambda a: jnp.asarray(np.transpose(a, (0, 2, 3, 1)))
    nchw = lambda a: np.transpose(np.asarray(a), (0, 3, 1, 2))
    eps = nhwc(et)
    at = jnp.full((2,), SCHED.alphas_cumprod[ti])
    at_next = jnp.full((2,), SCHED.alphas_cumprod[tj])

    ours_eta, ours_x0 = ddim_step(
        nhwc(x), eps, eps, at, at_next, jnp.float32(1.0), nhwc(noise)
    )
    np.testing.assert_allclose(nchw(ours_eta), ref_eta.numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(nchw(ours_x0), ref_x0.numpy(), rtol=2e-4, atol=2e-4)

    bt = jnp.full((2,), SCHED.betas[ti])
    lv = jnp.full((2,), SCHED.logvar[ti])
    ours_ddpm = ddpm_step(
        nhwc(x), eps, lv, bt, at, jnp.full((2,), ti), nhwc(noise)
    )
    np.testing.assert_allclose(nchw(ours_ddpm), ref_ddpm.numpy(), rtol=2e-4, atol=2e-4)

    # t == 0 masks the ancestral noise on both sides (reference mask line)
    with torch.no_grad():
        et0 = model(xt, torch.zeros(2), index=None)[0].numpy()
    ours_ddpm0 = ddpm_step(
        nhwc(x), nhwc(et0), jnp.full((2,), SCHED.logvar[0]),
        jnp.full((2,), SCHED.betas[0]), jnp.full((2,), SCHED.alphas_cumprod[0]),
        jnp.zeros((2,)), nhwc(noise),
    )
    np.testing.assert_allclose(nchw(ours_ddpm0), ref_ddpm0.numpy(), rtol=2e-4, atol=2e-4)


def test_edited_generation_chain_parity(reference_path):
    """The full Asyrp asymmetric edit over a trajectory — reference loop with
    index=0 + DeltaBlock vs our compiled edit engine."""
    model = _torch_setup(reference_path, with_delta=True)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_ddpmpp(sd, CFG)
    block = convert_delta_block(sd, "layer_0")
    seq = uniform_seq(5, 999)
    t_edit = 400
    x_lat = np.random.RandomState(2).randn(1, 3, 32, 32).astype(np.float32)

    ref = _torch_chain(
        reference_path, model, x_lat, seq, invert=False, index=0,
        t_edit=t_edit, hs_coeff=(1.0, 1.0),
    )
    edit = EditState(
        blocks=(jax.tree.map(jnp.asarray, block),),
        hs_coeff=jnp.array([1.0, 1.0]),
        flavor="ddpm",
    )
    run = engine.make_edit_generate(SPEC, SCHED, seq, t_edit=t_edit)
    ours, _ = run(
        params, edit, jnp.asarray(np.transpose(x_lat, (0, 2, 3, 1))),
        jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(ours), (0, 3, 1, 2)), ref, rtol=2e-3, atol=2e-3
    )


def test_learn_sigma_chain_parity_vs_real_reference(reference_path):
    """learn_sigma CHAINS through the reference's own denoising_step: every
    prior chain test runs the DDPM++ family (learn_sigma=False), so the
    6->3+3 channel split (utils/diffusion_utils.py:47-51) was pinned only
    per-step. Here a tiny iDDPM UNetModel runs the reference loop for both
    inversion and the edited asymmetric generation (index=0, openai-flavor
    DeltaBlock) with learn_sigma=True, vs our compiled openai-family
    engines."""
    import torch
    from models.improved_ddpm import unet as iunet
    from utils.diffusion_utils import denoising_step

    from asyrp_official_tpu.compat.torch_convert import convert_delta_block
    from asyrp_official_tpu.models import openai_unet

    torch.manual_seed(0)
    model = iunet.UNetModel(
        image_size=32, in_channels=3, model_channels=32, out_channels=6,
        num_res_blocks=1, attention_resolutions=(2,), dropout=0.0,
        channel_mult=(1, 2), num_classes=None, use_checkpoint=False,
        use_fp16=False, num_heads=4, num_head_channels=16,
        num_heads_upsample=-1, use_scale_shift_norm=True,
        resblock_updown=True, use_new_attention_order=False,
    )
    from parity_utils import randomize_zero_params

    # a fresh-init OpenAI UNet outputs bitwise 0 through every
    # zero_module'd branch — randomize so the chains exercise the network
    assert randomize_zero_params(model) > 0
    torch.manual_seed(3)
    model.setattr_layers(1)
    model.eval()

    cfg = openai_unet.OpenAIUNetConfig(
        image_size=32, model_channels=32, out_channels=6, num_res_blocks=1,
        attention_ds=(2,), channel_mult=(1, 2), num_heads=4,
        num_head_channels=16, use_scale_shift_norm=True, resblock_updown=True,
    )
    spec = ModelSpec("openai", cfg, True, "openai")
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = spec.params_from_torch(sd)
    block = convert_delta_block(sd, "layer_0")
    assert "in_norm" in block  # openai flavor

    seq = uniform_seq(5, 999)
    seq_next = [-1] + list(seq[:-1])
    betas = torch.from_numpy(SCHED.betas)
    logvar = torch.from_numpy(SCHED.logvar)
    x0 = np.random.RandomState(7).randn(1, 3, 32, 32).astype(np.float32)

    def ref_chain(x_np, *, invert, index=None, t_edit=0):
        x = torch.from_numpy(x_np)
        if invert:
            pairs = list(zip(seq_next[1:], seq[1:]))
        else:
            pairs = list(zip(reversed(seq), reversed(seq_next)))
        with torch.no_grad():
            for i, j in pairs:
                x, _, _, _ = denoising_step(
                    x, t=torch.full((1,), float(i)),
                    t_next=torch.full((1,), float(j)), models=model,
                    logvars=logvar, b=betas, sampling_type="ddim", eta=0.0,
                    learn_sigma=True, index=index, t_edit=t_edit,
                    hs_coeff=(1.0, 1.0),
                )
        return x.numpy()

    nhwc = lambda a: jnp.asarray(np.transpose(a, (0, 2, 3, 1)))  # noqa: E731
    nchw = lambda a: np.transpose(np.asarray(a), (0, 3, 1, 2))  # noqa: E731

    # inversion chain (the precompute path, diffusion_latent.py:1033-1045)
    ref_lat = ref_chain(x0, invert=True)
    inv = engine.make_invert(spec, SCHED, seq)
    our_lat, _ = inv(params, nhwc(x0))
    np.testing.assert_allclose(nchw(our_lat), ref_lat, rtol=2e-3, atol=2e-3)

    # edited asymmetric generation from the shared latent
    t_edit = 400
    ref_gen = ref_chain(ref_lat, invert=False, index=0, t_edit=t_edit)
    edit = EditState(
        blocks=(jax.tree.map(jnp.asarray, block),),
        hs_coeff=jnp.array([1.0, 1.0]),
        flavor="openai",
    )
    run = engine.make_edit_generate(spec, SCHED, seq, t_edit=t_edit)
    ours, _ = run(params, edit, nhwc(ref_lat), jax.random.PRNGKey(0))
    np.testing.assert_allclose(nchw(ours), ref_gen, rtol=2e-3, atol=2e-3)
