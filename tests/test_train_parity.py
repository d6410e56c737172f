"""Training-trajectory CROSS-parity (VERDICT r1 item 5): the reference's
`run_training` inner loop (diffusion_latent.py:301-354) re-run in torch —
per-timestep SGD, detach points, dual-decode grad path — vs our compiled
`make_train_step` on converted identical weights. Per-step losses and the
final Δ parameters must match.

CLIP/ID terms are weightless in this environment, so the compared loss is
the L1 reconstruction term `l1_w · L1(x0_t, x0_t_origin) · cosine`
(diffusion_latent.py:340,350) — the exact semantics that were previously
only self-tested (detach, per-step optimizer update, asymmetric step).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asyrp_official_tpu.compat.torch_convert import convert_ddpmpp, convert_delta_block
from asyrp_official_tpu.core.schedule import make_schedule, train_seq
from asyrp_official_tpu.models import ddpmpp
from asyrp_official_tpu.models.delta import EditState
from asyrp_official_tpu.models.registry import ModelSpec
from asyrp_official_tpu.pipelines import train as tr

CFG = ddpmpp.DDPMppConfig(
    ch=32, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(16,), resolution=32
)
SPEC = ModelSpec("ddpmpp", CFG, False, "ddpm")
SCHED = make_schedule()

T_EDIT = 400
L1_W = 3.0
COSINE = 0.8
LR = 0.05
BS = 2


def _reference_training(reference_path, seq_train, seq_train_next, x_lat_nchw):
    """The reference inner loop, verbatim semantics (diffusion_latent.py:
    301-354): per-timestep [edited step w/ grad, no-grad plain step,
    loss.backward(), optim.step()], carry detached between steps."""
    import torch
    import torch.nn as nn
    from types import SimpleNamespace
    from models.ddpm.diffusion import DDPM
    from utils.diffusion_utils import denoising_step

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
    torch.manual_seed(1)
    model.setattr_layers(1)
    model.train()
    for p in model.parameters():
        p.requires_grad = False
    for p in model.layer_0.parameters():
        p.requires_grad = True
    optim = torch.optim.SGD(
        model.layer_0.parameters(), lr=LR, weight_decay=0.0
    )  # diffusion_latent.py:201

    betas = torch.from_numpy(SCHED.betas)
    logvar = torch.from_numpy(SCHED.logvar)
    sd0 = {k: v.detach().numpy().copy() for k, v in model.state_dict().items()}

    xt_next = torch.from_numpy(x_lat_nchw.copy())
    x_origin = torch.from_numpy(x_lat_nchw.copy())
    losses = []
    for i, j in zip(reversed(seq_train), reversed(seq_train_next)):
        optim.zero_grad()
        t = torch.full((BS,), float(i))
        tn = torch.full((BS,), float(j))
        xt_next, x0_t, _, _ = denoising_step(
            xt_next.detach(), t=t, t_next=tn, models=model, logvars=logvar,
            b=betas, sampling_type="ddim", eta=0.0, learn_sigma=False,
            index=0, t_edit=T_EDIT, hs_coeff=(1.0, 1.0),
        )
        with torch.no_grad():
            x_origin, x0_t_origin, _, _ = denoising_step(
                x_origin.detach(), t=t, t_next=tn, models=model,
                logvars=logvar, b=betas, sampling_type="ddim", eta=0.0,
                learn_sigma=False,
            )
        loss = L1_W * nn.L1Loss()(x0_t, x0_t_origin) * COSINE
        loss.backward()
        optim.step()
        losses.append(float(loss.detach()))
    sd_fin = {k: v.detach().numpy().copy() for k, v in model.state_dict().items()}
    return sd0, sd_fin, losses


def test_training_trajectory_parity(reference_path):
    seq, seq_next = train_seq(6, 999, T_EDIT)
    assert len(seq) >= 3, seq
    x_lat = (
        np.random.RandomState(0).randn(BS, 3, 32, 32).astype(np.float32) * 0.7
    )

    sd0, sd_fin, ref_losses = _reference_training(
        reference_path, seq, seq_next, x_lat
    )

    params = convert_ddpmpp(sd0, CFG)
    block0 = convert_delta_block(sd0, "layer_0")
    edit = EditState(
        blocks=(jax.tree.map(jnp.asarray, block0),),
        hs_coeff=jnp.array([1.0, 1.0]),
        flavor="ddpm",
    )
    opt = tr.make_optimizer(LR)
    opt_state = opt.init(edit.blocks)
    step = tr.make_train_step(
        SPEC, SCHED, seq, t_edit=T_EDIT, optimizer=opt,
        loss_fn=lambda x0_t, x0_t_origin, x0: tr.default_loss(
            x0_t, x0_t_origin, x0, l1_w=L1_W, cosine=COSINE
        ),
        train_target="blocks",
    )
    x_nhwc = jnp.asarray(np.transpose(x_lat, (0, 2, 3, 1)))
    edit2, opt_state, metrics = step(
        params, edit, opt_state, x_nhwc, x_nhwc, LR
    )

    # per-step losses match the reference's (same step ORDER: high t → low t)
    ours = np.asarray(metrics["loss_per_step"])
    np.testing.assert_allclose(ours, np.asarray(ref_losses), rtol=2e-3, atol=2e-4)

    # final Δ parameters match after len(seq) per-timestep SGD updates
    # (identical pytree structure → leafwise comparison via tree.map)
    ref_block_fin = convert_delta_block(sd_fin, "layer_0")
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-4
        ),
        ref_block_fin,
        jax.tree.map(np.asarray, edit2.blocks[0]),
    )

    # and the training actually moved the params (not a trivial zero-grad run)
    moved = max(
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(
            jax.tree.leaves(block0), jax.tree.leaves(ref_block_fin)
        )
    )
    assert moved > 1e-6, "reference training produced no parameter movement"
