"""DiffStyle input-Δh injection CROSS-parity: the reference's published
main-forward branch (norm-matched slerp, optional spatial mask,
models/ddpm/diffusion.py:517-539) vs our EditState 'input'/'slerp' mode —
the surviving-hook surface style transfer is built on, previously only
self-tested."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asyrp_official_tpu.compat.torch_convert import convert_ddpmpp
from asyrp_official_tpu.models import ddpmpp
from asyrp_official_tpu.models.delta import EditState
from asyrp_official_tpu.models.registry import ModelSpec

CFG = ddpmpp.DDPMppConfig(
    ch=32, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(16,), resolution=32
)
SPEC = ModelSpec("ddpmpp", CFG, False, "ddpm")


def _setup(reference_path):
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
    model.eval()
    params = convert_ddpmpp(
        {k: v.detach().numpy() for k, v in model.state_dict().items()}, CFG
    )
    return model, params


@pytest.mark.parametrize("use_mask", [False, True])
@pytest.mark.parametrize("c0", [0.7, 0.9])
def test_input_delta_slerp_injection_parity(reference_path, use_mask, c0):
    import torch

    model, params = _setup(reference_path)
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 32, 32).astype(np.float32) * 0.5
    # bottleneck at 32px with ch_mult (1,2): 16x16x64
    dh = rng.randn(64, 16, 16).astype(np.float32)  # NCHW row
    t = np.full((2,), 700.0, np.float32)

    # the reference's norm-matching does `delta_h.view(B, -1)` — only
    # well-defined when delta_h is batch-matched (as DiffStyle uses it:
    # the style image's h, models/ddpm/diffusion.py:531-535); feed the
    # same row per sample
    dh_b = np.repeat(dh[None], 2, axis=0)
    with torch.no_grad():
        et, et_mod, _, _ = model(
            torch.from_numpy(x), torch.from_numpy(t), index=0, t_edit=500,
            hs_coeff=(c0, 1.0), delta_h=torch.from_numpy(dh_b),
            use_mask=use_mask,
        )

    edit = EditState(
        mode="input",
        delta_rows=jnp.asarray(np.transpose(dh, (1, 2, 0)))[None],  # [1,h,w,C]
        hs_coeff=jnp.asarray([c0, 1.0]),
        input_style="slerp",
        use_mask=use_mask,
    )
    eps, eps_mod, _, _ = SPEC.apply(
        params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.asarray(t), edit=edit,
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(eps), (0, 3, 1, 2)), et.numpy(),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(eps_mod), (0, 3, 1, 2)), et_mod.numpy(),
        rtol=1e-4, atol=1e-4,
    )
    # the injection must actually change the edited branch
    assert np.abs(np.asarray(eps_mod) - np.asarray(eps)).max() > 1e-4
