"""Full-size checkpoint conversion: the real CelebA-HQ (113.7M) and AFHQ
layouts, verifying the key walk at production depth. Slow — forward parity
runs at a single spatial point budget (one eval each)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asyrp_official_tpu.compat.torch_convert import convert_ddpmpp
from asyrp_official_tpu.models import ddpmpp, openai_unet
from asyrp_official_tpu.models.registry import resolve


@pytest.mark.slow
def test_fullsize_ddpmpp_conversion_and_forward(reference_path):
    import torch
    from types import SimpleNamespace
    from models.ddpm.diffusion import DDPM

    config = SimpleNamespace(
        model=SimpleNamespace(
            ch=128, out_ch=3, ch_mult=[1, 1, 2, 2, 4, 4], num_res_blocks=2,
            attn_resolutions=[16], dropout=0.0, in_channels=3,
            resamp_with_conv=True,
        ),
        data=SimpleNamespace(image_size=256),
    )
    torch.manual_seed(0)
    model = DDPM(config)
    model.eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    spec = resolve("CelebA_HQ")
    params = spec.params_from_torch(sd)
    n = sum(x.size for x in jax.tree.leaves(params))
    n_t = sum(v.size for v in sd.values())
    assert n == n_t, (n, n_t)  # every tensor converted, none invented

    x = np.random.RandomState(0).randn(1, 3, 256, 256).astype(np.float32)
    t_np = np.array([500.0], np.float32)
    with torch.no_grad():
        et, *_ = model(torch.from_numpy(x), torch.from_numpy(t_np), index=None)
    eps, *_ = spec.apply(
        params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), jnp.asarray(t_np)
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(eps), (0, 3, 1, 2)), et.numpy(),
        rtol=1e-3, atol=1e-3,
    )


@pytest.mark.slow
def test_fullsize_afhq_conversion(reference_path):
    """AFHQ/iDDPM full layout: conversion key-walk + plan agreement only
    (a 256² forward of this family is covered at small size elsewhere)."""
    import torch
    from models.improved_ddpm.script_util import i_DDPM

    torch.manual_seed(0)
    model = i_DDPM("AFHQ")
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    spec = resolve("AFHQ")
    params = spec.params_from_torch(sd)
    n = sum(x.size for x in jax.tree.leaves(params))
    n_t = sum(v.size for v in sd.values())
    assert n == n_t, (n, n_t)


def test_load_state_dict_numpy_jit_archive(tmp_path):
    """The OpenAI CLIP release ships TorchScript archives — the loader must
    read them like `clip.load` does (losses/clip_loss.py:35)."""
    import torch

    from asyrp_official_tpu.compat.torch_convert import load_state_dict_numpy

    class M(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.lin = torch.nn.Linear(4, 3)

    p = str(tmp_path / "m.pt")
    torch.jit.save(torch.jit.script(M()), p)
    sd = load_state_dict_numpy(p)
    assert sd["lin.weight"].shape == (3, 4)
