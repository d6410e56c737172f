"""Random-weight parity: our JAX UNets vs the torch reference models.

Builds small torch reference models (random init), converts their
state_dicts with compat.torch_convert, and compares forward outputs — the
strongest possible check that architecture + conversion are both right.
"""
import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax

from parity_utils import randomize_zero_params

from asyrp_official_tpu.models import ddpmpp, openai_unet
from asyrp_official_tpu.models.delta import EditState
from asyrp_official_tpu.compat.torch_convert import (
    convert_ddpmpp,
    convert_delta_block,
)


def _nhwc(x_nchw):
    return jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))


def _nchw(x_nhwc):
    return np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2))


def _sd_numpy(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


# ---------------------------------------------------------------------------
# DDPM++
# ---------------------------------------------------------------------------


def _small_ddpmpp_torch(reference_path):
    import torch
    from types import SimpleNamespace

    from models.ddpm.diffusion import DDPM

    config = SimpleNamespace(
        model=SimpleNamespace(
            ch=32,
            out_ch=3,
            ch_mult=[1, 2],
            num_res_blocks=2,
            attn_resolutions=[16],
            dropout=0.0,
            in_channels=3,
            resamp_with_conv=True,
        ),
        data=SimpleNamespace(image_size=32),
    )
    torch.manual_seed(0)
    model = DDPM(config)
    model.eval()
    return model


SMALL_CFG = ddpmpp.DDPMppConfig(
    ch=32, ch_mult=(1, 2), num_res_blocks=2, attn_resolutions=(16,), resolution=32
)


def test_ddpmpp_forward_parity(reference_path):
    import torch

    model = _small_ddpmpp_torch(reference_path)
    params = convert_ddpmpp(_sd_numpy(model), SMALL_CFG)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 32, 32).astype(np.float32)
    t_np = np.array([241.0, 241.0], np.float32)

    with torch.no_grad():
        et, h2, dh, mid = model(
            torch.from_numpy(x), torch.from_numpy(t_np), index=None
        )
    eps, eps_mod, delta_h, middle_h = ddpmpp.apply(
        params, SMALL_CFG, _nhwc(x), jnp.asarray(t_np)
    )
    assert eps_mod is None and h2 is None
    np.testing.assert_allclose(_nchw(eps), et.numpy(), rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(_nchw(middle_h), mid.numpy(), rtol=1e-4, atol=2e-4)


@pytest.mark.parametrize("t_val,active", [(241.0, True), (50.0, False)])
def test_ddpmpp_deltablock_edit_parity(reference_path, t_val, active):
    import torch

    model = _small_ddpmpp_torch(reference_path)
    torch.manual_seed(1)
    model.setattr_layers(1)
    model.eval()
    sd = _sd_numpy(model)
    params = convert_ddpmpp(sd, SMALL_CFG)
    block = convert_delta_block(sd, "layer_0")

    rng = np.random.RandomState(1)
    x = rng.randn(2, 3, 32, 32).astype(np.float32)
    t_np = np.full((2,), t_val, np.float32)

    with torch.no_grad():
        et, et_mod, dh, mid = model(
            torch.from_numpy(x),
            torch.from_numpy(t_np),
            index=0,
            t_edit=100,
            hs_coeff=(1.0, 1.0),
        )

    edit = EditState(
        blocks=(jax.tree.map(jnp.asarray, block),),
        hs_coeff=jnp.array([1.0, 1.0]),
        use_delta=jnp.asarray(1.0 if active else 0.0),
        flavor="ddpm",
    )
    eps, eps_mod, delta_h, middle_h = ddpmpp.apply(
        params, SMALL_CFG, _nhwc(x), jnp.asarray(t_np), edit=edit
    )
    np.testing.assert_allclose(_nchw(eps), et.numpy(), rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(_nchw(eps_mod), et_mod.numpy(), rtol=1e-4, atol=3e-4)
    if active:
        np.testing.assert_allclose(_nchw(delta_h), dh.numpy(), rtol=1e-4, atol=2e-4)
    else:
        # below t_edit both decoders see the same h → identical outputs
        np.testing.assert_allclose(_nchw(eps_mod), et.numpy(), rtol=1e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# OpenAI UNet (iDDPM + ADM)
# ---------------------------------------------------------------------------


SMALL_OAI = openai_unet.OpenAIUNetConfig(
    image_size=32,
    model_channels=32,
    out_channels=6,
    num_res_blocks=1,
    attention_ds=(2,),
    channel_mult=(1, 2),
    num_heads=4,
    num_head_channels=16,
    use_scale_shift_norm=True,
    resblock_updown=True,
)


def _small_openai_torch(reference_path, module, new_order=False, scale_shift=True,
                        updown=True):
    import torch

    torch.manual_seed(0)
    model = module.UNetModel(
        image_size=32,
        in_channels=3,
        model_channels=32,
        out_channels=6,
        num_res_blocks=1,
        attention_resolutions=(2,),
        dropout=0.0,
        channel_mult=(1, 2),
        num_classes=None,
        use_checkpoint=False,
        use_fp16=False,
        num_heads=4,
        num_head_channels=16,
        num_heads_upsample=-1,
        use_scale_shift_norm=scale_shift,
        resblock_updown=updown,
        use_new_attention_order=new_order,
    )
    # zero_module'd branches (resblock out convs, attn proj_out, final out
    # conv) make a fresh-init model output bitwise 0 — randomize them so
    # the comparisons below exercise the full network (parity_utils)
    assert randomize_zero_params(model) > 0
    model.eval()
    return model


@pytest.mark.parametrize("family", ["improved_ddpm", "guided_diffusion"])
@pytest.mark.parametrize("new_order", [False, True])
def test_openai_forward_parity(reference_path, family, new_order):
    import importlib
    import torch

    module = importlib.import_module(f"models.{family}.unet")
    model = _small_openai_torch(reference_path, module, new_order=new_order)
    cfg = openai_unet.OpenAIUNetConfig(
        **{**SMALL_OAI.__dict__, "use_new_attention_order": new_order}
    )
    params = openai_unet.params_from_torch(_sd_numpy(model), cfg)

    rng = np.random.RandomState(2)
    x = rng.randn(2, 3, 32, 32).astype(np.float32)
    t_np = np.array([500.0, 500.0], np.float32)

    with torch.no_grad():
        et, h2, dh, mid = model(
            torch.from_numpy(x), torch.from_numpy(t_np), index=None
        )
    eps, eps_mod, delta_h, middle_h = openai_unet.apply(
        params, cfg, _nhwc(x), jnp.asarray(t_np)
    )
    assert eps.shape[-1] == 6  # learn_sigma channels preserved
    np.testing.assert_allclose(_nchw(eps), et.numpy(), rtol=1e-4, atol=3e-4)
    np.testing.assert_allclose(_nchw(middle_h), mid.numpy(), rtol=1e-4, atol=3e-4)


def test_openai_deltablock_edit_parity(reference_path):
    import torch
    from models.improved_ddpm import unet as iunet

    model = _small_openai_torch(reference_path, iunet)
    torch.manual_seed(3)
    model.setattr_layers(1)
    model.eval()
    sd = _sd_numpy(model)
    params = openai_unet.params_from_torch(sd, SMALL_OAI)
    block = convert_delta_block(sd, "layer_0")
    assert "in_norm" in block  # openai flavor detected

    rng = np.random.RandomState(3)
    x = rng.randn(2, 3, 32, 32).astype(np.float32)
    t_np = np.array([700.0, 700.0], np.float32)

    with torch.no_grad():
        et, et_mod, dh, mid = model(
            torch.from_numpy(x),
            torch.from_numpy(t_np),
            index=0,
            t_edit=400,
            hs_coeff=(1.0, 1.0),
        )
    edit = EditState(
        blocks=(jax.tree.map(jnp.asarray, block),),
        hs_coeff=jnp.array([1.0, 1.0]),
        use_delta=jnp.asarray(1.0),
        flavor="openai",
    )
    eps, eps_mod, delta_h, middle_h = openai_unet.apply(
        params, SMALL_OAI, _nhwc(x), jnp.asarray(t_np), edit=edit
    )
    np.testing.assert_allclose(_nchw(eps), et.numpy(), rtol=1e-4, atol=3e-4)
    np.testing.assert_allclose(_nchw(eps_mod), et_mod.numpy(), rtol=1e-4, atol=5e-4)
    np.testing.assert_allclose(_nchw(delta_h), dh.numpy(), rtol=1e-4, atol=3e-4)


def test_openai_non_scale_shift_non_updown(reference_path):
    import torch
    from models.improved_ddpm import unet as iunet

    model = _small_openai_torch(
        reference_path, iunet, scale_shift=False, updown=False
    )
    cfg = openai_unet.OpenAIUNetConfig(
        **{
            **SMALL_OAI.__dict__,
            "use_scale_shift_norm": False,
            "resblock_updown": False,
        }
    )
    params = openai_unet.params_from_torch(_sd_numpy(model), cfg)
    rng = np.random.RandomState(4)
    x = rng.randn(1, 3, 32, 32).astype(np.float32)
    t_np = np.array([123.0], np.float32)
    with torch.no_grad():
        et, *_ = model(torch.from_numpy(x), torch.from_numpy(t_np), index=None)
    eps, *_ = openai_unet.apply(params, cfg, _nhwc(x), jnp.asarray(t_np))
    np.testing.assert_allclose(_nchw(eps), et.numpy(), rtol=1e-4, atol=3e-4)


def test_ddpmpp_forward_parity_no_resamp_conv(reference_path):
    """resamp_with_conv=False: parameter-free avg-pool / nearest resampling
    (models/ddpm/diffusion.py:73-113). The flag was previously accepted but
    ignored — a converted with_conv=False checkpoint silently skipped
    resampling entirely."""
    import torch
    from types import SimpleNamespace

    from models.ddpm.diffusion import DDPM

    config = SimpleNamespace(
        model=SimpleNamespace(
            ch=32, out_ch=3, ch_mult=[1, 2], num_res_blocks=1,
            attn_resolutions=[16], dropout=0.0, in_channels=3,
            resamp_with_conv=False,
        ),
        data=SimpleNamespace(image_size=32),
    )
    torch.manual_seed(0)
    model = DDPM(config)
    model.eval()

    cfg = ddpmpp.DDPMppConfig(
        ch=32, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(16,),
        resolution=32, resamp_with_conv=False,
    )
    params = convert_ddpmpp(_sd_numpy(model), cfg)
    # init must agree structurally with the converted tree (no conv keys)
    init_p = ddpmpp.init(jax.random.PRNGKey(0), cfg)
    assert jax.tree.structure(init_p) == jax.tree.structure(
        jax.tree.map(jnp.asarray, params)
    )

    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, 32, 32).astype(np.float32)
    t_np = np.array([241.0], np.float32)
    with torch.no_grad():
        et, *_ = model(torch.from_numpy(x), torch.from_numpy(t_np), index=None)
    eps, *_ = ddpmpp.apply(params, cfg, _nhwc(x), jnp.asarray(t_np))
    np.testing.assert_allclose(_nchw(eps), et.numpy(), rtol=1e-4, atol=2e-4)


def test_bottleneck_hw_from_actual_architecture():
    """ModelSpec.bottleneck_hw derives the h-space size from the RESOLVED
    architecture: OpenAI-family ymls carry stale SDEdit model sections
    that spec_from_config ignores, so the runner must not read
    config['model']['ch_mult'] for the delta-row geometry (all reference
    families bottleneck at 512ch x 8x8 @256px, SURVEY.md §0)."""
    from asyrp_official_tpu.models.registry import resolve

    for ds in ("CelebA_HQ", "AFHQ", "IMAGENET", "MetFACE"):
        assert resolve(ds).bottleneck_hw == 8, ds
