"""EncoderUNetModel (classifier half-UNet, all four pool heads) and
SuperResModel vs the reference guided_diffusion modules
(models/guided_diffusion/unet.py:860-1088) on converted identical weights."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from parity_utils import randomize_zero_params

from asyrp_official_tpu.models import openai_unet
from asyrp_official_tpu.models.encoder_unet import (
    EncoderUNetConfig,
    encoder_apply,
    encoder_init,
    encoder_params_from_torch,
    superres_apply,
    superres_config,
)

TINY = dict(
    image_size=32, in_channels=3, model_channels=32, out_channels=10,
    num_res_blocks=1, channel_mult=(1, 2), num_head_channels=16,
    use_scale_shift_norm=True, resblock_updown=True, dropout=0.0,
)


def _ref_encoder(reference_path, pool):
    import torch
    from models.guided_diffusion.unet import EncoderUNetModel

    torch.manual_seed(0)
    m = EncoderUNetModel(
        image_size=32, in_channels=3, model_channels=32, out_channels=10,
        num_res_blocks=1, attention_resolutions=(2,),  # ds=2 → 16px
        channel_mult=(1, 2), num_head_channels=16,
        use_scale_shift_norm=True, resblock_updown=True, pool=pool,
    )
    # light up zero_module'd branches — a fresh-init encoder's residual
    # paths (and for adaptive/spatial pools the head itself) output 0
    assert randomize_zero_params(m) > 0
    m.eval()
    return m


def _cfg(pool):
    return EncoderUNetConfig(attention_ds=(2,), pool=pool, **TINY)


@pytest.mark.parametrize("pool", ["adaptive", "attention", "spatial", "spatial_v2"])
def test_encoder_unet_parity(reference_path, pool):
    import torch

    m = _ref_encoder(reference_path, pool)
    cfg = _cfg(pool)
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    params = encoder_params_from_torch(sd, cfg)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 32, 32).astype(np.float32) * 0.5
    t = np.array([300.0, 700.0], np.float32)

    with torch.no_grad():
        ref = m(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    ours = np.asarray(
        encoder_apply(
            params, cfg, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
            jnp.asarray(t),
        )
    )
    assert ours.shape == ref.shape == (2, 10)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)
    if pool != "adaptive":  # adaptive head is zero-init → zero logits
        assert np.abs(ref).max() > 1e-4


def test_encoder_init_matches_converted_structure(reference_path):
    """Fresh init produces the same pytree structure the converter does."""
    pool = "attention"
    m = _ref_encoder(reference_path, pool)
    cfg = _cfg(pool)
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    conv = encoder_params_from_torch(sd, cfg)
    ours = encoder_init(jax.random.PRNGKey(0), cfg)
    ta = jax.tree_util.tree_structure(conv)
    tb = jax.tree_util.tree_structure(ours)
    assert ta == tb
    for a, b in zip(jax.tree.leaves(conv), jax.tree.leaves(ours)):
        assert a.shape == b.shape, (a.shape, b.shape)


def test_superres_parity(reference_path):
    import torch
    from models.guided_diffusion.unet import SuperResModel

    torch.manual_seed(0)
    m = SuperResModel(
        image_size=32, in_channels=3, model_channels=32, out_channels=3,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_head_channels=16, use_scale_shift_norm=True, resblock_updown=True,
    )
    m.eval()
    cfg = superres_config(openai_unet.OpenAIUNetConfig(
        attention_ds=(2,), out_channels=3, **{
            k: v for k, v in TINY.items() if k != "out_channels"
        },
    ))
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    params = openai_unet.params_from_torch(sd, cfg)

    rng = np.random.RandomState(1)
    x = rng.randn(2, 3, 32, 32).astype(np.float32)
    low = rng.randn(2, 3, 16, 16).astype(np.float32)
    t = np.array([100.0, 900.0], np.float32)
    with torch.no_grad():
        ref, *_ = m(torch.from_numpy(x), torch.from_numpy(t),
                    low_res=torch.from_numpy(low))
    if hasattr(ref, "numpy"):
        ref = ref.numpy()
    ours, *_ = superres_apply(
        params, cfg, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.asarray(t), jnp.asarray(np.transpose(low, (0, 2, 3, 1))),
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(ours), (0, 3, 1, 2)), ref,
        rtol=2e-4, atol=2e-4,
    )
