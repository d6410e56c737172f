"""RN50 ModifiedResNet tower: shapes, differentiability, converter layout."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asyrp_official_tpu.losses import clip_resnet as rn


TINY = rn.RN50Config(layers=(1, 1, 1, 1), width=16, embed_dim=32, heads=4,
                     image_resolution=64)

@pytest.mark.slow
def test_encode_shapes_and_grad():
    params = rn.init(jax.random.PRNGKey(0), TINY)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3).astype(np.float32))
    feats = rn.encode_image(params, TINY, x)
    assert feats.shape == (2, 32)
    g = jax.grad(lambda im: rn.encode_image(params, TINY, im).sum())(x)
    assert bool(jnp.isfinite(g).all()) and float(jnp.abs(g).max()) > 0


def test_stage_downsampling():
    """stem /4, layers 2-4 stride 2 each → /32 total before attnpool."""
    params = rn.init(jax.random.PRNGKey(1), TINY)
    # attnpool positional embedding sized for (res/32)^2 + 1
    assert params["attnpool"]["pos"].shape[0] == (64 // 32) ** 2 + 1


def test_converter_synthetic_sd():
    cfg = TINY
    # build a synthetic OpenAI-layout state_dict with correct shapes
    sd = {}
    w = cfg.width

    def add_conv(k, cin, cout, ks):
        sd[f"visual.{k}.weight"] = np.zeros((cout, cin, ks, ks), np.float32)

    def add_bn(k, c):
        for suf, v in [("weight", 1), ("bias", 0), ("running_mean", 0), ("running_var", 1)]:
            sd[f"visual.{k}.{suf}"] = np.full((c,), v, np.float32)

    add_conv("conv1", 3, w // 2, 3); add_bn("bn1", w // 2)
    add_conv("conv2", w // 2, w // 2, 3); add_bn("bn2", w // 2)
    add_conv("conv3", w // 2, w, 3); add_bn("bn3", w)
    inplanes = w
    for li, n in enumerate(cfg.layers):
        planes = w * 2 ** li
        for bi in range(n):
            b = f"layer{li+1}.{bi}"
            add_conv(f"{b}.conv1", inplanes, planes, 1); add_bn(f"{b}.bn1", planes)
            add_conv(f"{b}.conv2", planes, planes, 3); add_bn(f"{b}.bn2", planes)
            add_conv(f"{b}.conv3", planes, planes * 4, 1); add_bn(f"{b}.bn3", planes * 4)
            if (li > 0 and bi == 0) or inplanes != planes * 4:
                # real OpenAI layout: avgpool("-1") has no params →
                # conv is downsample.0, bn is downsample.1
                add_conv(f"{b}.downsample.0", inplanes, planes * 4, 1)
                add_bn(f"{b}.downsample.1", planes * 4)
            inplanes = planes * 4
    c = w * 32
    sd["visual.attnpool.positional_embedding"] = np.zeros(
        (cfg.spacial_dim ** 2 + 1, c), np.float32
    )
    for kk in ("q_proj", "k_proj", "v_proj"):
        sd[f"visual.attnpool.{kk}.weight"] = np.zeros((c, c), np.float32)
        sd[f"visual.attnpool.{kk}.bias"] = np.zeros((c,), np.float32)
    sd["visual.attnpool.c_proj.weight"] = np.zeros((cfg.embed_dim, c), np.float32)
    sd["visual.attnpool.c_proj.bias"] = np.zeros((cfg.embed_dim,), np.float32)

    params = rn.params_from_torch(sd, cfg)
    out = rn.encode_image(
        params, cfg, jnp.zeros((1, 64, 64, 3))
    )
    assert out.shape == (1, 32)


def test_texture_loss_through_rn50_context():
    """texture_loss documents 'MSE between CNN (RN50) encodings' — a
    CLIPContext built from clip_resnet params/config must work through
    encode_images (it hardcoded the ViT layout before)."""
    import numpy as np

    from asyrp_official_tpu.losses import clip_loss as cl

    params = rn.init(jax.random.PRNGKey(0), TINY)
    ctx = cl.CLIPContext(params=params, cfg=TINY)
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(1, 32, 32, 3), jnp.float32)
    b = jnp.asarray(rng.randn(1, 32, 32, 3), jnp.float32)
    loss = cl.texture_loss(ctx, a, b)
    assert jnp.isfinite(loss) and float(loss) > 0
    assert float(cl.texture_loss(ctx, a, a)) == 0.0
