"""ID loss (ArcFace) parity vs torch reference; LPIPS properties; image IO."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asyrp_official_tpu.losses import id_loss as idl
from asyrp_official_tpu.losses import lpips_jax


def test_irse50_block_table():
    assert len(idl.IRSE50_BLOCKS) == 3 + 4 + 14 + 3
    assert idl.IRSE50_BLOCKS[0] == (64, 64, 2)
    assert idl.IRSE50_BLOCKS[-1] == (512, 512, 1)


def test_adaptive_avg_pool_matches_torch():
    import torch

    x = np.random.RandomState(0).randn(2, 188, 188, 3).astype(np.float32)
    ref = torch.nn.AdaptiveAvgPool2d((112, 112))(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    ).numpy()
    ours = idl.adaptive_avg_pool(jnp.asarray(x), 112)
    np.testing.assert_allclose(
        np.transpose(np.asarray(ours), (0, 3, 1, 2)), ref, rtol=1e-4, atol=1e-5
    )


@pytest.mark.slow
def test_id_loss_parity_vs_reference(reference_path):
    """Random-weight parity: full IR-SE50 + IDLoss crop/pool/normalize."""
    import torch
    from models.insight_face.model_irse import Backbone

    torch.manual_seed(0)
    net = Backbone(input_size=112, num_layers=50, drop_ratio=0.6, mode="ir_se")
    # make the final BatchNorm1d affine non-trivial: torch inits it to the
    # identity (weight=1, bias=0), which masked a converter that dropped
    # these learned parameters — real ir_se50.pth carries them
    with torch.no_grad():
        net.output_layer[4].weight.mul_(1.5).add_(0.1)
        net.output_layer[4].bias.add_(0.2)
    net.eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params = jax.tree.map(jnp.asarray, idl.params_from_torch(sd))

    rng = np.random.RandomState(1)
    x = rng.randn(1, 3, 256, 256).astype(np.float32) * 0.5

    with torch.no_grad():
        xt = torch.from_numpy(x)
        crop = xt[:, :, 35:223, 32:220]
        pooled = torch.nn.AdaptiveAvgPool2d((112, 112))(crop)
        ref_feats = net(pooled).numpy()

    ours = idl.extract_feats(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(ours), ref_feats, rtol=2e-3, atol=2e-3)

    # the loss itself: identical images → 0
    xh = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    loss_same = idl.id_loss(params, xh, xh)
    np.testing.assert_allclose(np.asarray(loss_same), 0.0, atol=1e-5)


def test_lpips_properties():
    params = lpips_jax.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32) * 0.3)
    d_same = lpips_jax.lpips(params, a, a)
    np.testing.assert_allclose(np.asarray(d_same), 0.0, atol=1e-6)
    d = lpips_jax.lpips(params, a, b)
    assert d.shape == (2,)
    assert float(d.min()) > 0
    g = jax.grad(lambda x: lpips_jax.lpips(params, x, b).sum())(a)
    assert float(jnp.abs(g).max()) > 0


def test_lpips_converter_shapes():
    # synthetic torchvision-layout state_dicts
    idx = [0, 3, 6, 8, 10]
    chans = [(3, 64, 11), (64, 192, 5), (192, 384, 3), (384, 256, 3), (256, 256, 3)]
    alex_sd = {}
    for j, (cin, cout, k) in zip(idx, chans):
        alex_sd[f"features.{j}.weight"] = np.zeros((cout, cin, k, k), np.float32)
        alex_sd[f"features.{j}.bias"] = np.zeros((cout,), np.float32)
    lin_sd = {
        f"lin{i}.model.1.weight": np.ones((1, c, 1, 1), np.float32)
        for i, c in enumerate([64, 192, 384, 256, 256])
    }
    p = lpips_jax.params_from_torch(alex_sd, lin_sd)
    assert p["convs"][0]["w"].shape == (11, 11, 3, 64)
    assert p["lins"][2]["w"].shape == (384,)


def test_imageio_grid(tmp_path):
    from asyrp_official_tpu.data.imageio import make_grid, save_image

    imgs = np.random.RandomState(0).rand(5, 8, 8, 3).astype(np.float32)
    grid = make_grid(imgs, nrow=3, padding=1)
    assert grid.shape == (2 * 9 + 1, 3 * 9 + 1, 3)
    p = str(tmp_path / "g.png")
    save_image(imgs * 2 - 1, p, nrow=3, pm1=True)
    from PIL import Image

    im = Image.open(p)
    assert im.size == (3 * 9 + 1, 2 * 9 + 1)


def test_id_loss_cross_executes_reference_class(reference_path, tmp_path):
    """Run the reference's own IDLoss (losses/id_loss.py:7-35) — weights
    routed through its MODEL_PATHS registry — against our id_loss on the
    same images. The backbone was already cross-checked; this executes the
    reference's crop/pool/per-sample-1-dot FORWARD itself rather than a
    test-authored mirror of it."""
    import importlib.util

    import torch
    from models.insight_face.model_irse import Backbone

    torch.manual_seed(0)
    net = Backbone(input_size=112, num_layers=50, drop_ratio=0.6, mode="ir_se")
    with torch.no_grad():
        net.output_layer[4].weight.mul_(1.5).add_(0.1)
        net.output_layer[4].bias.add_(0.2)
    sd_path = tmp_path / "irse50.pth"
    torch.save(net.state_dict(), sd_path)

    import configs.paths_config as ref_paths

    old = ref_paths.MODEL_PATHS.get("ir_se50")
    ref_paths.MODEL_PATHS["ir_se50"] = str(sd_path)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_id_loss", str(reference_path / "losses" / "id_loss.py")
        )
        ref_idl = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref_idl)
        ref_loss_mod = ref_idl.IDLoss()
        rng = np.random.RandomState(2)
        x = rng.randn(2, 3, 256, 256).astype(np.float32) * 0.5
        xh = x + rng.randn(2, 3, 256, 256).astype(np.float32) * 0.1
        with torch.no_grad():
            ref = ref_loss_mod(
                torch.from_numpy(x), torch.from_numpy(xh)
            ).detach().numpy()
    finally:
        if old is not None:
            ref_paths.MODEL_PATHS["ir_se50"] = old

    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params = jax.tree.map(jnp.asarray, idl.params_from_torch(sd))
    nhwc = lambda a: jnp.asarray(np.transpose(a, (0, 2, 3, 1)))  # noqa: E731
    ours = np.asarray(idl.id_loss(params, nhwc(x), nhwc(xh)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)
