"""losses/resnet18 vs the reference's orphan BiSeNet ResNet18
(losses/resnet.py:20-81) on converted random weights (the reference
init_weight downloads torchvision weights — zero egress here, so the torch
module is constructed without it)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asyrp_official_tpu.losses.resnet18 import (
    init,
    params_from_torch,
    resnet18_features,
)


def _torch_resnet(reference_path):
    import torch
    from losses.resnet import Resnet18

    torch.manual_seed(0)
    m = Resnet18.__new__(Resnet18)  # skip init_weight's model-zoo download
    torch.nn.Module.__init__(m)
    from losses.resnet import create_layer_basic

    m.conv1 = torch.nn.Conv2d(3, 64, kernel_size=7, stride=2, padding=3, bias=False)
    m.bn1 = torch.nn.BatchNorm2d(64)
    m.maxpool = torch.nn.MaxPool2d(kernel_size=3, stride=2, padding=1)
    m.layer1 = create_layer_basic(64, 64, bnum=2, stride=1)
    m.layer2 = create_layer_basic(64, 128, bnum=2, stride=2)
    m.layer3 = create_layer_basic(128, 256, bnum=2, stride=2)
    m.layer4 = create_layer_basic(256, 512, bnum=2, stride=2)
    m.eval()
    # non-trivial running stats so BN folding is actually exercised
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)
                mod.weight.uniform_(0.5, 1.5)
                mod.bias.uniform_(-0.2, 0.2)
    return m


def test_resnet18_feature_pyramid_parity(reference_path):
    import torch

    m = _torch_resnet(reference_path)
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    params = params_from_torch(sd)

    x = np.random.RandomState(0).randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        r8, r16, r32 = m(torch.from_numpy(x))
    o8, o16, o32 = resnet18_features(
        params, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    )
    for ours, ref in ((o8, r8), (o16, r16), (o32, r32)):
        np.testing.assert_allclose(
            np.transpose(np.asarray(ours), (0, 3, 1, 2)), ref.numpy(),
            rtol=2e-4, atol=2e-4,
        )
    assert o8.shape[1] == 8 and o16.shape[1] == 4 and o32.shape[1] == 2


def test_resnet18_random_init_runs():
    params = init(jax.random.PRNGKey(0))
    f8, f16, f32 = resnet18_features(params, jnp.zeros((1, 64, 64, 3)))
    assert f8.shape == (1, 8, 8, 128)
    assert f16.shape == (1, 4, 4, 256)
    assert f32.shape == (1, 2, 2, 512)
