"""Refshim for the `lpips` package (richzhang/PerceptualSimilarity), used by
the reference's `compute_lpips_distance` (diffusion_latent.py:1203-1205:
`import lpips; loss_fn_alex = lpips.LPIPS(net='alex')`).

The real package is not installed in this image (pypi is DNS-blocked,
ROUND3.md), so `LPIPS` here is the same line-for-line torch mirror of its
documented forward that `tests/test_lpips_metric_parity.py` verifies
`losses/lpips_jax` against: ScalingLayer → torchvision-AlexNet features at
the 5 ReLU taps → channel unit-normalize (eps 1e-10) → squared diff →
nonneg 1x1 lin weights → spatial average → sum over taps → [B, 1, 1, 1].

Weights are DETERMINISTIC (seed-0 random — the real calibrated weights are
the env-blocked artifact); `state_dicts_numpy()` exports them in the exact
layouts `losses.lpips_jax.params_from_torch` consumes, so a cross-execution
test can run the reference and our CLI on identical LPIPS weights.
"""
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

# lpips ScalingLayer constants (lpips/lpips.py)
_SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
_SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

_LIN_CH = (64, 192, 384, 256, 256)
_FEATURE_IDX = (0, 3, 6, 8, 10)  # conv positions in torchvision `features`


class _AlexFeatures(nn.Module):
    """torchvision AlexNet `features` (the lpips 'alex' backbone layout):
    conv(3→64,k11,s4,p2) ReLU pool / conv(→192,k5,p2) ReLU pool /
    conv(→384,k3,p1) ReLU / conv(→256,k3,p1) ReLU / conv(→256,k3,p1) ReLU."""

    def __init__(self):
        super().__init__()
        self.convs = nn.ModuleList([
            nn.Conv2d(3, 64, 11, stride=4, padding=2),
            nn.Conv2d(64, 192, 5, padding=2),
            nn.Conv2d(192, 384, 3, padding=1),
            nn.Conv2d(384, 256, 3, padding=1),
            nn.Conv2d(256, 256, 3, padding=1),
        ])

    def forward(self, x):
        taps = []
        for i, c in enumerate(self.convs):
            x = F.relu(c(x))
            taps.append(x)
            if i in (0, 1):
                x = F.max_pool2d(x, 3, stride=2)
        return taps


class LPIPS(nn.Module):
    """`lpips.LPIPS(net='alex')` stand-in; callable as d = loss_fn(x0, x1)
    with NCHW inputs in [-1, 1], returning [B, 1, 1, 1] like the package
    (the reference reads it via `.item()` at bs 1,
    diffusion_latent.py:1260-1263)."""

    def __init__(self, net="alex", seed=0):
        if net != "alex":
            raise NotImplementedError(
                f"refshim lpips: only net='alex' (got {net!r}) — the "
                "reference only ever constructs the alex backbone"
            )
        super().__init__()
        torch.manual_seed(seed)
        self.alex = _AlexFeatures()
        # nonneg lin heads, same construction order as the alex convs so the
        # seed pins every tensor
        self.lins = nn.ParameterList(
            nn.Parameter(torch.rand(c) * 0.1) for c in _LIN_CH
        )

    @staticmethod
    def _unit_norm(t, eps=1e-10):
        n = torch.sqrt(torch.sum(t ** 2, dim=1, keepdim=True))
        return t / (n + eps)

    def forward(self, x0, x1):
        f0 = self.alex((x0 - _SHIFT) / _SCALE)
        f1 = self.alex((x1 - _SHIFT) / _SCALE)
        total = 0.0
        for i in range(len(_LIN_CH)):
            d = (self._unit_norm(f0[i]) - self._unit_norm(f1[i])) ** 2
            w = self.lins[i].view(1, -1, 1, 1)  # lin 1x1 conv, no bias
            total = total + (d * w).sum(dim=1).mean(dim=(1, 2))
        return total.view(-1, 1, 1, 1)


def state_dicts_numpy(seed=0):
    """(alex_sd, lin_sd) numpy dicts in the exact layouts
    `losses.lpips_jax.params_from_torch` consumes — the JAX side of a
    cross-execution loads the SAME weights this shim computes with."""
    model = LPIPS(seed=seed)
    alex_sd = {}
    for j, conv in zip(_FEATURE_IDX, model.alex.convs):
        alex_sd[f"features.{j}.weight"] = conv.weight.detach().numpy()
        alex_sd[f"features.{j}.bias"] = conv.bias.detach().numpy()
    lin_sd = {
        f"lin{i}.model.1.weight": model.lins[i].detach().view(1, -1, 1, 1).numpy()
        for i in range(len(_LIN_CH))
    }
    return alex_sd, lin_sd
