"""LPIPS (AlexNet backbone) in JAX — the perceptual metric behind the
reference's interval-calibration stage (`lpips.LPIPS(net='alex')`,
diffusion_latent.py:1203-1206) and our parity gates.

Standard LPIPS pipeline: scale inputs, AlexNet conv features at the five
ReLU taps, channel-unit-normalize, squared difference, learned 1x1 "lin"
weights, spatial mean, sum over taps. Weights convert from the `lpips`
package checkpoints (torchvision AlexNet features + lin heads); gated —
random init is available for plumbing tests but is NOT a calibrated metric.
"""
from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["init", "lpips", "params_from_torch", "ALEX_TAPS"]

# (cout, kernel, stride, pad) per conv; taps = features after each ReLU
_ALEX_CONVS = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
ALEX_TAPS = 5
# lpips ScalingLayer constants
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(p, x, stride, pad):
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"].astype(x.dtype)


def _maxpool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


def _features(params, x) -> List[jnp.ndarray]:
    taps = []
    h = x
    for i, (cout, k, s, p) in enumerate(_ALEX_CONVS):
        h = _conv(params["convs"][i], h, s, p)
        h = jnp.maximum(h, 0.0)
        taps.append(h)
        if i in (0, 1):
            h = _maxpool(h)
    return taps


def _unit_normalize(f, eps=1e-10):
    return f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + eps)


def lpips(params, x0, x1):
    """x0, x1: [B, H, W, 3] NHWC in [-1, 1] → [B] distances."""
    xs = (x0 - _SHIFT) / _SCALE
    ys = (x1 - _SHIFT) / _SCALE
    f0 = _features(params, xs)
    f1 = _features(params, ys)
    total = 0.0
    for i in range(ALEX_TAPS):
        d = (_unit_normalize(f0[i]) - _unit_normalize(f1[i])) ** 2
        w = params["lins"][i]["w"].astype(d.dtype)  # [C]
        total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
    return total


def init(key) -> Dict[str, Any]:
    keys = jax.random.split(key, 16)
    convs = []
    cin = 3
    for i, (cout, k, s, p) in enumerate(_ALEX_CONVS):
        fan = cin * k * k
        convs.append(
            {
                "w": jax.random.normal(keys[i], (k, k, cin, cout)) * (fan ** -0.5),
                "b": jnp.zeros(cout),
            }
        )
        cin = cout
    lins = [
        {"w": jnp.abs(jax.random.normal(keys[8 + i], (c,))) * 0.1}
        for i, c in enumerate([64, 192, 384, 256, 256])
    ]
    return {"convs": convs, "lins": lins}


def params_from_torch(alex_sd: Dict[str, np.ndarray], lin_sd: Dict[str, np.ndarray]):
    """alex_sd: torchvision AlexNet `features` state_dict
    (features.{0,3,6,8,10}); lin_sd: lpips lin heads
    (lin{i}.model.1.weight [1, C, 1, 1])."""
    idx = [0, 3, 6, 8, 10]
    convs = [
        {
            "w": np.transpose(np.asarray(alex_sd[f"features.{j}.weight"], np.float32), (2, 3, 1, 0)),
            "b": np.asarray(alex_sd[f"features.{j}.bias"], np.float32),
        }
        for j in idx
    ]
    lins = [
        {"w": np.asarray(lin_sd[f"lin{i}.model.1.weight"], np.float32)[0, :, 0, 0]}
        for i in range(ALEX_TAPS)
    ]
    return {"convs": convs, "lins": lins}
