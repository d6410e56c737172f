"""BiSeNet-style ResNet18 feature extractor — the reference's orphan
`losses/resnet.py` (the backbone of a removed semantic-consistency loss;
only a stale .pyc shows its former consumer, SURVEY.md §2.2). Ported so
every reference source file has a working equivalent.

Returns the (feat8, feat16, feat32) pyramid at 1/8, 1/16, 1/32 resolution
(losses/resnet.py:72-81). Inference-style BatchNorm: running statistics
folded into a scale/shift at conversion time (the reference only ever runs
this frozen on pretrained torchvision weights, resnet.py:84-90)."""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["resnet18_features", "params_from_torch", "init"]

# (out_chan, stride) of the first block per layer; 2 BasicBlocks each
_LAYERS = [(64, 1), (128, 2), (256, 2), (512, 2)]


def _conv(p, x, stride=1, pad=1):
    return jax.lax.conv_general_dilated(
        x, p.astype(x.dtype), (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _bn(p, x):
    return x * p["scale"].astype(x.dtype) + p["shift"].astype(x.dtype)


def _basic_block(p, x, stride):
    r = _conv(p["conv1"], x, stride=stride)
    r = jnp.maximum(_bn(p["bn1"], r), 0.0)
    r = _conv(p["conv2"], r)
    r = _bn(p["bn2"], r)
    s = x
    if "down_conv" in p:
        s = _bn(p["down_bn"], _conv(p["down_conv"], x, stride=stride, pad=0))
    return jnp.maximum(s + r, 0.0)


def resnet18_features(params, x) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """x: [B, H, W, 3] → (feat8, feat16, feat32)."""
    h = _conv(params["conv1"], x, stride=2, pad=3)
    h = jnp.maximum(_bn(params["bn1"], h), 0.0)
    # maxpool k3 s2 p1
    h = jax.lax.reduce_window(
        h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    feats: List[jnp.ndarray] = []
    for li, (cout, stride) in enumerate(_LAYERS):
        for bi in range(2):
            h = _basic_block(
                params[f"layer{li + 1}"][bi], h, stride if bi == 0 else 1
            )
        if li > 0:
            feats.append(h)
    return tuple(feats)  # 1/8, 1/16, 1/32


def _fold_bn(sd, prefix, eps=1e-5):
    g = np.asarray(sd[f"{prefix}.weight"], np.float32)
    b = np.asarray(sd[f"{prefix}.bias"], np.float32)
    mean = np.asarray(sd[f"{prefix}.running_mean"], np.float32)
    var = np.asarray(sd[f"{prefix}.running_var"], np.float32)
    scale = g / np.sqrt(var + eps)
    return {"scale": scale, "shift": b - mean * scale}


def _w(sd, key):
    return np.transpose(np.asarray(sd[key], np.float32), (2, 3, 1, 0))


def params_from_torch(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """torchvision resnet18 state_dict layout (conv1/bn1/layer{1-4}.{0,1});
    the fc head is dropped like the reference does (resnet.py:86-88)."""
    params: Dict[str, Any] = {
        "conv1": _w(sd, "conv1.weight"),
        "bn1": _fold_bn(sd, "bn1"),
    }
    for li in range(1, 5):
        blocks = []
        for bi in range(2):
            pre = f"layer{li}.{bi}"
            p = {
                "conv1": _w(sd, f"{pre}.conv1.weight"),
                "bn1": _fold_bn(sd, f"{pre}.bn1"),
                "conv2": _w(sd, f"{pre}.conv2.weight"),
                "bn2": _fold_bn(sd, f"{pre}.bn2"),
            }
            if f"{pre}.downsample.0.weight" in sd:
                p["down_conv"] = _w(sd, f"{pre}.downsample.0.weight")
                p["down_bn"] = _fold_bn(sd, f"{pre}.downsample.1")
            blocks.append(p)
        params[f"layer{li}"] = blocks
    return jax.tree.map(jnp.asarray, params)


def init(key) -> Dict[str, Any]:
    """Random params (plumbing tests; real use converts torchvision
    weights — the reference downloads them, resnet.py:11,84)."""
    keys = iter(jax.random.split(key, 64))

    def conv(kh, cin, cout):
        fan = kh * kh * cin
        return jax.random.normal(next(keys), (kh, kh, cin, cout)) * fan ** -0.5

    def bn(c):
        return {"scale": jnp.ones(c), "shift": jnp.zeros(c)}

    params = {"conv1": conv(7, 3, 64), "bn1": bn(64)}
    cin = 64
    for li, (cout, stride) in enumerate(_LAYERS):
        blocks = []
        for bi in range(2):
            c_in = cin if bi == 0 else cout
            p = {
                "conv1": conv(3, c_in, cout), "bn1": bn(cout),
                "conv2": conv(3, cout, cout), "bn2": bn(cout),
            }
            if bi == 0 and (c_in != cout or stride != 1):
                p["down_conv"] = conv(1, c_in, cout)
                p["down_bn"] = bn(cout)
            blocks.append(p)
        params[f"layer{li + 1}"] = blocks
        cin = cout
    return params
