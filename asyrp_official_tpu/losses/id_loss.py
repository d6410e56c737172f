"""ArcFace ID loss — JAX port of IR-SE50 + IDLoss
(losses/id_loss.py:7-35, models/insight_face/model_irse.py:49-124,
models/insight_face/helpers.py).

Inference-mode only (the backbone is frozen: BatchNorm uses running stats,
dropout off), differentiable w.r.t. the input image for the training loss.
Weights convert from the reference `ir_se50.pth`
(configs/paths_config.py:15).
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "IRSE50_BLOCKS",
    "init",
    "extract_feats",
    "id_loss",
    "params_from_torch",
]

# (in_channel, depth, stride) per bottleneck — get_blocks(50)
# (models/insight_face/helpers.py:88-95)
IRSE50_BLOCKS: List[Tuple[int, int, int]] = (
    [(64, 64, 2)] + [(64, 64, 1)] * 2
    + [(64, 128, 2)] + [(128, 128, 1)] * 3
    + [(128, 256, 2)] + [(256, 256, 1)] * 13
    + [(256, 512, 2)] + [(512, 512, 1)] * 2
)


def _bn(p, x, eps=1e-5):
    """Eval-mode BatchNorm (running stats)."""
    inv = jax.lax.rsqrt(p["var"].astype(x.dtype) + eps)
    out = (x - p["mean"].astype(x.dtype)) * inv
    if "scale" in p:
        out = out * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)
    return out


def _prelu(p, x):
    a = p["a"].astype(x.dtype)
    return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)


def _conv(p, x, stride=1, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _se(p, x):
    """Squeeze-excite (helpers.py:115-131)."""
    s = jnp.mean(x, axis=(1, 2), keepdims=True)
    s = _conv(p["fc1"], s)
    s = jnp.maximum(s, 0)
    s = _conv(p["fc2"], s)
    return x * jax.nn.sigmoid(s)


def _bottleneck(p, x, stride, has_short_conv):
    if has_short_conv:
        short = _bn(p["short_bn"], _conv(p["short_conv"], x, stride, "VALID"))
    else:
        short = x[:, ::stride, ::stride, :]  # MaxPool2d(1, stride)
    h = _bn(p["bn1"], x)
    h = _conv(p["conv1"], h, 1, ((1, 1), (1, 1)))
    h = _prelu(p["prelu"], h)
    h = _conv(p["conv2"], h, stride, ((1, 1), (1, 1)))
    h = _bn(p["bn2"], h)
    h = _se(p["se"], h)
    return h + short


def extract_embedding(params, x):
    """x: [B, 112, 112, 3] NHWC in [-1, 1] → l2-normalized [B, 512]."""
    h = _conv(params["input_conv"], x, 1, ((1, 1), (1, 1)))
    h = _bn(params["input_bn"], h)
    h = _prelu(params["input_prelu"], h)
    for p, (cin, depth, stride) in zip(params["body"], IRSE50_BLOCKS):
        h = _bottleneck(p, h, stride, cin != depth)
    h = _bn(params["out_bn2d"], h)
    # flatten NCHW-order to match torch Linear weight layout: [B,H,W,C]→[B,C,H,W]
    b = h.shape[0]
    h = h.transpose(0, 3, 1, 2).reshape(b, -1)
    h = h @ params["out_linear"]["w"] + params["out_linear"]["b"]
    h = _bn(params["out_bn1d"], h)
    return h / jnp.linalg.norm(h, axis=1, keepdims=True)


def adaptive_avg_pool(x, out_size: int):
    """torch AdaptiveAvgPool2d semantics via integral image (static windows)."""
    b, h, w, c = x.shape

    def pool_axis(arr, n_in, n_out, axis):
        ii = jnp.cumsum(arr, axis=axis)
        ii = jnp.concatenate([jnp.zeros_like(jnp.take(ii, jnp.array([0]), axis)), ii], axis)
        starts = np.floor(np.arange(n_out) * n_in / n_out).astype(np.int32)
        ends = np.ceil((np.arange(n_out) + 1) * n_in / n_out).astype(np.int32)
        hi = jnp.take(ii, jnp.asarray(ends), axis)
        lo = jnp.take(ii, jnp.asarray(starts), axis)
        cnt = jnp.asarray((ends - starts).astype(np.float32))
        shape = [1] * arr.ndim
        shape[axis] = n_out
        return (hi - lo) / cnt.reshape(shape)

    x = pool_axis(x, h, out_size, 1)
    x = pool_axis(x, w, out_size, 2)
    return x


def extract_feats(params, img):
    """IDLoss.extract_feats (losses/id_loss.py:18-22): crop the face region
    (NCHW [35:223, 32:220] → NHWC), adaptive-pool to 112, embed."""
    x = img[:, 35:223, 32:220, :]
    x = adaptive_avg_pool(x, 112)
    return extract_embedding(params, x)


def id_loss(params, x, x_hat):
    """1 − ⟨feat(x), feat(x_hat)⟩ per sample (losses/id_loss.py:24-35);
    source feats are detached as in the reference (:27)."""
    f = jax.lax.stop_gradient(extract_feats(params, x))
    f_hat = extract_feats(params, x_hat)
    return 1.0 - jnp.sum(f * f_hat, axis=1)


# ---------------------------------------------------------------------------
# init + conversion
# ---------------------------------------------------------------------------


def _conv_init(key, kh, kw, cin, cout):
    fan = cin * kh * kw
    return {"w": jax.random.normal(key, (kh, kw, cin, cout)) * (fan ** -0.5)}


def _bn_init(c, affine=True):
    p = {"mean": jnp.zeros(c), "var": jnp.ones(c)}
    if affine:
        p.update({"scale": jnp.ones(c), "bias": jnp.zeros(c)})
    return p


def init(key) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 512))
    nxt = lambda: next(keys)
    params: Dict[str, Any] = {
        "input_conv": _conv_init(nxt(), 3, 3, 3, 64),
        "input_bn": _bn_init(64),
        "input_prelu": {"a": jnp.full((64,), 0.25)},
    }
    body = []
    for cin, depth, stride in IRSE50_BLOCKS:
        p = {
            "bn1": _bn_init(cin),
            "conv1": _conv_init(nxt(), 3, 3, cin, depth),
            "prelu": {"a": jnp.full((depth,), 0.25)},
            "conv2": _conv_init(nxt(), 3, 3, depth, depth),
            "bn2": _bn_init(depth),
            "se": {
                "fc1": _conv_init(nxt(), 1, 1, depth, depth // 16),
                "fc2": _conv_init(nxt(), 1, 1, depth // 16, depth),
            },
        }
        if cin != depth:
            p["short_conv"] = _conv_init(nxt(), 1, 1, cin, depth)
            p["short_bn"] = _bn_init(depth)
        body.append(p)
    params["body"] = body
    params["out_bn2d"] = _bn_init(512)
    params["out_linear"] = {
        "w": jax.random.normal(nxt(), (512 * 7 * 7, 512)) * (512 * 49) ** -0.5,
        "b": jnp.zeros(512),
    }
    # the reference IDLoss builds Backbone(...) with the DEFAULT
    # affine=True (losses/id_loss.py:11) — ir_se50.pth carries learned
    # output_layer.4 scale/bias (only the unused IR_SE_50 factory sets
    # affine=False, model_irse.py:111)
    params["out_bn1d"] = _bn_init(512, affine=True)
    return params


def params_from_torch(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Convert the reference Backbone(112, 50, 'ir_se') state_dict."""
    f32 = lambda k: np.asarray(sd[k], np.float32)
    conv = lambda k: {"w": np.transpose(f32(k + ".weight"), (2, 3, 1, 0))}

    def bn(k, affine=True):
        p = {"mean": f32(k + ".running_mean"), "var": f32(k + ".running_var")}
        if affine and (k + ".weight") in sd:
            p.update({"scale": f32(k + ".weight"), "bias": f32(k + ".bias")})
        return p

    params = {
        "input_conv": conv("input_layer.0"),
        "input_bn": bn("input_layer.1"),
        "input_prelu": {"a": f32("input_layer.2.weight")},
    }
    body = []
    for i, (cin, depth, stride) in enumerate(IRSE50_BLOCKS):
        base = f"body.{i}"
        p = {
            "bn1": bn(f"{base}.res_layer.0"),
            "conv1": conv(f"{base}.res_layer.1"),
            "prelu": {"a": f32(f"{base}.res_layer.2.weight")},
            "conv2": conv(f"{base}.res_layer.3"),
            "bn2": bn(f"{base}.res_layer.4"),
            "se": {
                "fc1": conv(f"{base}.res_layer.5.fc1"),
                "fc2": conv(f"{base}.res_layer.5.fc2"),
            },
        }
        if cin != depth:
            p["short_conv"] = conv(f"{base}.shortcut_layer.0")
            p["short_bn"] = bn(f"{base}.shortcut_layer.1")
        body.append(p)
    params["body"] = body
    params["out_bn2d"] = bn("output_layer.0")
    params["out_linear"] = {
        "w": f32("output_layer.3.weight").T,
        "b": f32("output_layer.3.bias"),
    }
    params["out_bn1d"] = bn("output_layer.4")  # affine present in ir_se50.pth
    return params
