"""CLIP ModifiedResNet (RN50) visual tower in JAX.

The reference loads RN50 alongside the ViT for its CNN texture loss
(losses/clip_loss.py:60-65, cnn_feature_loss :275-279). OpenAI's
ModifiedResNet differs from torchvision ResNet: 3-conv stem with a final
avg-pool, anti-aliased (avgpool-then-conv) downsampling in bottlenecks, and
an attention-pool head instead of GAP+fc.

Eval-mode only (frozen BatchNorm), differentiable w.r.t. the image.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["RN50Config", "RN50", "init", "encode_image", "params_from_torch"]


@dataclasses.dataclass(frozen=True)
class RN50Config:
    layers: Tuple[int, ...] = (3, 4, 6, 3)
    width: int = 64
    embed_dim: int = 1024
    heads: int = 32
    image_resolution: int = 224

    @property
    def spacial_dim(self) -> int:
        return self.image_resolution // 32


RN50 = RN50Config()


def _conv(p, x, stride=1, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _bn(p, x, eps=1e-5):
    inv = jax.lax.rsqrt(p["var"].astype(x.dtype) + eps)
    return (x - p["mean"].astype(x.dtype)) * inv * p["scale"].astype(
        x.dtype
    ) + p["bias"].astype(x.dtype)


def _avgpool(x, k):
    if k == 1:
        return x
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID"
    ) / float(k * k)


def _bottleneck(p, x, stride):
    out = jnp.maximum(_bn(p["bn1"], _conv(p["conv1"], x)), 0)
    out = jnp.maximum(_bn(p["bn2"], _conv(p["conv2"], out, padding=((1, 1), (1, 1)))), 0)
    out = _avgpool(out, stride)
    out = _bn(p["bn3"], _conv(p["conv3"], out))
    if "down_conv" in p:
        x = _bn(p["down_bn"], _conv(p["down_conv"], _avgpool(x, stride)))
    return jnp.maximum(out + x, 0)


def _attnpool(p, x, heads):
    """AttentionPool2d (CLIP model.py): mean-token query attention."""
    b, h, w, c = x.shape
    flat = x.reshape(b, h * w, c)
    flat = jnp.concatenate([flat.mean(axis=1, keepdims=True), flat], axis=1)
    flat = flat + p["pos"].astype(flat.dtype)  # [HW+1, C]
    t = flat.shape[1]
    qkv = flat @ p["qkv_w"].T + p["qkv_b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    ch = c // heads
    q = q[:, :1].reshape(b, 1, heads, ch).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, heads, ch).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, heads, ch).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqc,bhkc->bhqk", q, k) * (ch ** -0.5)
    wgt = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkc->bhqc", wgt, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, c)
    return out @ p["c_proj_w"].T + p["c_proj_b"]


def encode_image(params, cfg: RN50Config, images):
    """images: [B, H, W, 3] NHWC, CLIP-normalized → [B, embed_dim]."""
    x = images
    for i in (1, 2, 3):
        pad = ((1, 1), (1, 1))
        stride = 2 if i == 1 else 1
        x = jnp.maximum(
            _bn(params[f"bn{i}"], _conv(params[f"conv{i}"], x, stride, pad)), 0
        )
    x = _avgpool(x, 2)
    for li, blocks in enumerate(params["layers"]):
        for bi, bp in enumerate(blocks):
            stride = 2 if (li > 0 and bi == 0) else 1
            x = _bottleneck(bp, x, stride)
    return _attnpool(params["attnpool"], x, cfg.heads)


# ---------------------------------------------------------------------------


def _conv_init(key, kh, kw, cin, cout):
    fan = cin * kh * kw
    return {"w": jax.random.normal(key, (kh, kw, cin, cout)) * fan ** -0.5}


def _bn_init(c):
    return {
        "mean": jnp.zeros(c), "var": jnp.ones(c),
        "scale": jnp.ones(c), "bias": jnp.zeros(c),
    }


def init(key, cfg: RN50Config = RN50) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 512))
    nxt = lambda: next(keys)
    w = cfg.width
    params: Dict[str, Any] = {
        "conv1": _conv_init(nxt(), 3, 3, 3, w // 2),
        "bn1": _bn_init(w // 2),
        "conv2": _conv_init(nxt(), 3, 3, w // 2, w // 2),
        "bn2": _bn_init(w // 2),
        "conv3": _conv_init(nxt(), 3, 3, w // 2, w),
        "bn3": _bn_init(w),
    }
    layers = []
    inplanes = w
    for li, n in enumerate(cfg.layers):
        planes = w * (2 ** li)
        blocks = []
        for bi in range(n):
            stride = 2 if (li > 0 and bi == 0) else 1
            p = {
                "conv1": _conv_init(nxt(), 1, 1, inplanes, planes),
                "bn1": _bn_init(planes),
                "conv2": _conv_init(nxt(), 3, 3, planes, planes),
                "bn2": _bn_init(planes),
                "conv3": _conv_init(nxt(), 1, 1, planes, planes * 4),
                "bn3": _bn_init(planes * 4),
            }
            if stride > 1 or inplanes != planes * 4:
                p["down_conv"] = _conv_init(nxt(), 1, 1, inplanes, planes * 4)
                p["down_bn"] = _bn_init(planes * 4)
            blocks.append(p)
            inplanes = planes * 4
        layers.append(blocks)
    params["layers"] = layers
    c = w * 32
    params["attnpool"] = {
        "pos": jax.random.normal(nxt(), (cfg.spacial_dim ** 2 + 1, c)) * c ** -0.5,
        "qkv_w": jax.random.normal(nxt(), (3 * c, c)) * c ** -0.5,
        "qkv_b": jnp.zeros(3 * c),
        "c_proj_w": jax.random.normal(nxt(), (cfg.embed_dim, c)) * c ** -0.5,
        "c_proj_b": jnp.zeros(cfg.embed_dim),
    }
    return params


def params_from_torch(sd: Dict[str, np.ndarray], cfg: RN50Config = RN50):
    """Convert OpenAI RN50 `visual.*` keys (q/k/v projections are separate
    in AttentionPool2d — concatenated here)."""
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}
    pre = "visual."
    conv = lambda k: {"w": np.transpose(sd[pre + k + ".weight"], (2, 3, 1, 0))}

    def bn(k):
        return {
            "mean": sd[pre + k + ".running_mean"],
            "var": sd[pre + k + ".running_var"],
            "scale": sd[pre + k + ".weight"],
            "bias": sd[pre + k + ".bias"],
        }

    params: Dict[str, Any] = {}
    for i in (1, 2, 3):
        params[f"conv{i}"] = conv(f"conv{i}")
        params[f"bn{i}"] = bn(f"bn{i}")
    layers = []
    inplanes = cfg.width
    for li, n in enumerate(cfg.layers):
        planes = cfg.width * (2 ** li)
        blocks = []
        for bi in range(n):
            base = f"layer{li + 1}.{bi}"
            p = {
                "conv1": conv(f"{base}.conv1"), "bn1": bn(f"{base}.bn1"),
                "conv2": conv(f"{base}.conv2"), "bn2": bn(f"{base}.bn2"),
                "conv3": conv(f"{base}.conv3"), "bn3": bn(f"{base}.bn3"),
            }
            # OpenAI's downsample Sequential is OrderedDict([("-1", AvgPool),
            # ("0", Conv), ("1", BN)]) — the avgpool holds no params, so the
            # state_dict keys are downsample.0 (conv) and downsample.1 (bn)
            if pre + f"{base}.downsample.0.weight" in sd:
                p["down_conv"] = conv(f"{base}.downsample.0")
                p["down_bn"] = bn(f"{base}.downsample.1")
            blocks.append(p)
        layers.append(blocks)
    params["layers"] = layers
    ap = "attnpool."
    params["attnpool"] = {
        "pos": sd[pre + ap + "positional_embedding"],
        "qkv_w": np.concatenate(
            [
                sd[pre + ap + "q_proj.weight"],
                sd[pre + ap + "k_proj.weight"],
                sd[pre + ap + "v_proj.weight"],
            ]
        ),
        "qkv_b": np.concatenate(
            [
                sd[pre + ap + "q_proj.bias"],
                sd[pre + ap + "k_proj.bias"],
                sd[pre + ap + "v_proj.bias"],
            ]
        ),
        "c_proj_w": sd[pre + ap + "c_proj.weight"],
        "c_proj_b": sd[pre + ap + "c_proj.bias"],
    }
    return jax.tree.map(jnp.asarray, params)
