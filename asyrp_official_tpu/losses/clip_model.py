"""JAX CLIP — vision transformer + text transformer + modified-ResNet,
convertible from OpenAI `clip` package checkpoints.

The reference depends on the torch `clip` package
(losses/clip_loss.py:5,35,60: ViT via `--clip_model_name`, default ViT-B/16
at main.py:212, plus RN50 for the texture loss). Here the encoders are
re-implemented functionally in JAX so the CLIP directional loss is
differentiable end-to-end on TPU inside the compiled training step.

Architectural notes (OpenAI CLIP):
  * QuickGELU (x·sigmoid(1.702x)), pre-LN residual attention blocks;
  * visual tower: patch-embed conv (no bias) → [CLS]+pos → transformer →
    ln_post → proj;
  * text tower: token+pos embed → causal transformer → ln_final → take
    features at each sequence's EOT (argmax token id) → text_projection.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "CLIPConfig",
    "VIT_B16",
    "VIT_B32",
    "init",
    "encode_image",
    "encode_text",
    "logits",
    "params_from_torch",
]


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int = 512
    # vision
    image_resolution: int = 224
    vision_layers: int = 12
    vision_width: int = 768
    vision_patch_size: int = 16
    # text
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12

    @property
    def vision_heads(self) -> int:
        return self.vision_width // 64

    @property
    def grid(self) -> int:
        return self.image_resolution // self.vision_patch_size


VIT_B16 = CLIPConfig(vision_patch_size=16)
VIT_B32 = CLIPConfig(vision_patch_size=32)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def layer_norm(p, x, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _mha(p, x, heads, mask=None):
    """torch nn.MultiheadAttention equivalent: packed qkv in_proj + out_proj."""
    b, t, c = x.shape
    qkv = x @ p["in_proj_w"].T + p["in_proj_b"]  # [B,T,3C]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    ch = c // heads
    q = q.reshape(b, t, heads, ch).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, heads, ch).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, heads, ch).transpose(0, 2, 1, 3)
    logits_ = jnp.einsum("bhtc,bhsc->bhts", q, k) * (ch ** -0.5)
    if mask is not None:
        logits_ = logits_ + mask
    w = jax.nn.softmax(logits_, axis=-1)
    out = jnp.einsum("bhts,bhsc->bhtc", w, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, c)
    return out @ p["out_proj_w"].T + p["out_proj_b"]


def _resblock(p, x, heads, mask=None):
    x = x + _mha(p["attn"], layer_norm(p["ln_1"], x), heads, mask)
    h = layer_norm(p["ln_2"], x)
    h = quick_gelu(h @ p["mlp"]["c_fc_w"].T + p["mlp"]["c_fc_b"])
    h = h @ p["mlp"]["c_proj_w"].T + p["mlp"]["c_proj_b"]
    return x + h


def _transformer(p, x, heads, mask=None):
    for blk in p["resblocks"]:
        x = _resblock(blk, x, heads, mask)
    return x


def encode_image(params, cfg: CLIPConfig, images):
    """images: [B, H, W, 3] NHWC, already CLIP-normalized."""
    v = params["visual"]
    # patch embed: conv stride=patch, no bias
    x = jax.lax.conv_general_dilated(
        images,
        v["conv1_w"],
        window_strides=(cfg.vision_patch_size, cfg.vision_patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    b = x.shape[0]
    x = x.reshape(b, -1, cfg.vision_width)  # [B, grid*grid, W]
    cls = jnp.broadcast_to(v["class_embedding"], (b, 1, cfg.vision_width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + v["positional_embedding"]
    x = layer_norm(v["ln_pre"], x)
    x = _transformer(v["transformer"], x, cfg.vision_heads)
    x = layer_norm(v["ln_post"], x[:, 0, :])
    return x @ v["proj"]


def encode_text(params, cfg: CLIPConfig, tokens):
    """tokens: [B, context_length] int32. EOT = argmax token id per row."""
    x = params["token_embedding"][tokens]  # [B, T, W]
    x = x + params["positional_embedding"]
    t = cfg.context_length
    mask = jnp.triu(jnp.full((t, t), -jnp.inf), k=1)
    x = _transformer(params["transformer"], x, cfg.transformer_heads, mask)
    x = layer_norm(params["ln_final"], x)
    eot = jnp.argmax(tokens, axis=-1)
    x = x[jnp.arange(x.shape[0]), eot]
    return x @ params["text_projection"]


def logits(params, cfg: CLIPConfig, images, tokens):
    """(logits_per_image, logits_per_text) as in CLIP.forward."""
    ie = encode_image(params, cfg, images)
    te = encode_text(params, cfg, tokens)
    ie = ie / jnp.linalg.norm(ie, axis=-1, keepdims=True)
    te = te / jnp.linalg.norm(te, axis=-1, keepdims=True)
    scale = jnp.exp(params["logit_scale"])
    lpi = scale * ie @ te.T
    return lpi, lpi.T


# ---------------------------------------------------------------------------
# init (tests / fresh training) and torch conversion
# ---------------------------------------------------------------------------


def _init_block(key, width):
    ks = jax.random.split(key, 6)
    s = width ** -0.5

    def rnd(k, shape, scale):
        return jax.random.normal(k, shape) * scale

    return {
        "ln_1": {"scale": jnp.ones(width), "bias": jnp.zeros(width)},
        "attn": {
            "in_proj_w": rnd(ks[0], (3 * width, width), s),
            "in_proj_b": jnp.zeros(3 * width),
            "out_proj_w": rnd(ks[1], (width, width), s),
            "out_proj_b": jnp.zeros(width),
        },
        "ln_2": {"scale": jnp.ones(width), "bias": jnp.zeros(width)},
        "mlp": {
            "c_fc_w": rnd(ks[2], (4 * width, width), s),
            "c_fc_b": jnp.zeros(4 * width),
            "c_proj_w": rnd(ks[3], (width, 4 * width), s),
            "c_proj_b": jnp.zeros(width),
        },
    }


def init(key, cfg: CLIPConfig) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 256))
    nxt = lambda: next(keys)
    vw, tw = cfg.vision_width, cfg.transformer_width
    params = {
        "visual": {
            "conv1_w": jax.random.normal(
                nxt(), (cfg.vision_patch_size, cfg.vision_patch_size, 3, vw)
            )
            * (vw ** -0.5),
            "class_embedding": jax.random.normal(nxt(), (vw,)) * (vw ** -0.5),
            "positional_embedding": jax.random.normal(
                nxt(), (cfg.grid * cfg.grid + 1, vw)
            )
            * (vw ** -0.5),
            "ln_pre": {"scale": jnp.ones(vw), "bias": jnp.zeros(vw)},
            "transformer": {
                "resblocks": [_init_block(nxt(), vw) for _ in range(cfg.vision_layers)]
            },
            "ln_post": {"scale": jnp.ones(vw), "bias": jnp.zeros(vw)},
            "proj": jax.random.normal(nxt(), (vw, cfg.embed_dim)) * (vw ** -0.5),
        },
        "token_embedding": jax.random.normal(nxt(), (cfg.vocab_size, tw)) * 0.02,
        "positional_embedding": jax.random.normal(nxt(), (cfg.context_length, tw))
        * 0.01,
        "transformer": {
            "resblocks": [_init_block(nxt(), tw) for _ in range(cfg.transformer_layers)]
        },
        "ln_final": {"scale": jnp.ones(tw), "bias": jnp.zeros(tw)},
        "text_projection": jax.random.normal(nxt(), (tw, cfg.embed_dim)) * (tw ** -0.5),
        "logit_scale": jnp.asarray(np.log(1 / 0.07), jnp.float32),
    }
    return params


def _t_block(sd, p):
    return {
        "ln_1": {"scale": sd[f"{p}.ln_1.weight"], "bias": sd[f"{p}.ln_1.bias"]},
        "attn": {
            "in_proj_w": sd[f"{p}.attn.in_proj_weight"],
            "in_proj_b": sd[f"{p}.attn.in_proj_bias"],
            "out_proj_w": sd[f"{p}.attn.out_proj.weight"],
            "out_proj_b": sd[f"{p}.attn.out_proj.bias"],
        },
        "ln_2": {"scale": sd[f"{p}.ln_2.weight"], "bias": sd[f"{p}.ln_2.bias"]},
        "mlp": {
            "c_fc_w": sd[f"{p}.mlp.c_fc.weight"],
            "c_fc_b": sd[f"{p}.mlp.c_fc.bias"],
            "c_proj_w": sd[f"{p}.mlp.c_proj.weight"],
            "c_proj_b": sd[f"{p}.mlp.c_proj.bias"],
        },
    }


def config_from_torch(sd: Dict[str, np.ndarray]) -> CLIPConfig:
    """Infer the CLIPConfig from an OpenAI state_dict (clip.model.build_model
    does the same)."""
    vision_width = sd["visual.conv1.weight"].shape[0]
    patch = sd["visual.conv1.weight"].shape[-1]
    grid = int(round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5))
    vision_layers = len(
        {k.split(".")[3] for k in sd if k.startswith("visual.transformer.resblocks.")}
    )
    tw = sd["ln_final.weight"].shape[0]
    return CLIPConfig(
        embed_dim=sd["text_projection"].shape[1],
        image_resolution=grid * patch,
        vision_layers=vision_layers,
        vision_width=vision_width,
        vision_patch_size=patch,
        context_length=sd["positional_embedding"].shape[0],
        vocab_size=sd["token_embedding.weight"].shape[0],
        transformer_width=tw,
        transformer_heads=tw // 64,
        transformer_layers=len(
            {
                k.split(".")[2]
                for k in sd
                if k.startswith("transformer.resblocks.")
            }
        ),
    )


def params_from_torch(sd: Dict[str, np.ndarray], cfg: Optional[CLIPConfig] = None):
    """Convert an OpenAI `clip` state_dict (fp16 or fp32 numpy values)."""
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}
    cfg = cfg or config_from_torch(sd)
    vis = {
        "conv1_w": np.transpose(sd["visual.conv1.weight"], (2, 3, 1, 0)),
        "class_embedding": sd["visual.class_embedding"],
        "positional_embedding": sd["visual.positional_embedding"],
        "ln_pre": {
            "scale": sd["visual.ln_pre.weight"],
            "bias": sd["visual.ln_pre.bias"],
        },
        "transformer": {
            "resblocks": [
                _t_block(sd, f"visual.transformer.resblocks.{i}")
                for i in range(cfg.vision_layers)
            ]
        },
        "ln_post": {
            "scale": sd["visual.ln_post.weight"],
            "bias": sd["visual.ln_post.bias"],
        },
        "proj": sd["visual.proj"],
    }
    params = {
        "visual": vis,
        "token_embedding": sd["token_embedding.weight"],
        "positional_embedding": sd["positional_embedding"],
        "transformer": {
            "resblocks": [
                _t_block(sd, f"transformer.resblocks.{i}")
                for i in range(cfg.transformer_layers)
            ]
        },
        "ln_final": {"scale": sd["ln_final.weight"], "bias": sd["ln_final.bias"]},
        "text_projection": sd["text_projection"],
        "logit_scale": np.asarray(sd["logit_scale"], np.float32),
    }
    return jax.tree.map(jnp.asarray, params), cfg
