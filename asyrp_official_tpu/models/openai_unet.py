"""OpenAI-style UNet covering BOTH reference families:

  * i-DDPM (P2/ILVR) — AFHQ-dog / FFHQ / ImageNet
    (models/improved_ddpm/unet.py:438-773, script_util.py:5-42);
  * ADM (guided-diffusion) — MetFACE / CelebA_HQ_P2
    (models/guided_diffusion/unet.py:437-776, script_util.py:10-46).

The two reference copies are structural mirrors with identical state_dict
key names; one JAX implementation serves both, selected purely by config.

Same TPU-first design as ddpmpp.py: NHWC, single encoder pass, the dual
decoder of the asymmetric reverse process fused into one 2B-stacked decode,
`t >= t_edit` gating via EditState masks.

A static `plan` (derived from config exactly as UNetModel.__init__ builds
its ModuleLists) drives init / apply / torch-conversion so that all three
walk the same layer order.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from asyrp_official_tpu.models import common as cm
from asyrp_official_tpu.models.delta import EditState, apply_edit

__all__ = [
    "OpenAIUNetConfig",
    "AFHQ_CONFIG",
    "IMAGENET_CONFIG",
    "METFACE_CONFIG",
    "build_plan",
    "init",
    "apply",
    "params_from_torch",
]


@dataclasses.dataclass(frozen=True)
class OpenAIUNetConfig:
    image_size: int = 256
    in_channels: int = 3
    model_channels: int = 128
    out_channels: int = 6  # learn_sigma=True
    num_res_blocks: int = 1
    attention_ds: Tuple[int, ...] = (16,)  # downsample rates with attention
    channel_mult: Tuple[int, ...] = (1, 1, 2, 2, 4, 4)
    num_classes: Optional[int] = None
    num_heads: int = 4
    num_head_channels: int = 64
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    use_new_attention_order: bool = False
    dropout: float = 0.0
    # rematerialize resblocks under grad (activation-memory control — the
    # reference's use_checkpoint capability, improved_ddpm/nn.py:124-184)
    remat: bool = False

    @property
    def temb_ch(self) -> int:
        return self.model_channels * 4

    @property
    def bottleneck_ch(self) -> int:
        return int(self.channel_mult[-1] * self.model_channels)

    def heads_for(self, ch: int, upsample: bool = False) -> int:
        if self.num_head_channels == -1:
            if upsample and self.num_heads_upsample != -1:
                return self.num_heads_upsample
            return self.num_heads
        return ch // self.num_head_channels


# hardcoded reference operating points (script_util dicts; attention "16"
# converts to ds = image_size//16 = 16 at 256px)
AFHQ_CONFIG = OpenAIUNetConfig()  # == FFHQ (improved_ddpm/script_util.py:5-22)
METFACE_CONFIG = OpenAIUNetConfig()  # == CelebA_HQ_P2 (guided_diffusion/script_util.py:10-46)
IMAGENET_CONFIG = OpenAIUNetConfig(
    model_channels=256,
    num_res_blocks=2,
    attention_ds=(8, 16, 32),
    num_classes=1000,
)  # improved_ddpm/script_util.py:25-42


# ---------------------------------------------------------------------------
# structural plan (mirrors UNetModel.__init__ walk)
# ---------------------------------------------------------------------------


def build_plan(cfg: OpenAIUNetConfig) -> Dict[str, Any]:
    mc = cfg.model_channels
    ch = input_ch = int(cfg.channel_mult[0] * mc)
    input_plan: List[List[dict]] = [[{"kind": "conv", "cin": cfg.in_channels, "cout": ch}]]
    chans = [ch]
    ds = 1
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            layers = [
                {"kind": "res", "cin": ch, "cout": int(mult * mc), "updown": None}
            ]
            ch = int(mult * mc)
            if ds in cfg.attention_ds:
                layers.append(
                    {"kind": "attn", "ch": ch, "heads": cfg.heads_for(ch)}
                )
            input_plan.append(layers)
            chans.append(ch)
        if level != len(cfg.channel_mult) - 1:
            if cfg.resblock_updown:
                layers = [{"kind": "res", "cin": ch, "cout": ch, "updown": "down"}]
            else:
                layers = [{"kind": "downsample", "cin": ch, "cout": ch}]
            input_plan.append(layers)
            chans.append(ch)
            ds *= 2

    middle_plan = [
        {"kind": "res", "cin": ch, "cout": ch, "updown": None},
        {"kind": "attn", "ch": ch, "heads": cfg.heads_for(ch)},
        {"kind": "res", "cin": ch, "cout": ch, "updown": None},
    ]

    output_plan: List[List[dict]] = []
    for level, mult in list(enumerate(cfg.channel_mult))[::-1]:
        for i in range(cfg.num_res_blocks + 1):
            ich = chans.pop()
            layers = [
                {"kind": "res", "cin": ch + ich, "cout": int(mc * mult), "updown": None}
            ]
            ch = int(mc * mult)
            if ds in cfg.attention_ds:
                layers.append(
                    {"kind": "attn", "ch": ch, "heads": cfg.heads_for(ch, upsample=True)}
                )
            if level and i == cfg.num_res_blocks:
                if cfg.resblock_updown:
                    layers.append({"kind": "res", "cin": ch, "cout": ch, "updown": "up"})
                else:
                    layers.append({"kind": "upsample", "cin": ch, "cout": ch})
                ds //= 2
            output_plan.append(layers)

    return {
        "input": input_plan,
        "middle": middle_plan,
        "output": output_plan,
        "out_ch_final": input_ch,
    }


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _res_init(key, spec, cfg):
    ks = cm.rsplit(key, 4)
    cin, cout = spec["cin"], spec["cout"]
    emb_out = 2 * cout if cfg.use_scale_shift_norm else cout
    p = {
        "in_norm": cm.norm_init(cin),
        "in_conv": cm.conv_init(ks[0], 3, 3, cin, cout),
        "emb": cm.linear_init(ks[1], cfg.temb_ch, emb_out),
        "out_norm": cm.norm_init(cout),
        "out_conv": cm.conv_init(ks[2], 3, 3, cout, cout, zero=True),
    }
    if cin != cout:
        p["skip_mat"] = cm.linear_init(ks[3], cin, cout)
    return p


def _attn_init(key, spec):
    ks = cm.rsplit(key, 2)
    ch = spec["ch"]
    return {
        "norm": cm.norm_init(ch),
        "qkv": cm.linear_init(ks[0], ch, ch * 3),
        "proj_out": cm.linear_init(ks[1], ch, ch, zero=True),
    }


def _layer_init(key, spec, cfg):
    if spec["kind"] == "res":
        return _res_init(key, spec, cfg)
    if spec["kind"] == "attn":
        return _attn_init(key, spec)
    if spec["kind"] in ("conv", "downsample", "upsample"):
        return cm.conv_init(key, 3, 3, spec["cin"], spec["cout"])
    raise ValueError(spec["kind"])


def init(key, cfg: OpenAIUNetConfig) -> Dict[str, Any]:
    plan = build_plan(cfg)
    keys = iter(cm.rsplit(key, 4096))
    nxt = lambda: next(keys)
    params: Dict[str, Any] = {
        "time_embed": {
            "dense0": cm.linear_init(nxt(), cfg.model_channels, cfg.temb_ch),
            "dense1": cm.linear_init(nxt(), cfg.temb_ch, cfg.temb_ch),
        }
    }
    if cfg.num_classes is not None:
        params["label_emb"] = {
            "w": cm.rnormal(nxt(), (cfg.num_classes, cfg.temb_ch)) * 0.02
        }
    for stem in ("input", "middle", "output"):
        if stem == "middle":
            params["middle_block"] = [
                _layer_init(nxt(), spec, cfg) for spec in plan["middle"]
            ]
        else:
            params[f"{stem}_blocks"] = [
                [_layer_init(nxt(), spec, cfg) for spec in block]
                for block in plan[stem]
            ]
    params["out_norm"] = cm.norm_init(plan["out_ch_final"])
    params["out_conv"] = cm.conv_init(nxt(), 3, 3, plan["out_ch_final"], cfg.out_channels, zero=True)
    return params


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------


def _resblock(p, spec, cfg, x, emb):
    """ResBlock with optional scale-shift norm and parameterless up/down
    (models/improved_ddpm/unet.py:278-298)."""
    updown = spec.get("updown")
    h = cm.group_norm(p["in_norm"], x, eps=1e-5)
    h = cm.swish(h)
    if updown == "down":
        h = cm.avg_pool_2x(h)
        x = cm.avg_pool_2x(x)
    elif updown == "up":
        h = cm.upsample_nearest_2x(h)
        x = cm.upsample_nearest_2x(x)
    h = cm.conv2d(p["in_conv"], h)

    emb_out = cm.linear(p["emb"], cm.swish(emb))
    if cfg.use_scale_shift_norm:
        scale, shift = jnp.split(emb_out, 2, axis=-1)
        h = cm.group_norm(p["out_norm"], h, eps=1e-5)
        h = h * (1.0 + scale[:, None, None, :]) + shift[:, None, None, :]
    else:
        h = h + emb_out[:, None, None, :]
        h = cm.group_norm(p["out_norm"], h, eps=1e-5)
    h = cm.swish(h)
    h = cm.conv2d(p["out_conv"], h)

    if "skip_mat" in p:
        x = cm.mat1x1(p["skip_mat"], x)
    elif "skip_conv" in p:
        x = cm.conv2d(p["skip_conv"], x)
    return x + h


def _attnblock(p, spec, cfg, x):
    """AttentionBlock (models/improved_ddpm/unet.py:301-347). The qkv conv
    operates on [B, C, T] in torch; here [B, T, C] with the head-channel
    layout preserved per attention order."""
    b, hh, ww, c = x.shape
    heads = spec["heads"]
    flat = x.reshape(b, hh * ww, c)
    normed = cm.group_norm_1d(p["norm"], flat, eps=1e-5)
    qkv = cm.linear(p["qkv"], normed)  # [B, T, 3C]
    t = hh * ww
    ch = c // heads
    if cfg.use_new_attention_order:
        # layout [3][H][ch] (QKVAttention, unet.py:403-431)
        qkv = qkv.reshape(b, t, 3, heads, ch)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    else:
        # layout [H][3ch] (QKVAttentionLegacy, unet.py:370-396)
        qkv = qkv.reshape(b, t, heads, 3, ch)
        q, k, v = qkv[:, :, :, 0], qkv[:, :, :, 1], qkv[:, :, :, 2]
    q = q.reshape(b, t, heads * ch)
    k = k.reshape(b, t, heads * ch)
    v = v.reshape(b, t, heads * ch)
    out = cm.spatial_attention(q, k, v, num_heads=heads, legacy_scale=True)
    out = cm.linear(p["proj_out"], out)
    return x + out.reshape(b, hh, ww, c)


def _apply_layer(p, spec, cfg, x, emb):
    kind = spec["kind"]
    if kind == "res":
        if cfg.remat:
            return jax.checkpoint(
                lambda pp, xx, ee: _resblock(pp, spec, cfg, xx, ee)
            )(p, x, emb)
        return _resblock(p, spec, cfg, x, emb)
    if kind == "attn":
        return _attnblock(p, spec, cfg, x)
    if kind == "conv":
        return cm.conv2d(p, x)
    if kind == "downsample":
        # torch stride-2 pad-1 conv pads (1,1); XLA "SAME" would pad (0,1)
        return cm.conv2d(p, x, stride=2, padding=((1, 1), (1, 1)))
    if kind == "upsample":
        return cm.conv2d(p, cm.upsample_nearest_2x(x))
    raise ValueError(kind)


def _decode(params, plan, cfg, h, hs, emb):
    hs = list(hs)
    for block, bparams in zip(plan["output"], params["output_blocks"]):
        h = jnp.concatenate([h, hs.pop()], axis=-1)
        for spec, p in zip(block, bparams):
            h = _apply_layer(p, spec, cfg, h, emb)
    h = cm.group_norm(params["out_norm"], h, eps=1e-5)
    h = cm.swish(h)
    return cm.conv2d(params["out_conv"], h)


def get_temb(params, cfg: OpenAIUNetConfig, t, y=None):
    emb = cm.timestep_embedding_openai(t, cfg.model_channels)
    emb = cm.linear(params["time_embed"]["dense0"], emb)
    emb = cm.swish(emb)
    emb = cm.linear(params["time_embed"]["dense1"], emb)
    # NOTE: the reference forward DELETED the upstream class-conditioning
    # add entirely — label_emb is constructed (unet.py:519-520) but never
    # applied in forward (:676-752); Asyrp never passes labels;
    # we keep it available behind `y`.
    if y is not None and "label_emb" in params:
        emb = emb + params["label_emb"]["w"][y]
    return emb


def apply(
    params,
    cfg: OpenAIUNetConfig,
    x: jnp.ndarray,
    t: jnp.ndarray,
    edit: Optional[EditState] = None,
    y: Optional[jnp.ndarray] = None,
    plan: Optional[dict] = None,
    decode_mode: str = "auto",
):
    """Forward matching UNetModel.forward (improved_ddpm/unet.py:676-752):
    returns (eps_raw, eps_mod_raw|None, delta_h|None, middle_h). Raw outputs
    keep the 2*C learn-sigma channels — split in core/sampler.py.
    `decode_mode="split"` forces two B-sized decodes so the grad-free plain
    decode's backward is DCE'd under training (see models/ddpmpp.py apply)."""
    if decode_mode not in ("auto", "split"):
        raise ValueError(f"decode_mode must be 'auto'|'split', got {decode_mode!r}")
    plan = plan or build_plan(cfg)
    # cast the f32 embedding to the activation dtype — the per-block emb adds
    # otherwise promote a bf16 network back to f32 (see models/ddpmpp.py)
    emb = get_temb(params, cfg, t, y).astype(x.dtype)

    h = x
    hs = []
    for block, bparams in zip(plan["input"], params["input_blocks"]):
        for spec, p in zip(block, bparams):
            h = _apply_layer(p, spec, cfg, h, emb)
        hs.append(h)
    for spec, p in zip(plan["middle"], params["middle_block"]):
        h = _apply_layer(p, spec, cfg, h, emb)
    middle_h = h

    if edit is None:
        eps = _decode(params, plan, cfg, h, hs, emb)
        return eps, None, None, middle_h

    h2, delta_h = apply_edit(edit, h, emb)
    if x.shape[0] == 1 or decode_mode == "split":
        # batch-1 serving: two batch-1 decodes beat one batch-2 stacked
        # decode (see models/ddpmpp.py apply + BASELINE.md round 2)
        eps = _decode(params, plan, cfg, h, hs, emb)
        eps_mod = _decode(params, plan, cfg, h2, hs, emb)
    else:
        stacked = jnp.concatenate([h, h2], axis=0)
        skips = [jnp.concatenate([s, s], axis=0) for s in hs]
        emb2 = jnp.concatenate([emb, emb], axis=0)
        out = _decode(params, plan, cfg, stacked, skips, emb2)
        eps, eps_mod = jnp.split(out, 2, axis=0)
    return eps, eps_mod, delta_h, middle_h


# ---------------------------------------------------------------------------
# torch conversion (validated against the plan)
# ---------------------------------------------------------------------------


def params_from_torch(sd, cfg: OpenAIUNetConfig) -> Dict[str, Any]:
    from asyrp_official_tpu.compat.torch_convert import convert_openai_unet

    raw = convert_openai_unet(sd, cfg)
    plan = build_plan(cfg)
    params: Dict[str, Any] = {"time_embed": raw["time_embed"]}
    if "label_emb" in raw:
        params["label_emb"] = raw["label_emb"]

    def check(stem_plan, stem_raw, name):
        out = []
        assert len(stem_plan) == len(stem_raw), (
            f"{name}: plan has {len(stem_plan)} blocks, ckpt has {len(stem_raw)}"
        )
        for bi, (block, rblock) in enumerate(zip(stem_plan, stem_raw)):
            kinds = [s["kind"] for s in block]
            # converter kinds: conv/res/attn/down/up
            rkinds = [
                {"down": "downsample", "up": "upsample"}.get(k, k)
                for k, _ in rblock
            ]
            assert kinds == rkinds, f"{name}[{bi}]: plan {kinds} vs ckpt {rkinds}"
            out.append([p for _, p in rblock])
        return out

    params["input_blocks"] = check(plan["input"], raw["input_blocks"], "input")
    params["output_blocks"] = check(plan["output"], raw["output_blocks"], "output")
    mid_kinds = [s["kind"] for s in plan["middle"]]
    rmid_kinds = [k for k, _ in raw["middle_block"]]
    assert mid_kinds == rmid_kinds, f"middle: {mid_kinds} vs {rmid_kinds}"
    params["middle_block"] = [p for _, p in raw["middle_block"]]
    params["out_norm"] = raw["out_norm"]
    params["out_conv"] = raw["out_conv"]
    return params
