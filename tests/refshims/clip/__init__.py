"""`clip` package shim for cross-executing the reference (see
refshims/README.md).

`load()` returns a tiny HuggingFace `CLIPModel` (quick_gelu — OpenAI
activation; eos = max token id so HF's eos-pooling coincides with OpenAI's
argmax-pooling) wrapped in the OpenAI `encode_text`/`encode_image`
interface, built deterministically from a fixed seed. The HF implementation
is the INDEPENDENT tower our JAX CLIP is parity-tested against
(test_clip_tower_parity.py), so handing the same weights to both frameworks
makes the cross-executed losses comparable.

`tokenize()` reuses our package tokenizer over the merges file named by
ASYRP_TPU_CLIP_BPE — both frameworks tokenize identically by construction;
tokenizer correctness itself is pinned against transformers.CLIPTokenizer
in test_tokenizer_hf_parity.py.

The vision resolution is 256 with patch 32, so the 5-stage preprocess
(Resize/CenterCrop/<convert>/ToTensor/Normalize — CLIPLoss slices
transforms[:2] and transforms[4:], losses/clip_loss.py:39-41) is an
IDENTITY resize at the cross-test's 256x256 image size: no torchvision-vs-
jax resampling semantics enter the comparison.
"""
import os

import numpy as np
import torch

import torchvision.transforms as _T

N_PX = 256
_PATCH = 32
_WIDTH = 128
_LAYERS = 2
_EMBED = 64
_SEED = 20260819

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)

_models = {}
_bpe = None


def _tokenizer():
    global _bpe
    if _bpe is None:
        from asyrp_official_tpu.losses import tokenizer as tok

        path = os.environ.get("ASYRP_TPU_CLIP_BPE")
        if not path:
            raise RuntimeError(
                "refshim clip: set ASYRP_TPU_CLIP_BPE to the merges file "
                "shared with the JAX side"
            )
        _bpe = tok.SimpleTokenizer(path)
    return _bpe


class _WrappedCLIP(torch.nn.Module):
    """OpenAI `clip.model.CLIP` call surface over an HF CLIPModel."""

    def __init__(self, hf_model):
        super().__init__()
        self.hf = hf_model

    @property
    def visual(self):
        return self.hf.vision_model

    def encode_text(self, tokens):
        return self.hf.get_text_features(input_ids=tokens)

    def encode_image(self, images):
        return self.hf.get_image_features(pixel_values=images)

    def forward(self, image, text):
        img = self.encode_image(image)
        txt = self.encode_text(text)
        img = img / img.norm(dim=-1, keepdim=True)
        txt = txt / txt.norm(dim=-1, keepdim=True)
        scale = self.hf.logit_scale.exp()
        return scale * img @ txt.t(), scale * txt @ img.t()


def _build_hf(seed):
    from transformers import (
        CLIPConfig,
        CLIPModel,
        CLIPTextConfig,
        CLIPVisionConfig,
    )

    vocab = len(_tokenizer().encoder)
    cfg = CLIPConfig(
        text_config=CLIPTextConfig(
            hidden_size=_WIDTH, intermediate_size=_WIDTH * 4,
            num_hidden_layers=_LAYERS,
            # heads must be width//64: our config_from_torch derives them
            # that way (true of every real OpenAI ckpt)
            num_attention_heads=_WIDTH // 64,
            max_position_embeddings=77, vocab_size=vocab,
            hidden_act="quick_gelu", projection_dim=_EMBED,
            # eos = max id → HF eos-pooling == OpenAI argmax-pooling
            eos_token_id=vocab - 1,
        ).to_dict(),
        vision_config=CLIPVisionConfig(
            hidden_size=_WIDTH, intermediate_size=_WIDTH * 4,
            num_hidden_layers=_LAYERS, num_attention_heads=_WIDTH // 64,
            image_size=N_PX, patch_size=_PATCH,
            hidden_act="quick_gelu", projection_dim=_EMBED,
        ).to_dict(),
        projection_dim=_EMBED,
    )
    with torch.random.fork_rng():
        torch.manual_seed(seed)
        model = CLIPModel(cfg)
    model.eval()
    return model


def _preprocess():
    def _convert_image_to_rgb(image):
        return image.convert("RGB")

    return _T.Compose([
        _T.Resize(N_PX, interpolation=_T.BICUBIC),
        _T.CenterCrop(N_PX),
        _convert_image_to_rgb,
        _T.ToTensor(),
        _T.Normalize(CLIP_MEAN, CLIP_STD),
    ])


def available_models():
    return ["ViT-B/32", "ViT-B/16", "RN50"]


def load(name, device="cpu", jit=False, download_root=None):
    if name not in _models:
        _models[name] = _WrappedCLIP(_build_hf(_SEED))
    return _models[name].to(device), _preprocess()


def tokenize(texts, context_length=77, truncate=False):
    from asyrp_official_tpu.losses import tokenizer as tok

    arr = tok.tokenize(texts, _tokenizer(), context_length)
    return torch.from_numpy(np.asarray(arr)).to(torch.long)


def hf_state_dict_openai_layout(name="ViT-B/32"):
    """The shim model's weights in the OpenAI clip state_dict layout —
    the cross-test saves this for our CLI's --clip_ckpt. Not part of the
    real clip API."""
    model, _ = load(name)
    sd = {k: v.detach().numpy() for k, v in model.hf.state_dict().items()}

    out = {}

    def blocks(src_prefix, dst_prefix, n=_LAYERS):
        for i in range(n):
            p = f"{src_prefix}.encoder.layers.{i}"
            d = f"{dst_prefix}transformer.resblocks.{i}"
            out[f"{d}.attn.in_proj_weight"] = np.concatenate(
                [sd[f"{p}.self_attn.{x}_proj.weight"] for x in ("q", "k", "v")]
            )
            out[f"{d}.attn.in_proj_bias"] = np.concatenate(
                [sd[f"{p}.self_attn.{x}_proj.bias"] for x in ("q", "k", "v")]
            )
            out[f"{d}.attn.out_proj.weight"] = sd[f"{p}.self_attn.out_proj.weight"]
            out[f"{d}.attn.out_proj.bias"] = sd[f"{p}.self_attn.out_proj.bias"]
            out[f"{d}.ln_1.weight"] = sd[f"{p}.layer_norm1.weight"]
            out[f"{d}.ln_1.bias"] = sd[f"{p}.layer_norm1.bias"]
            out[f"{d}.ln_2.weight"] = sd[f"{p}.layer_norm2.weight"]
            out[f"{d}.ln_2.bias"] = sd[f"{p}.layer_norm2.bias"]
            out[f"{d}.mlp.c_fc.weight"] = sd[f"{p}.mlp.fc1.weight"]
            out[f"{d}.mlp.c_fc.bias"] = sd[f"{p}.mlp.fc1.bias"]
            out[f"{d}.mlp.c_proj.weight"] = sd[f"{p}.mlp.fc2.weight"]
            out[f"{d}.mlp.c_proj.bias"] = sd[f"{p}.mlp.fc2.bias"]

    out["visual.conv1.weight"] = sd["vision_model.embeddings.patch_embedding.weight"]
    out["visual.class_embedding"] = sd["vision_model.embeddings.class_embedding"]
    out["visual.positional_embedding"] = sd[
        "vision_model.embeddings.position_embedding.weight"
    ]
    out["visual.ln_pre.weight"] = sd["vision_model.pre_layrnorm.weight"]
    out["visual.ln_pre.bias"] = sd["vision_model.pre_layrnorm.bias"]
    blocks("vision_model", "visual.")
    out["visual.ln_post.weight"] = sd["vision_model.post_layernorm.weight"]
    out["visual.ln_post.bias"] = sd["vision_model.post_layernorm.bias"]
    out["visual.proj"] = sd["visual_projection.weight"].T
    out["token_embedding.weight"] = sd["text_model.embeddings.token_embedding.weight"]
    out["positional_embedding"] = sd[
        "text_model.embeddings.position_embedding.weight"
    ]
    blocks("text_model", "")
    out["ln_final.weight"] = sd["text_model.final_layer_norm.weight"]
    out["ln_final.bias"] = sd["text_model.final_layer_norm.bias"]
    out["text_projection"] = sd["text_projection.weight"].T
    out["logit_scale"] = sd["logit_scale"]
    return {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in out.items()}
