"""Full CLIP tower parity vs an INDEPENDENT implementation (HuggingFace
transformers CLIPModel with quick_gelu) — random weights mapped into the
OpenAI layout our converter expects. Validates the whole vision+text towers
end to end, not just the attention blocks."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asyrp_official_tpu.losses import clip_model as cm

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def hf_model():
    from transformers import CLIPConfig, CLIPModel, CLIPTextConfig, CLIPVisionConfig

    cfg = CLIPConfig(
        # head_dim must be 64: our CLIPConfig derives heads as width//64,
        # which holds for every real OpenAI CLIP checkpoint
        # eos_token_id=99: HF pools at the EOS position, OpenAI at
        # argmax(token id) — align by making 99 both the max id and EOS
        text_config=CLIPTextConfig(
            hidden_size=128, intermediate_size=512, num_hidden_layers=2,
            num_attention_heads=2, max_position_embeddings=16,
            vocab_size=100, hidden_act="quick_gelu", projection_dim=32,
            eos_token_id=99,
        ).to_dict(),
        vision_config=CLIPVisionConfig(
            hidden_size=256, intermediate_size=1024, num_hidden_layers=2,
            num_attention_heads=4, image_size=32, patch_size=8,
            hidden_act="quick_gelu", projection_dim=32,
        ).to_dict(),
        projection_dim=32,
    )
    torch.manual_seed(0)
    model = CLIPModel(cfg)
    model.eval()
    return model


def _hf_to_openai_params(m):
    """Map HF CLIPModel weights into our (OpenAI-layout) param tree."""
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}

    def blocks(prefix, n):
        out = []
        for i in range(n):
            p = f"{prefix}.encoder.layers.{i}"
            qkv_w = np.concatenate(
                [sd[f"{p}.self_attn.{x}_proj.weight"] for x in ("q", "k", "v")]
            )
            qkv_b = np.concatenate(
                [sd[f"{p}.self_attn.{x}_proj.bias"] for x in ("q", "k", "v")]
            )
            out.append({
                "ln_1": {"scale": jnp.asarray(sd[f"{p}.layer_norm1.weight"]),
                         "bias": jnp.asarray(sd[f"{p}.layer_norm1.bias"])},
                "attn": {
                    "in_proj_w": jnp.asarray(qkv_w),
                    "in_proj_b": jnp.asarray(qkv_b),
                    "out_proj_w": jnp.asarray(sd[f"{p}.self_attn.out_proj.weight"]),
                    "out_proj_b": jnp.asarray(sd[f"{p}.self_attn.out_proj.bias"]),
                },
                "ln_2": {"scale": jnp.asarray(sd[f"{p}.layer_norm2.weight"]),
                         "bias": jnp.asarray(sd[f"{p}.layer_norm2.bias"])},
                "mlp": {
                    "c_fc_w": jnp.asarray(sd[f"{p}.mlp.fc1.weight"]),
                    "c_fc_b": jnp.asarray(sd[f"{p}.mlp.fc1.bias"]),
                    "c_proj_w": jnp.asarray(sd[f"{p}.mlp.fc2.weight"]),
                    "c_proj_b": jnp.asarray(sd[f"{p}.mlp.fc2.bias"]),
                },
            })
        return out

    params = {
        "visual": {
            "conv1_w": jnp.asarray(np.transpose(
                sd["vision_model.embeddings.patch_embedding.weight"], (2, 3, 1, 0)
            )),
            "class_embedding": jnp.asarray(
                sd["vision_model.embeddings.class_embedding"]
            ),
            "positional_embedding": jnp.asarray(
                sd["vision_model.embeddings.position_embedding.weight"]
            ),
            "ln_pre": {"scale": jnp.asarray(sd["vision_model.pre_layrnorm.weight"]),
                       "bias": jnp.asarray(sd["vision_model.pre_layrnorm.bias"])},
            "transformer": {"resblocks": blocks("vision_model", 2)},
            "ln_post": {"scale": jnp.asarray(sd["vision_model.post_layernorm.weight"]),
                        "bias": jnp.asarray(sd["vision_model.post_layernorm.bias"])},
            "proj": jnp.asarray(sd["visual_projection.weight"].T),
        },
        "token_embedding": jnp.asarray(
            sd["text_model.embeddings.token_embedding.weight"]
        ),
        "positional_embedding": jnp.asarray(
            sd["text_model.embeddings.position_embedding.weight"]
        ),
        "transformer": {"resblocks": blocks("text_model", 2)},
        "ln_final": {"scale": jnp.asarray(sd["text_model.final_layer_norm.weight"]),
                     "bias": jnp.asarray(sd["text_model.final_layer_norm.bias"])},
        "text_projection": jnp.asarray(sd["text_projection.weight"].T),
        "logit_scale": jnp.asarray(sd["logit_scale"]),
    }
    return params


CFG = cm.CLIPConfig(
    embed_dim=32, image_resolution=32, vision_layers=2, vision_width=256,
    vision_patch_size=8, context_length=16, vocab_size=100,
    transformer_width=128, transformer_heads=2, transformer_layers=2,
)


def test_vision_tower_matches_hf(hf_model):
    params = _hf_to_openai_params(hf_model)
    x = np.random.RandomState(0).randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref = hf_model.get_image_features(pixel_values=torch.from_numpy(x)).numpy()
    ours = cm.encode_image(
        params, CFG, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    )
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-4)


def test_text_tower_matches_hf(hf_model):
    params = _hf_to_openai_params(hf_model)
    # eos_token_id in HF tiny config defaults to 2 — our pooling takes
    # argmax(token), so make the EOS the max id in each row
    tokens = np.zeros((2, 16), np.int64)
    tokens[0, :4] = [49, 10, 20, 99]
    tokens[1, :3] = [49, 30, 99]
    with torch.no_grad():
        ref = hf_model.get_text_features(
            input_ids=torch.from_numpy(tokens),
            attention_mask=torch.ones_like(torch.from_numpy(tokens)),
        ).numpy()
    ours = cm.encode_text(params, CFG, jnp.asarray(tokens.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-4)
