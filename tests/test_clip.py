"""CLIP JAX port: block-level parity vs torch, tokenizer algorithm checks,
loss properties, asset integrity, interval selection."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asyrp_official_tpu.losses import clip_loss as cl
from asyrp_official_tpu.losses import clip_model as cm
from asyrp_official_tpu.losses import tokenizer as tok
from asyrp_official_tpu.pipelines.interval import select_interval
from asyrp_official_tpu.utils import assets

TINY = cm.CLIPConfig(
    embed_dim=32,
    image_resolution=32,
    vision_layers=2,
    vision_width=64,
    vision_patch_size=8,
    context_length=16,
    vocab_size=100,
    transformer_width=32,
    transformer_heads=4,
    transformer_layers=2,
)


def test_mha_matches_torch():
    import torch

    width, heads, b, t = 32, 4, 2, 7
    torch_mha = torch.nn.MultiheadAttention(width, heads, batch_first=True)
    torch_mha.eval()
    p = {
        "in_proj_w": jnp.asarray(torch_mha.in_proj_weight.detach().numpy()),
        "in_proj_b": jnp.asarray(torch_mha.in_proj_bias.detach().numpy()),
        "out_proj_w": jnp.asarray(torch_mha.out_proj.weight.detach().numpy()),
        "out_proj_b": jnp.asarray(torch_mha.out_proj.bias.detach().numpy()),
    }
    x = np.random.RandomState(0).randn(b, t, width).astype(np.float32)
    with torch.no_grad():
        ref, _ = torch_mha(torch.from_numpy(x), torch.from_numpy(x), torch.from_numpy(x))
    ours = cm._mha(p, jnp.asarray(x), heads)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_mha_causal_mask_matches_torch():
    import torch

    width, heads, b, t = 32, 4, 1, 5
    torch_mha = torch.nn.MultiheadAttention(width, heads, batch_first=True)
    torch_mha.eval()
    p = {
        "in_proj_w": jnp.asarray(torch_mha.in_proj_weight.detach().numpy()),
        "in_proj_b": jnp.asarray(torch_mha.in_proj_bias.detach().numpy()),
        "out_proj_w": jnp.asarray(torch_mha.out_proj.weight.detach().numpy()),
        "out_proj_b": jnp.asarray(torch_mha.out_proj.bias.detach().numpy()),
    }
    x = np.random.RandomState(1).randn(b, t, width).astype(np.float32)
    causal = torch.triu(torch.full((t, t), float("-inf")), diagonal=1)
    with torch.no_grad():
        ref, _ = torch_mha(
            torch.from_numpy(x), torch.from_numpy(x), torch.from_numpy(x),
            attn_mask=causal,
        )
    mask = jnp.triu(jnp.full((t, t), -jnp.inf), k=1)
    ours = cm._mha(p, jnp.asarray(x), heads, mask)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)

@pytest.mark.slow
def test_encode_shapes_and_grad():
    params = cm.init(jax.random.PRNGKey(0), TINY)
    imgs = jnp.zeros((2, 32, 32, 3))
    feats = cm.encode_image(params, TINY, imgs)
    assert feats.shape == (2, 32)
    tokens = jnp.asarray(np.array([[5, 3, 99, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]] * 2))
    tfeat = cm.encode_text(params, TINY, tokens)
    assert tfeat.shape == (2, 32)
    # image encoder must be differentiable (trains through the CLIP loss)
    g = jax.grad(lambda im: cm.encode_image(params, TINY, im).sum())(imgs)
    assert bool(jnp.isfinite(g).all()) and float(jnp.abs(g).max()) > 0


def test_eot_pooling_uses_argmax_token():
    params = cm.init(jax.random.PRNGKey(1), TINY)
    t1 = np.zeros((1, 16), np.int32)
    t1[0, :3] = [10, 99, 0]  # EOT(=99 max id) at position 1
    t2 = np.zeros((1, 16), np.int32)
    t2[0, :5] = [10, 20, 30, 40, 99]  # EOT at position 4
    f1 = cm.encode_text(params, TINY, jnp.asarray(t1))
    f2 = cm.encode_text(params, TINY, jnp.asarray(t2))
    assert not np.allclose(np.asarray(f1), np.asarray(f2))


def test_tokenizer_bytes_to_unicode_reversible():
    m = tok.bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256


def test_tokenize_shapes_and_framing():
    arr = tok.tokenize(["a smiling face", "sad face"], tok.HashTokenizer())
    assert arr.shape == (2, 77)
    assert arr[0, 0] == 49406  # SOT
    assert 49407 in arr[0]  # EOT present
    assert arr.dtype == np.int32


def test_bpe_tokenizer_with_synthetic_vocab(tmp_path):
    """Exercise the real BPE machinery with a small synthetic merges file."""
    import gzip

    merges = ["#version: 0.2"]
    # merge 'h'+'i</w>' then 's'+'m'
    merges += ["h i</w>", "s m", "sm i"]
    p = tmp_path / "vocab.txt.gz"
    with gzip.open(p, "wt") as f:
        f.write("\n".join(merges))
    t = tok.SimpleTokenizer(str(p))
    ids = t.encode("hi")
    assert t.decode(ids).strip() == "hi"
    ids2 = t.encode("smi")
    assert t.decode(ids2).strip() == "smi"
    # the merged token 'hi</w>' must be a single id
    assert len(ids) == 1


def test_clip_preprocess_range():
    img = jnp.zeros((1, 256, 256, 3))  # mid-gray in [-1,1]
    out = cl.clip_preprocess(img)
    assert out.shape == (1, 224, 224, 3)
    expected = (0.5 - cl.CLIP_MEAN) / cl.CLIP_STD
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]), expected, rtol=1e-5)


def test_clip_preprocess_resize_matches_torch_tensor_path():
    """The reference's composed CLIP preprocess resizes TENSORS via
    torchvision -> F.interpolate(bicubic, align_corners=False, no
    antialias, a=-0.75). jax.image.resize uses a different kernel AND
    antialiases (measured 0.225 max error on [0,1] pixels at the real
    256->224 production shape); clip_preprocess now uses exact
    torch-semantics interpolation matrices — pin it at downsample,
    upsample, and the patch-loss shape."""
    import torch

    rng = np.random.RandomState(0)
    for h, res in [(256, 224), (128, 224), (510, 224)]:
        img = (rng.rand(2, h, h, 3).astype(np.float32) * 2 - 1) * 1.3
        ours = np.transpose(np.asarray(cl.clip_preprocess(jnp.asarray(img), res)), (0, 3, 1, 2))
        x = torch.from_numpy(np.transpose((img + 1) * 0.5, (0, 3, 1, 2)))
        xr = torch.nn.functional.interpolate(
            x, size=(res, res), mode="bicubic", align_corners=False
        ).numpy()
        ref = (xr - cl.CLIP_MEAN[:, None, None]) / cl.CLIP_STD[:, None, None]
        assert np.abs(ours - ref).max() < 5e-4, (h, res)


def test_directional_loss_properties():
    params = cm.init(jax.random.PRNGKey(2), TINY)
    ctx = cl.CLIPContext(params, TINY, tok.HashTokenizer())
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32) * 0.1)
    trg = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32) * 0.1)
    d = ctx.compute_text_direction("face", "smiling face")
    loss = cl.directional_loss(ctx, src, trg, d)
    assert np.isfinite(float(loss)) and 0.0 <= float(loss) <= 2.0
    # differentiable wrt the edited image
    g = jax.grad(lambda t: cl.directional_loss(ctx, src, t, d))(trg)
    assert float(jnp.abs(g).max()) > 0


def test_train_clip_term_runs_and_matches_formula():
    params = cm.init(jax.random.PRNGKey(3), TINY)
    ctx = cl.CLIPContext(params, TINY, tok.HashTokenizer())
    extra = cl.train_clip_term(ctx, "face", "smiling face", clip_loss_w=0.8)
    rng = np.random.RandomState(1)
    x0 = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32) * 0.1)
    x0t = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32) * 0.1)
    val = float(extra(x0, x0t))
    d = ctx.compute_text_direction("face", "smiling face")
    ld = float(cl.directional_loss(ctx, x0, x0t, d))
    assert val == pytest.approx(0.8 * -np.log((2 - ld) / 2), rel=1e-5)


# ---------------------------------------------------------------------------
# assets + interval
# ---------------------------------------------------------------------------


def test_assets_prompts():
    dic = assets.src_trg_prompts()
    assert "smiling" in dic
    src, trg = dic["smiling"]
    assert isinstance(src, list) and isinstance(trg, list)
    assert len(assets.clip_templates()["imagenet_templates"]) == 79


def test_assets_lpips_curves():
    c = assets.lpips_curve("celeba", "x0_t")
    assert len(c) >= 990
    assert c[1] == pytest.approx(0.00848, abs=1e-4)  # BASELINE.md row


def test_interval_matches_reference_presets():
    """t_edit at effective threshold 0.3 must reproduce utils/t_edit_dic.py."""
    presets = assets.t_edit_presets()["T_EDIT_DIC_LPIPS_0_3"]
    for ds, expect in presets.items():
        t_edit, _ = select_interval(
            ds, cosine=1.0, lpips_edit_th=0.3, lpips_addnoise_th=0.1
        )
        assert t_edit == expect, (ds, t_edit, expect)


def test_interval_user_overrides():
    assert select_interval(
        "celeba", 0.8, user_defined_t_edit=400, user_defined_t_addnoise=150
    ) == (400, 150)


def test_interval_addnoise_from_xt_curve():
    t_edit, t_add = select_interval(
        "celeba", 1.0, lpips_edit_th=0.3, lpips_addnoise_th=0.1,
        add_noise_from_xt=True,
    )
    # x curve rises much slower than x0_t → later t_addnoise
    _, t_add_default = select_interval(
        "celeba", 1.0, lpips_edit_th=0.3, lpips_addnoise_th=0.1
    )
    assert t_add != t_add_default
