"""Cross-execute the reference `CLIPLoss` term by term.

The training cross-tests exercise only the default-lambda path (the
directional term inside -log((2-L)/2)); here the reference's own
`losses/clip_loss.py` methods run behind the shim CLIP towers and each of
the five loss terms (directional / global / angle / texture / patch) is
compared against our functional port on the SAME weights, images, prompts,
and — for the patch term — the same np.random patch centers.

Runs at 512x512 source images: the patch term's hardcoded 510-px patches
(losses/clip_loss.py:246-258) need >= 511-px inputs, and the 512->256 /
510->256 tensor resizes exercise the torch-exact bicubic path of
`clip_preprocess` (jax.image.resize diverged 0.225 on [0,1] pixels there).
"""
import os
import pathlib
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent / "refshims"))
import refboot  # noqa: E402

from test_reference_product_parity import _toy_merges  # noqa: E402

SRC, TRG = "face", "smiling face"


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    refboot.install()
    root = tmp_path_factory.mktemp("cliploss")
    vocab = root / "toy_vocab.txt.gz"
    _toy_merges(str(vocab))
    os.environ["ASYRP_TPU_CLIP_BPE"] = str(vocab)

    import clip as clip_shim

    from asyrp_official_tpu.losses import clip_loss as cl
    from asyrp_official_tpu.losses import clip_model as cm
    from asyrp_official_tpu.losses import tokenizer as tok

    CLIPLoss = refboot.load_ref_module(
        "ref_losses_clip", filename="losses/clip_loss.py"
    ).CLIPLoss

    ref_loss = CLIPLoss(
        "cpu", lambda_direction=1.0, lambda_patch=1.0, lambda_global=1.0,
        lambda_manifold=1.0, lambda_texture=1.0, clip_model="ViT-B/32",
    )

    sd = {
        k: v.detach().numpy()
        for k, v in clip_shim.hf_state_dict_openai_layout().items()
    }
    params, cfg = cm.params_from_torch(sd)
    ctx = cl.CLIPContext(params, cfg, bpe=tok.SimpleTokenizer(str(vocab)))

    rng = np.random.RandomState(0)
    imgs = {}
    for name, seed in (("src", 1), ("trg", 2), ("tex", 3)):
        rng = np.random.RandomState(seed)
        imgs[name] = (rng.rand(2, 512, 512, 3).astype(np.float32) * 2 - 1)
    return ref_loss, ctx, cl, imgs


def _t(img_nhwc):
    return torch.from_numpy(np.transpose(img_nhwc, (0, 3, 1, 2)))


def test_directional_term(setup):
    ref_loss, ctx, cl, imgs = setup
    with torch.no_grad():
        ref = float(ref_loss.clip_directional_loss(
            _t(imgs["src"]), SRC, _t(imgs["trg"]), TRG
        ))
    td = ctx.compute_text_direction(SRC, TRG)
    ours = float(cl.directional_loss(
        ctx, jnp.asarray(imgs["src"]), jnp.asarray(imgs["trg"]), td
    ))
    np.testing.assert_allclose(ours, ref, rtol=0, atol=2e-3)


def test_global_term(setup):
    ref_loss, ctx, cl, imgs = setup
    with torch.no_grad():
        ref = float(ref_loss.global_clip_loss(_t(imgs["trg"]), [f"a {TRG}"]))
    tf = ctx.encode_text([f"a {TRG}"])
    ours = float(cl.global_loss(ctx, jnp.asarray(imgs["trg"]), tf))
    np.testing.assert_allclose(ours, ref, rtol=0, atol=2e-3)


def test_angle_term(setup):
    ref_loss, ctx, cl, imgs = setup
    with torch.no_grad():
        ref = float(ref_loss.clip_angle_loss(
            _t(imgs["src"]), SRC, _t(imgs["trg"]), TRG
        ))
    sf = ctx.get_text_features(SRC).mean(axis=0, keepdims=True)
    sf = sf / jnp.linalg.norm(sf, axis=-1, keepdims=True)
    tf = ctx.get_text_features(TRG).mean(axis=0, keepdims=True)
    tf = tf / jnp.linalg.norm(tf, axis=-1, keepdims=True)
    ours = float(cl.angle_loss(
        ctx, jnp.asarray(imgs["src"]), jnp.asarray(imgs["trg"]), sf, tf
    ))
    np.testing.assert_allclose(ours, ref, rtol=0, atol=2e-3)


def test_texture_term(setup):
    ref_loss, ctx, cl, imgs = setup
    with torch.no_grad():
        ref = float(ref_loss.cnn_feature_loss(_t(imgs["tex"]), _t(imgs["trg"])))
    # the shim's "RN50" is the same deterministic tiny tower, so the same
    # ctx serves as the cnn context
    ours = float(cl.texture_loss(
        ctx, jnp.asarray(imgs["tex"]), jnp.asarray(imgs["trg"])
    ))
    np.testing.assert_allclose(ours, ref, rtol=0, atol=2e-3)


def test_patch_term(setup):
    ref_loss, ctx, cl, imgs = setup
    # replay the reference's np.random patch-center draw: seed, capture the
    # centers via the reference's own helper, then re-seed so the actual
    # loss call draws the identical sequence (random_patch_centers,
    # losses/clip_loss.py:193-199; x column first, then y)
    np.random.seed(7)
    centers = ref_loss.random_patch_centers((2, 3, 512, 512), 1, 510)
    np.random.seed(7)
    with torch.no_grad():
        ref = float(ref_loss.patch_directional_loss(
            _t(imgs["src"]), SRC, _t(imgs["trg"]), TRG
        ))

    from asyrp_official_tpu.utils.assets import clip_templates

    parts = clip_templates()["part_templates"]
    dirs = jnp.concatenate([
        ctx.compute_text_direction(t.format(SRC), t.format(TRG))
        for t in parts
    ])
    ours = float(cl.patch_directional_loss(
        ctx, jnp.asarray(imgs["src"]), jnp.asarray(imgs["trg"]), dirs,
        rng=None, patch_size=510, num_patches=1,
        centers=(centers[:, 0], centers[:, 1]),
    ))
    np.testing.assert_allclose(ours, ref, rtol=0, atol=2e-3)
