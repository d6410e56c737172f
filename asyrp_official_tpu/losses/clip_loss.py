"""CLIP loss stack — functional JAX port of the reference CLIPLoss
(losses/clip_loss.py:30-299): directional / global / patch / angle /
texture losses with template prompt augmentation.

Differentiable end-to-end: the directional loss runs INSIDE the compiled
training step (the reference calls it per timestep, diffusion_latent.py:343).
Text features are precomputed once on the host (they never change during
training) and closed over as constants — the reference caches
`target_direction` the same way (losses/clip_loss.py:172-173).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from asyrp_official_tpu.losses import clip_model, clip_resnet, tokenizer as tok
from asyrp_official_tpu.utils.assets import clip_templates

__all__ = ["CLIPContext", "clip_preprocess", "directional_loss", "train_clip_term"]

# CLIP normalization constants (the `clip_preprocess.transforms[4:]` step,
# losses/clip_loss.py:39-41)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def _torch_bicubic_matrix(n_in: int, n_out: int, a: float = -0.75) -> np.ndarray:
    """[n_out, n_in] interpolation matrix reproducing
    `torch.nn.functional.interpolate(mode="bicubic", align_corners=False)`
    — the tensor path the reference's composed CLIP preprocess actually
    takes (torchvision-0.10 Resize on tensors; no antialiasing, Keys
    kernel a=-0.75, replicate borders). jax.image.resize differs on BOTH
    counts (a=-0.5 kernel, antialiased downsampling), which would shift
    every CLIP feature whenever image size != n_px (e.g. 256² diffusion
    outputs into the real 224-px ViT towers)."""

    def w(t):
        at = abs(t)
        if at <= 1.0:
            return ((a + 2.0) * at - (a + 3.0)) * at * at + 1.0
        if at < 2.0:
            return a * (((at - 5.0) * at + 8.0) * at - 4.0)
        return 0.0

    scale = n_in / n_out
    m = np.zeros((n_out, n_in), np.float64)
    for i in range(n_out):
        src = (i + 0.5) * scale - 0.5
        f = int(np.floor(src))
        t = src - f
        for k in range(-1, 3):
            m[i, min(max(f + k, 0), n_in - 1)] += w(t - k)
    return m.astype(np.float32)


def clip_preprocess(img: jnp.ndarray, resolution: int = 224) -> jnp.ndarray:
    """GAN-range image [B, H, W, 3] in [-1, 1] → CLIP input.

    Mirrors the composed preprocess (losses/clip_loss.py:39-41):
    un-normalize to [0,1], resize shorter side → center crop (inputs here
    are square, so one bicubic resize), CLIP mean/std normalize.
    Differentiable; the resize is two exact torch-semantics interpolation
    matmuls (MXU-friendly, bit-faithful to the reference's tensor path)."""
    x = (img + 1.0) * 0.5
    b, h, w, c = x.shape
    if (h, w) != (resolution, resolution):
        rh = jnp.asarray(_torch_bicubic_matrix(h, resolution))
        rw = jnp.asarray(_torch_bicubic_matrix(w, resolution))
        x = jnp.einsum("oh,bhwc->bowc", rh, x)
        x = jnp.einsum("pw,bhwc->bhpc", rw, x)
    # NO clamp: the reference's composed tensor pipeline (un-normalize →
    # Resize → CenterCrop → Normalize, losses/clip_loss.py:39-41) never
    # clips, so out-of-range diffusion outputs flow through unchanged —
    # clamping here would diverge from the reference loss on any x0_t
    # outside [-1, 1]
    return (x - CLIP_MEAN) / CLIP_STD


def compose_with_templates(text: str, templates: Optional[Sequence[str]] = None):
    """(losses/clip_loss.py:167-168) — template prompt augmentation."""
    if templates is None:
        templates = clip_templates()["imagenet_templates"]
    return [t.format(text) for t in templates]


@dataclasses.dataclass
class CLIPContext:
    """Holds CLIP params + config + tokenizer; computes host-side text
    features and returns jittable image-side loss closures."""

    params: dict
    cfg: clip_model.CLIPConfig
    bpe: object = None  # SimpleTokenizer | HashTokenizer | None → auto

    # -- host-side text features ---------------------------------------
    def tokenize(self, texts) -> jnp.ndarray:
        if self.bpe is None:
            # build once and keep: auto-construction re-reads + re-parses
            # the 49k-merge BPE vocab on EVERY call otherwise (seconds of
            # redundant host work across a training setup's tokenizations)
            try:
                self.bpe = tok.SimpleTokenizer()
            except FileNotFoundError:
                import warnings

                warnings.warn(
                    "CLIP BPE vocab unavailable — falling back to "
                    "HashTokenizer (test-only semantics)", stacklevel=2
                )
                self.bpe = tok.HashTokenizer()
        return jnp.asarray(
            tok.tokenize(texts, self.bpe, self.cfg.context_length)
        )

    def encode_text(self, texts, norm: bool = True) -> jnp.ndarray:
        feats = clip_model.encode_text(self.params, self.cfg, self.tokenize(texts))
        if norm:
            feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        return feats

    def get_text_features(self, class_str: str, templates=None) -> jnp.ndarray:
        """Per-template normalized features, one row per template prompt
        (losses/clip_loss.py:90-100); the mean over templates is taken by
        the CALLER (compute_text_direction, :114)."""
        return self.encode_text(compose_with_templates(class_str, templates))

    def text_cosine(self, src_txts, trg_txts) -> float:
        """CLIP text cosine similarity of src/trg prompts — drives the
        interval thresholds (diffusion_latent.py:1319-1329). Plain (non
        template) prompts, unnormalized features + CosineSimilarity."""
        fs = clip_model.encode_text(self.params, self.cfg, self.tokenize(src_txts))
        ft = clip_model.encode_text(self.params, self.cfg, self.tokenize(trg_txts))
        fs = fs / (jnp.linalg.norm(fs, axis=1, keepdims=True) + 1e-6)
        ft = ft / (jnp.linalg.norm(ft, axis=1, keepdims=True) + 1e-6)
        return float(jnp.sum(fs * ft, axis=1).mean())

    def compute_text_direction(self, source_class: str, target_class: str):
        """(losses/clip_loss.py:110-117)."""
        sf = self.get_text_features(source_class)
        tf = self.get_text_features(target_class)
        d = (tf - sf).mean(axis=0, keepdims=True)
        return d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    # -- image-side (jittable, differentiable) --------------------------
    def encode_images(self, imgs, norm: bool = True):
        imgs = clip_preprocess(imgs, self.cfg.image_resolution)
        if isinstance(self.cfg, clip_resnet.RN50Config):
            # the CNN tower (texture loss) — a CLIPContext built from
            # clip_resnet params/config works through the same interface
            feats = clip_resnet.encode_image(self.params, self.cfg, imgs)
        else:
            feats = clip_model.encode_image(self.params, self.cfg, imgs)
        if norm:
            feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        return feats


def directional_loss(
    ctx: CLIPContext, src_img, trg_img, target_direction
) -> jnp.ndarray:
    """1 − cos(edit_direction, text_direction), mean over batch
    (losses/clip_loss.py:170-180)."""
    se = ctx.encode_images(src_img)
    te = ctx.encode_images(trg_img)
    edit = te - se
    edit = edit / (jnp.linalg.norm(edit, axis=-1, keepdims=True) + 1e-7)
    cos = jnp.sum(edit * target_direction, axis=-1)
    return (1.0 - cos).mean()


def global_loss(ctx: CLIPContext, img, text_features) -> jnp.ndarray:
    """(1 − logits/100).mean() (losses/clip_loss.py:182-191); text_features
    precomputed normalized."""
    ie = ctx.encode_images(img)
    scale = jnp.exp(ctx.params["logit_scale"])
    logits_per_image = scale * ie @ text_features.T
    return (1.0 - logits_per_image / 100.0).mean()


def angle_loss(
    ctx: CLIPContext, src_img, trg_img, src_text_features, trg_text_features
) -> jnp.ndarray:
    """L1 between image-pair and text-pair cos-angles
    (losses/clip_loss.py:149-165)."""
    cos_text = trg_text_features @ src_text_features.T
    si = ctx.encode_images(src_img)[:, :, None]
    ti = ctx.encode_images(trg_img)[:, None, :]
    cos_img = jnp.clip(ti @ si, -1.0, 1.0)
    return jnp.abs(cos_img - cos_text[None]).mean()


def texture_loss(ctx_cnn: CLIPContext, src_img, trg_img) -> jnp.ndarray:
    """MSE between CNN (RN50) encodings (losses/clip_loss.py:275-279)."""
    sf = ctx_cnn.encode_images(src_img, norm=False)
    tf = ctx_cnn.encode_images(trg_img, norm=False)
    return jnp.mean((sf - tf) ** 2)


def patch_directional_loss(
    ctx: CLIPContext,
    src_img,
    trg_img,
    patch_text_directions,
    rng,
    patch_size: int = 510,
    num_patches: int = 1,
    centers: Optional[Tuple] = None,
) -> jnp.ndarray:
    """Random-patch directional loss (losses/clip_loss.py:246-273). Patch
    centers are drawn with jax.random; patches gathered with dynamic_slice.
    `centers=(cx, cy)` replays explicit patch centers (deterministic eval /
    cross-framework comparison against the reference's np.random draw,
    losses/clip_loss.py:193-199)."""
    b, h, w, c = src_img.shape
    half = patch_size // 2
    if centers is not None:
        cx = jnp.asarray(centers[0])
        cy = jnp.asarray(centers[1])
    else:
        kx, ky = jax.random.split(rng)
        cx = jax.random.randint(kx, (b * num_patches,), half, w - half)
        cy = jax.random.randint(ky, (b * num_patches,), half, h - half)

    def grab(img, bi, x0, y0):
        return jax.lax.dynamic_slice(
            img[bi], (y0 - half, x0 - half, 0), (patch_size, patch_size, c)
        )

    patches_s = jnp.stack(
        [grab(src_img, i // num_patches, cx[i], cy[i]) for i in range(b * num_patches)]
    )
    patches_t = jnp.stack(
        [grab(trg_img, i // num_patches, cx[i], cy[i]) for i in range(b * num_patches)]
    )
    sf = ctx.encode_images(patches_s)
    tf = ctx.encode_images(patches_t)
    edit = tf - sf
    edit = edit / jnp.linalg.norm(edit, axis=-1, keepdims=True)
    cos_d = 1.0 - (edit[:, None, :] * patch_text_directions[None]).sum(-1)
    scores = cos_d * jax.nn.softmax(edit @ patch_text_directions.T, axis=-1)
    return scores.mean()


def train_clip_term(
    ctx: CLIPContext,
    source_class: str,
    target_class: str,
    clip_loss_w: float = 1.0,
) -> Callable:
    """The training-loop CLIP term: clip_w · (−log((2 − L_dir)/2))
    (diffusion_latent.py:343,351). Returns extra(x0, x0_t) for
    pipelines.train.default_loss."""
    target_direction = jax.lax.stop_gradient(
        ctx.compute_text_direction(source_class, target_class)
    )

    def extra(x0, x0_t, x0_t_origin=None):
        ld = directional_loss(ctx, x0, x0_t, target_direction)
        return clip_loss_w * (-jnp.log((2.0 - ld) / 2.0))

    return extra
