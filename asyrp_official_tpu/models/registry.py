"""Dataset → model-family routing (the reference's `load_pretrained_model`,
diffusion_latent.py:76-126, plus the hardcoded config dicts in
models/improved_ddpm/script_util.py:5-42 and
models/guided_diffusion/script_util.py:10-46).

Each entry resolves to (family, config, learn_sigma). Families:
  'ddpmpp' — SDEdit/DiffusionCLIP DDPM++ (CelebA_HQ / LSUN / Dialog / CUSTOM)
  'openai' — iDDPM (FFHQ/AFHQ/IMAGENET) and ADM (MetFACE/CelebA_HQ_P2);
             one implementation serves both (models/openai_unet.py).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax

from asyrp_official_tpu.models import ddpmpp, openai_unet

__all__ = ["ModelSpec", "resolve", "PRETRAINED_URLS"]

# SDEdit auto-download routing (diffusion_latent.py:79-85) — recorded for the
# CLI's checkpoint resolution; downloading is up to the caller (zero-egress
# environments must provide --model_path).
PRETRAINED_URLS = {
    "CelebA_HQ": "https://image-editing-test-12345.s3-us-west-2.amazonaws.com/checkpoints/celeba_hq.ckpt",
    "CUSTOM": "https://image-editing-test-12345.s3-us-west-2.amazonaws.com/checkpoints/celeba_hq.ckpt",
    "CelebA_HQ_Dialog": "https://image-editing-test-12345.s3-us-west-2.amazonaws.com/checkpoints/celeba_hq.ckpt",
    "LSUN_bedroom": "https://image-editing-test-12345.s3-us-west-2.amazonaws.com/checkpoints/bedroom.ckpt",
    "LSUN_church_outdoor": "https://image-editing-test-12345.s3-us-west-2.amazonaws.com/checkpoints/church_outdoor.ckpt",
}


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    family: str          # 'ddpmpp' | 'openai'
    config: Any          # DDPMppConfig | OpenAIUNetConfig
    learn_sigma: bool
    delta_flavor: str    # DeltaBlock flavor for this family

    # -- uniform functional interface ------------------------------------
    def init(self, key):
        if self.family == "ddpmpp":
            return ddpmpp.init(key, self.config)
        return openai_unet.init(key, self.config)

    def apply(self, params, x, t, edit=None, **kw):
        if self.family == "ddpmpp":
            return ddpmpp.apply(params, self.config, x, t, edit=edit, **kw)
        return openai_unet.apply(params, self.config, x, t, edit=edit, **kw)

    def params_from_torch(self, sd):
        if self.family == "ddpmpp":
            from asyrp_official_tpu.compat.torch_convert import convert_ddpmpp

            return convert_ddpmpp(sd, self.config)
        return openai_unet.params_from_torch(sd, self.config)

    @property
    def bottleneck_ch(self) -> int:
        return self.config.bottleneck_ch

    @property
    def temb_ch(self) -> int:
        return self.config.temb_ch

    @property
    def resolution(self) -> int:
        if self.family == "ddpmpp":
            return self.config.resolution
        return self.config.image_size

    @property
    def bottleneck_hw(self) -> int:
        """Spatial size of the h-space (mid-block) map: the resolution after
        len(mult)-1 downsamples of the ACTUAL architecture. Callers must use
        this, not a user yml's model section — for the OpenAI-family
        datasets spec_from_config deliberately ignores the yml's stale
        SDEdit leftovers in favor of the hardcoded dicts."""
        mult = (
            self.config.ch_mult if self.family == "ddpmpp"
            else self.config.channel_mult
        )
        return self.resolution // (2 ** (len(mult) - 1))

    def get_temb(self, params, t):
        if self.family == "ddpmpp":
            return ddpmpp.get_temb(params, self.config, t)
        return openai_unet.get_temb(params, self.config, t)


def resolve(dataset: str) -> ModelSpec:
    """dataset names follow the reference configs (diffusion_latent.py:101-123)."""
    if dataset in ("CelebA_HQ", "LSUN", "CelebA_HQ_Dialog", "CUSTOM"):
        return ModelSpec(
            family="ddpmpp",
            config=ddpmpp.CELEBA_CONFIG,
            learn_sigma=False,
            delta_flavor="ddpm",
        )
    if dataset in ("FFHQ", "AFHQ"):
        return ModelSpec(
            family="openai",
            config=openai_unet.AFHQ_CONFIG,
            learn_sigma=True,
            delta_flavor="openai",
        )
    if dataset == "IMAGENET":
        return ModelSpec(
            family="openai",
            config=openai_unet.IMAGENET_CONFIG,
            learn_sigma=True,
            delta_flavor="openai",
        )
    if dataset in ("MetFACE", "CelebA_HQ_P2"):
        return ModelSpec(
            family="openai",
            config=openai_unet.METFACE_CONFIG,
            learn_sigma=True,
            delta_flavor="openai",
        )
    raise ValueError(f"Not implemented dataset: {dataset}")
