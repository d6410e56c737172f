"""Runner interval selection: fresh --lpips tsv output feeds set_interval."""
import os
import types

import numpy as np

from asyrp_official_tpu.runner import AsyrpRunner

TINY_CONFIG = {
    "data": {"dataset": "CelebA_HQ", "category": "CUSTOM", "image_size": 32,
             "channels": 3},
    "model": {"family": "ddpmpp", "in_channels": 3, "out_ch": 3, "ch": 32,
              "ch_mult": [1, 2], "num_res_blocks": 1, "attn_resolutions": [16],
              "dropout": 0.0, "var_type": "fixedsmall", "resamp_with_conv": True,
              "learn_sigma": False},
    "diffusion": {"beta_schedule": "linear", "beta_start": 0.0001,
                  "beta_end": 0.02, "num_diffusion_timesteps": 1000},
}


def _args(**over):
    base = dict(
        seed=0, edit_attr="smiling", user_defined_t_edit=0,
        user_defined_t_addnoise=0, lpips_edit_th=0.33, lpips_addnoise_th=0.1,
        custom_dataset_name="mycustom", bf16=False,
    )
    base.update(over)
    return types.SimpleNamespace(**base)


def test_fresh_tsv_takes_precedence(tmp_path):
    # write a synthetic calibration run: threshold crossed at t=123
    utils_dir = tmp_path / "utils"
    utils_dir.mkdir()
    with open(utils_dir / "mycustom_LPIPS_distance_x0_t.tsv", "w") as f:
        for t in range(1, 400):
            f.write(f"{t}\t{0.0 if t < 123 else 0.5}\n")
    r = AsyrpRunner(_args(), TINY_CONFIG, work_dir=str(tmp_path))
    cosine = r.set_interval()
    assert cosine == 1.0  # no CLIP ctx
    assert r.t_edit == 123
    assert r.t_addnoise == 123  # same curve, lower threshold also at 123


def test_bundled_fallback_without_tsv(tmp_path):
    r = AsyrpRunner(_args(custom_dataset_name=None), TINY_CONFIG,
                    work_dir=str(tmp_path))
    r.set_interval()
    # celeba bundled curve at th 0.33*1.0 → known preset neighborhood
    assert 400 < r.t_edit < 700


def test_user_override_short_circuits(tmp_path):
    r = AsyrpRunner(
        _args(user_defined_t_edit=444, user_defined_t_addnoise=77),
        TINY_CONFIG, work_dir=str(tmp_path),
    )
    r.set_interval()
    assert (r.t_edit, r.t_addnoise) == (444, 77)
