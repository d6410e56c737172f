"""Runner modes: multi-attribute mixing, mean-of-delta-h harvesting."""
import os

import numpy as np
import pytest
import yaml
from PIL import Image

import jax

from asyrp_official_tpu.cli.main import main as cli_main

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


@pytest.fixture(scope="module")
def ws(tmp_path_factory):
    ws = tmp_path_factory.mktemp("wsm")
    (ws / "imgs").mkdir()
    rng = np.random.RandomState(0)
    for i in range(4):
        Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8)).save(
            ws / "imgs" / f"{i}.png"
        )
    with open(ws / "tiny.yml", "w") as f:
        yaml.safe_dump(TINY_CONFIG, f)
    return ws


def _common(ws, exp, extra):
    return [
        "--config", str(ws / "tiny.yml"), "--exp", str(ws / "runs" / exp),
        "--custom_train_dataset_dir", str(ws / "imgs"),
        "--custom_test_dataset_dir", str(ws / "imgs"),
        "--work_dir", str(ws),
        "--n_inv_step", "4", "--n_train_step", "4", "--n_test_step", "4",
        "--n_train_img", "2", "--n_test_img", "2", "--bs_train", "1",
        "--user_defined_t_edit", "500", "--user_defined_t_addnoise", "100",
        "--lr_training", "0.01", "--n_iter", "1", "--clip_loss_w", "0", "--ni", "--allow_random_weights",
    ] + extra


def _make_delta_ckpt(ws, name):
    """Synthesize a trained-block checkpoint with the given file name."""
    from asyrp_official_tpu.compat.delta_ckpt import save_delta_checkpoint
    from asyrp_official_tpu.models.delta import delta_block_init

    block = delta_block_init(jax.random.PRNGKey(hash(name) % 1000), 64, 128)
    save_delta_checkpoint(
        str(ws / "checkpoint" / name),
        blocks=[jax.tree.map(np.asarray, block)], flavor="ddpm",
    )


def test_multiple_attr(ws):
    # checkpoints resolved from load_from_checkpoint='attribute' template:
    # 'attribute' is replaced per attr (diffusion_latent.py:641-642)
    for attr in ("smiling", "sad"):
        _make_delta_ckpt(ws, f"{attr}_LC_CUSTOM_t999_ninv4_ngen4_0.pth")
    rc = cli_main(
        _common(ws, "multi", [
            "--run_test", "--train_delta_block",
            "--edit_attr", "attribute",
            "--load_from_checkpoint", "attribute",
            "--multiple_attr", "smiling sad",
            "--multiple_hs_coeff", "1.0 0.5",
            "--get_h_num", "2",
        ])
    )
    assert rc == 0
    pngs = [f for r, _, fs in os.walk(ws / "runs" / "multi_LC_CUSTOM_t999_ninv4_ngen4")
            for f in fs if f.endswith(".png")]
    assert pngs


def test_mean_of_delta_hs(ws):
    _make_delta_ckpt(ws, "mean_LC_CUSTOM_t999_ninv4_ngen4_0.pth")
    args = _common(ws, "mean", [
        "--run_test", "--train_delta_block", "--edit_attr", "smiling",
        "--load_from_checkpoint", "mean",
        "--num_mean_of_delta_hs", "2", "--do_test", "0", "--do_train", "1",
    ])
    rc = cli_main(args)
    assert rc == 0
    latent = os.listdir(ws / "checkpoint_latent")
    assert any("mean" in f for f in latent), latent
    # second invocation consumes the saved global direction
    rc = cli_main(args)
    assert rc == 0
