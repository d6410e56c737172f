"""CLI: DiffStyle dispatch, process dumps, target_image_id, fused serve call."""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute sweep (TESTING.md fast tier)
import yaml
from PIL import Image

import jax
import jax.numpy as jnp

from asyrp_official_tpu.cli.main import main as cli_main
from asyrp_official_tpu.core.schedule import make_schedule, uniform_seq
from asyrp_official_tpu.models import ddpmpp
from asyrp_official_tpu.models.delta import EditState, delta_block_init
from asyrp_official_tpu.models.registry import ModelSpec
from asyrp_official_tpu.pipelines import engine

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
    ws = tmp_path_factory.mktemp("ws2")
    for sub in ("imgs", "contents", "styles"):
        (ws / sub).mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        for sub in ("imgs", "contents", "styles"):
            Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8)).save(
                ws / sub / f"{i}.png"
            )
    with open(ws / "tiny.yml", "w") as f:
        yaml.safe_dump(TINY_CONFIG, f)
    return ws


def _common(ws, extra):
    return [
        "--config", str(ws / "tiny.yml"), "--exp", str(ws / "runs" / "e"),
        "--edit_attr", "smiling",
        "--custom_train_dataset_dir", str(ws / "imgs"),
        "--custom_test_dataset_dir", str(ws / "imgs"),
        "--work_dir", str(ws),
        "--n_inv_step", "4", "--n_train_step", "4", "--n_test_step", "4",
        "--n_train_img", "2", "--n_test_img", "2", "--bs_train", "1",
        "--user_defined_t_edit", "500", "--user_defined_t_addnoise", "100",
        "--lr_training", "0.01", "--n_iter", "1", "--clip_loss_w", "0", "--ni", "--allow_random_weights",
    ] + extra


def test_cli_diff_style(ws):
    rc = cli_main(
        _common(ws, [
            "--diff_style",
            "--content_dir", str(ws / "contents"),
            "--style_dir", str(ws / "styles"),
            "--save_dir", str(ws / "styled"),
        ])
    )
    assert rc == 0
    outs = os.listdir(ws / "styled")
    assert "content0_style0.png" in outs
    assert len(outs) == 9  # 3x3 grid of pairs


def test_cli_train_with_process_dumps_and_target_id(ws):
    rc = cli_main(
        _common(ws, ["--run_train", "--train_delta_block", "--get_h_num", "1",
                     "--do_test", "1",
                     "--save_x_origin", "--save_process_origin",
                     "--save_process_delta_h", "--target_image_id", "0"])
    )
    assert rc == 0
    # per-step process frames exist...
    frames = [
        os.path.join(r, f) for r, _, fs in os.walk(ws / "runs") for f in fs
        if f.startswith(("origin_", "delta_h_"))
    ]
    assert frames, "no process dumps written"
    # ...for BOTH test offsets: the reference's POST-train do_test sweep
    # iterates every test pair unfiltered (diffusion_latent.py:413-441 has
    # no target_image_id check; only run_test's loop does, :781-784)
    parents = {os.path.basename(os.path.dirname(p)) for p in frames}
    assert {"test_0_0", "test_1_0"} <= parents, parents

    # run_test, by contrast, MUST honor --target_image_id: with id 0 and
    # n_test_img 2, only offset-0 grids appear in its output folder
    rc = cli_main(
        _common(ws, ["--run_test", "--train_delta_block", "--save_x_origin",
                     "--target_image_id", "0"])
    )
    assert rc == 0
    run_test_dirs = [
        os.path.join(r, d) for r, ds, _ in os.walk(ws / "runs")
        for d in ds if d == "4"  # run_test writes to test_images/{n_test_step}
    ]
    assert run_test_dirs
    grids = [
        f for d in run_test_dirs for f in os.listdir(d) if f.endswith(".png")
    ]
    assert grids and all(f.split("_")[1] == "0" for f in grids), grids


def test_fused_invert_edit_matches_two_calls():
    cfg = ddpmpp.DDPMppConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                              attn_resolutions=(16,), resolution=32)
    spec = ModelSpec("ddpmpp", cfg, False, "ddpm")
    sched = make_schedule()
    seq = uniform_seq(4, 999)
    params = spec.init(jax.random.PRNGKey(0))
    block = delta_block_init(jax.random.PRNGKey(1), cfg.bottleneck_ch, cfg.temb_ch)
    edit = EditState(blocks=(block,), hs_coeff=jnp.array([1.0, 1.0]))
    x0 = jnp.asarray(np.random.RandomState(2).randn(1, 32, 32, 3).astype(np.float32))
    rng = jax.random.PRNGKey(0)

    fused = engine.make_invert_edit(spec, sched, seq, seq, t_edit=500)
    out_fused = fused(params, edit, x0, rng)

    x_lat, _ = engine.make_invert(spec, sched, seq)(params, x0)
    out_two, _ = engine.make_edit_generate(spec, sched, seq, t_edit=500)(
        params, edit, x_lat, rng
    )
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_two), rtol=1e-5, atol=1e-6
    )
