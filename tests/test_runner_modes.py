"""Runner modes: multi-attribute mixing, mean-of-delta-h harvesting."""
import os

import numpy as np
import pytest

import jax

from asyrp_official_tpu.cli.main import main as cli_main
from asyrp_official_tpu.utils.tinyws import tiny_base_argv, write_tiny_workspace


@pytest.fixture(scope="module")
def ws(tmp_path_factory):
    ws = tmp_path_factory.mktemp("wsm")
    write_tiny_workspace(str(ws))
    return ws


def _common(ws, exp, extra):
    # edit_attr=None: each mode test supplies its own --edit_attr/--src_txts
    return tiny_base_argv(
        str(ws / "tiny.yml"), str(ws / "imgs"), str(ws),
        str(ws / "runs" / exp), bs_train=1, edit_attr=None, extra=extra,
    )


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


def test_resume_from_pth_with_get_h_num_2(ws):
    """.pth-only resume with get_h_num=2 must keep the trained/extra block
    split: _save_delta writes [trained]+extras, and restoring ALL of them
    into the train state used to desync opt_state/hs_coeff (crash on the
    next trained iter) and re-append extras on save."""
    from asyrp_official_tpu.compat.delta_ckpt import load_delta_checkpoint

    base = ["--run_train", "--train_delta_block", "--edit_attr", "smiling",
            "--get_h_num", "2", "--do_test", "0"]
    rc = cli_main(_common(ws, "resume2", base + ["--n_iter", "1"]))
    assert rc == 0
    ck0 = ws / "checkpoint" / "resume2_LC_CUSTOM_t999_ninv4_ngen4_0.pth"
    assert ck0.exists()
    import shutil

    shutil.rmtree(str(ck0) + ".orbax", ignore_errors=True)  # force .pth path
    rc = cli_main(_common(ws, "resume2", base + ["--n_iter", "2"]))
    assert rc == 0
    for it in (0, 1):
        loaded = load_delta_checkpoint(
            ws / "checkpoint" / f"resume2_LC_CUSTOM_t999_ninv4_ngen4_{it}.pth"
        )
        assert len(loaded["blocks"]) == 2, (it, len(loaded["blocks"]))
