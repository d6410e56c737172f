"""End-to-end: CLI → runner → train → checkpoint → test → grids, on a tiny
model + tiny custom dataset. This is the PR1-style CPU-runnable slice."""
import os

import pytest

from asyrp_official_tpu.cli.main import build_parser, main as cli_main
from asyrp_official_tpu.utils.tinyws import tiny_base_argv, write_tiny_workspace


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    ws = tmp_path_factory.mktemp("ws")
    write_tiny_workspace(str(ws))
    return ws


def _common(ws, extra):
    return tiny_base_argv(
        str(ws / "tiny.yml"), str(ws / "imgs"), str(ws),
        str(ws / "runs" / "exp"), extra=extra,
    )


def test_parser_accepts_reference_vestigial_flags():
    p = build_parser()
    args = p.parse_args(
        ["--config", "celeba.yml", "--style_transfer", "--warigari", "--clip_finetune"]
    )
    assert args.style_transfer


def test_cli_train_then_test(workspace):
    ws = workspace
    rc = cli_main(_common(ws, ["--run_train", "--train_delta_block", "--do_test", "0"]))
    assert rc == 0, "training CLI failed"
    ckpts = os.listdir(ws / "checkpoint")
    assert any(c.endswith("_0.pth") for c in ckpts), ckpts
    # precompute cache created
    assert any("pairs" in f for f in os.listdir(ws / "precomputed"))

    rc = cli_main(
        _common(ws, ["--run_test", "--train_delta_block", "--do_test", "1",
                     "--save_x0", "--save_x_origin"])
    )
    assert rc == 0, "test CLI failed"
    test_dir = [
        os.path.join(r, f)
        for r, _, fs in os.walk(ws / "runs")
        for f in fs
        if f.endswith(".png")
    ]
    assert test_dir, "no grid images written"


def test_cli_train_delta_h(workspace):
    ws = workspace
    rc = cli_main(
        _common(ws, ["--run_train", "--train_delta_h", "--do_test", "0",
                     "--exp", str(ws / "runs" / "dh")])
    )
    assert rc == 0
    rc = cli_main(
        _common(ws, ["--run_test", "--train_delta_h", "--do_test", "1",
                     "--exp", str(ws / "runs" / "dh")])
    )
    assert rc == 0


def test_cli_delta_interpolation(workspace):
    ws = workspace
    rc = cli_main(
        _common(ws, ["--run_test", "--train_delta_block",
                     "--delta_interpolation", "--num_delta", "3"])
    )
    assert rc == 0


def test_cli_random_noise(workspace):
    ws = workspace
    rc = cli_main(
        _common(ws, ["--run_test", "--train_delta_block", "--load_random_noise"])
    )
    assert rc == 0


def test_cli_missing_checkpoint_fails_cleanly(workspace):
    ws = workspace
    rc = cli_main(
        _common(ws, ["--run_test", "--train_delta_block",
                     "--exp", str(ws / "runs" / "nonexistent")])
    )
    assert rc == 1  # clean failure, not a crash


def test_reference_checkpoint_loads_in_runner(workspace, reference_path):
    """run_test with a RELEASED reference Δh checkpoint (manual name) on the
    full-size spec would need the full model; here we verify the checkpoint
    resolution path picks up the manual name."""
    ws = workspace
    rc = cli_main(
        _common(ws, ["--run_test", "--train_delta_block",
                     "--manual_checkpoint_name", "does_not_exist.pth"])
    )
    assert rc == 1
