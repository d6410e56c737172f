"""The real-weights fidelity runbook (--run_fidelity) and the loud-failure
weight policy: missing weights must ERROR with the exact artifact list, not
silently fall back to random params (VERDICT r1: runner.py:161-168 trap)."""
import json
import os
import shutil

import numpy as np
import pytest
import yaml

import jax

from asyrp_official_tpu.cli.main import build_parser, main as cli_main
from asyrp_official_tpu.runner import AsyrpRunner
from asyrp_official_tpu.utils.tinyws import tiny_base_argv, write_tiny_workspace


@pytest.fixture(scope="module")
def ws(tmp_path_factory):
    ws = tmp_path_factory.mktemp("wsf")
    write_tiny_workspace(str(ws))
    return ws


def _common(ws, exp, extra):
    # allow_random_weights deliberately NOT in the base: the loud-failure
    # tests below assert behavior without it
    return tiny_base_argv(
        str(ws / "tiny.yml"), str(ws / "imgs"), str(ws),
        str(ws / "runs" / exp), allow_random_weights=False, extra=extra,
    )


def test_missing_model_path_is_loud(ws):
    """Without --allow_random_weights a missing --model_path raises,
    naming the artifact (the reference fails on torch.load too,
    diffusion_latent.py:104-114)."""
    args = build_parser().parse_args(
        _common(ws, "loud", ["--run_test", "--train_delta_block"])
    )
    config = yaml.safe_load(open(ws / "tiny.yml"))
    r = AsyrpRunner(args, config, work_dir=str(ws))
    with pytest.raises(FileNotFoundError, match="pretrained diffusion weights"):
        r.load_pretrained()


def test_mistyped_model_path_is_loud(ws):
    args = build_parser().parse_args(
        _common(ws, "loud2", ["--run_test", "--train_delta_block",
                              "--model_path", str(ws / "nope.ckpt")])
    )
    config = yaml.safe_load(open(ws / "tiny.yml"))
    r = AsyrpRunner(args, config, work_dir=str(ws))
    with pytest.raises(FileNotFoundError, match="does not exist"):
        r.load_pretrained()


def test_fidelity_fails_fast_with_full_artifact_list(ws):
    """All missing artifacts are reported AT ONCE (the shopping list)."""
    args = build_parser().parse_args(
        _common(ws, "fid_fail", [
            "--run_fidelity",
            "--fidelity_ref_dir", str(ws / "no_such_ref_dir"),
        ])
    )
    config = yaml.safe_load(open(ws / "tiny.yml"))
    r = AsyrpRunner(args, config, work_dir=str(ws))
    with pytest.raises(FileNotFoundError) as ei:
        r.run_fidelity()
    msg = str(ei.value)
    assert "base diffusion ckpt" in msg
    assert "trained Δ checkpoint" in msg
    assert "LPIPS weights" in msg
    assert "reference outputs" in msg

@pytest.mark.slow
def test_fidelity_runbook_end_to_end(ws):
    """Train a tiny Δ, run the runbook to produce per-image outputs, then
    gate those outputs against themselves (LPIPS == 0 <= 0.01)."""
    exp = "fid"
    rc = cli_main(_common(ws, exp, [
        "--run_train", "--train_delta_block", "--do_test", "0",
        "--allow_random_weights",
    ]))
    assert rc == 0

    rc = cli_main(_common(ws, exp, [
        "--run_fidelity", "--train_delta_block", "--allow_random_weights",
    ]))
    assert rc == 0
    fid_dirs = [
        os.path.join(r, d)
        for r, ds, _ in os.walk(ws / "runs")
        for d in ds if d == "fidelity"
    ]
    assert fid_dirs, "no fidelity output dir"
    out_dir = fid_dirs[0]
    outs = sorted(os.listdir(out_dir))
    assert outs == ["test_0.png", "test_1.png"], outs

    # self-comparison as the 'reference': LPIPS must be 0 (gate passes)
    ref_dir = str(ws / "ref_outputs")
    shutil.copytree(out_dir, ref_dir)
    from asyrp_official_tpu.losses import lpips_jax

    lp = jax.tree.map(np.asarray, lpips_jax.init(jax.random.PRNGKey(0)))
    np.savez(ws / "lpips.npz", params=np.array(lp, dtype=object))

    rc = cli_main(_common(ws, exp, [
        "--run_fidelity", "--train_delta_block", "--allow_random_weights",
        "--fidelity_ref_dir", ref_dir,
        "--lpips_ckpt", str(ws / "lpips.npz"),
    ]))
    assert rc == 0
    report = json.load(open(os.path.join(out_dir, "lpips_report.json")))
    assert report["n"] == 2
    assert report["mean"] <= 0.01
