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


@pytest.fixture(scope="module")
def trained(workspace):
    """Ensure the default-exp DeltaBlock checkpoint exists — created here,
    not by relying on test ordering, so every dependent test runs in
    isolation (`pytest -k`, xdist, --ff)."""
    ws = workspace
    ck = ws / "checkpoint" / "exp_LC_CUSTOM_t999_ninv4_ngen4_0.pth"
    if not ck.exists():
        rc = cli_main(_common(ws, ["--run_train", "--train_delta_block",
                                   "--do_test", "0"]))
        assert rc == 0, "training CLI failed"
    return ck


def _logged_error(caplog):
    """The exception cli_main caught and logged (cli/main.py returns 1 for
    ANY exception, so rc==1 alone cannot distinguish the guarded failure
    from an unrelated crash)."""
    errs = [r for r in caplog.records if r.exc_info]
    assert errs, "cli_main returned 1 but logged no exception"
    return errs[-1].exc_info[1]


def test_parser_accepts_reference_vestigial_flags():
    p = build_parser()
    args = p.parse_args(
        ["--config", "celeba.yml", "--style_transfer", "--warigari", "--clip_finetune"]
    )
    assert args.style_transfer


def test_parser_accepts_reference_arities():
    """Every flag keeps the reference parser's arity: value-typed flags in
    the reference (--ni type=int main.py:149, --save_train_image :175,
    --masked_h :77) must consume a value, and every reference-only flag
    (--get_SNR, --rambda, --save_to_folder, --var, ...) must parse."""
    p = build_parser()
    args = p.parse_args([
        "--config", "celeba.yml",
        "--ni", "1", "--save_train_image", "0", "--masked_h", "mask.png",
        "--get_SNR", "--rambda", "2.0", "--save_to_folder", "/tmp/x",
        "--image_space_noise_optim", "--var", "7", "--maintain", "300",
        "--LPIPS_addnoise_th", "0.2", "--n_test_pretrained_inv_step", "20",
        "--lr_clip_finetune", "1e-5", "--interpolation_step", "2",
    ])
    assert args.ni == 1 and args.save_train_image == 0
    assert args.masked_h == "mask.png" and args.rambda == 2.0
    # bare forms keep working too (our scripts/tests use them)
    args = p.parse_args(["--config", "celeba.yml", "--ni",
                         "--save_train_image", "--masked_h"])
    assert args.ni == 1 and args.save_train_image == 1
    assert args.masked_h is True


def test_list_vestigial_standalone():
    assert cli_main(["--list_vestigial"]) == 0


def test_cli_train_then_test(workspace, trained):
    ws = workspace
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

@pytest.mark.slow
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


def test_cli_delta_interpolation(workspace, trained):
    ws = workspace
    rc = cli_main(
        _common(ws, ["--run_test", "--train_delta_block",
                     "--delta_interpolation", "--num_delta", "3"])
    )
    assert rc == 0


def test_cli_random_noise(workspace, trained):
    ws = workspace
    rc = cli_main(
        _common(ws, ["--run_test", "--train_delta_block", "--load_random_noise"])
    )
    assert rc == 0


def test_cli_missing_checkpoint_fails_cleanly(workspace, caplog):
    ws = workspace
    rc = cli_main(
        _common(ws, ["--run_test", "--train_delta_block",
                     "--exp", str(ws / "runs" / "nonexistent")])
    )
    assert rc == 1  # clean failure, not a crash
    err = _logged_error(caplog)
    assert isinstance(err, FileNotFoundError)
    assert "does not exist" in str(err) and "nonexistent" in str(err)


def test_reference_checkpoint_loads_in_runner(workspace, reference_path, caplog):
    """run_test with a RELEASED reference Δh checkpoint (manual name) on the
    full-size spec would need the full model; here we verify the checkpoint
    resolution path picks up the manual name."""
    ws = workspace
    rc = cli_main(
        _common(ws, ["--run_test", "--train_delta_block",
                     "--manual_checkpoint_name", "does_not_exist.pth"])
    )
    assert rc == 1
    err = _logged_error(caplog)
    assert isinstance(err, FileNotFoundError)
    # the resolver must have selected the MANUAL name, not the exp default
    assert "does_not_exist.pth" in str(err)


def test_pristine_reference_yml_builds_hardcoded_architecture(reference_path):
    """A user's unmodified reference yml must build the model the
    reference actually uses: for the OpenAI-family datasets the reference
    IGNORES the yml model section (stale SDEdit values like out_ch=3,
    num_res_blocks=2) in favor of hardcoded dicts (script_util.py,
    diffusion_latent.py:109-120)."""
    import yaml

    from asyrp_official_tpu.runner import spec_from_config

    for name, res_blocks in (("afhq.yml", 1), ("metface.yml", 1)):
        with open(os.path.join(reference_path, "configs", name)) as f:
            config = yaml.safe_load(f)
        spec = spec_from_config(config)
        assert spec.family == "openai", name
        assert spec.learn_sigma, name
        assert spec.config.num_res_blocks == res_blocks, name
        assert spec.config.out_channels == 6, name
    # our shipped ymls (explicit family key) still build identically
    from asyrp_official_tpu.cli.main import load_config

    ours = spec_from_config(load_config("afhq.yml"))
    theirs = spec_from_config(
        yaml.safe_load(open(os.path.join(reference_path, "configs", "afhq.yml")))
    )
    assert ours.config == theirs.config and ours.family == theirs.family
