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


REPO_SCRIPTS = sorted(
    os.path.join(os.path.dirname(__file__), "..", "scripts", f)
    for f in os.listdir(
        os.path.join(os.path.dirname(__file__), "..", "scripts")
    )
    if f.endswith(".sh")
)


@pytest.mark.parametrize("script", REPO_SCRIPTS,
                         ids=[os.path.basename(s) for s in REPO_SCRIPTS])
def test_repo_script_flags_parse(script):
    """Our own shipped scripts/*.sh (TPU ports of the reference's four
    workflows) must stay parseable — same doc-rot discipline as the
    reference scripts above and README (test_doc_snippets.py)."""
    argv = _extract_args(script)
    args = build_parser().parse_args(argv)
    assert args.config
    name = os.path.basename(script)
    if name == "script_get_lpips.sh":
        assert args.lpips and args.lpips_ckpt
    else:
        assert args.run_train or args.run_test
        assert args.model_path  # real-weights path, not --allow_random_weights
