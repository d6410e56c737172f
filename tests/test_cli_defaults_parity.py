"""Every dispatched flag's DEFAULT must equal the reference parser's.

Arity compatibility was already pinned (test_cli_script_compat); round 4
found 28 dispatched flags whose defaults had drifted (lr_training 0.5 vs
2e-1, loss weights swapped, scheduler_step_size, sweep ranges, ...) — a
reference command line silently trained with different hyperparameters.
This test rebuilds the reference's ACTUAL parser (main.py:13-227, captured
from parse_args_and_config) and compares defaults programmatically so drift
cannot reappear.
"""
import argparse
import pathlib
import sys

import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent / "refshims"))

# intentional, documented divergences
EXCEPTIONS = {
    # the reference parses --align_face (default 1) but NEVER dispatches it;
    # we DO dispatch it (utils/align), so default 0 preserves the
    # reference's effective never-aligns behavior (cli/main.py)
    "align_face",
}


def _reference_parser():
    import refboot

    ref_main = refboot.load_ref_module("main")

    captured = {}

    class _Stop(Exception):
        pass

    def capture(self, *a, **k):
        captured["p"] = self
        raise _Stop()

    orig = argparse.ArgumentParser.parse_args
    argparse.ArgumentParser.parse_args = capture
    try:
        ref_main.parse_args_and_config()
    except _Stop:
        pass
    finally:
        argparse.ArgumentParser.parse_args = orig
    return captured["p"]


def test_shared_flag_defaults_match_reference():
    from asyrp_official_tpu.cli.main import VESTIGIAL_FLAGS, build_parser

    refp = _reference_parser()
    ours = build_parser()
    rdef = {a.dest: a.default for a in refp._actions if a.dest != "help"}
    odef = {a.dest: a.default for a in ours._actions if a.dest != "help"}

    shared = set(rdef) & set(odef)
    assert len(shared) > 140, len(shared)  # the surfaces really overlap

    vestigial = set(VESTIGIAL_FLAGS)
    diffs = []
    for d in sorted(shared - EXCEPTIONS):
        r, o = rdef[d], odef[d]
        if r == o:
            continue
        if d in vestigial and bool(r) == bool(o):
            # undispatched flags are only ever truthiness-checked; the
            # reference's store_true False and our nargs='?' None agree
            continue
        diffs.append((d, r, o))
    assert not diffs, diffs

    # nothing the reference parses is missing from our parser
    assert not set(rdef) - set(odef)
