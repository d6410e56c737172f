"""Cross-execute the reference's LPIPS calibration + interval selection.

Extends tests/test_reference_product_parity.py (whose helpers this module
reuses) to the two stages that round's centerpiece didn't cover:

  * `Asyrp.compute_lpips_distance` (diffusion_latent.py:1190-1303) — both
    frameworks run the 4-tsv calibration on IDENTICAL diffusion + LPIPS
    weights (the `lpips` refshim exports its deterministic torch mirror in
    the exact layout `losses.lpips_jax.params_from_torch` consumes) and the
    written tsv tables are diffed value-by-value. Pins: the per-timestep
    key convention (destination index j), LPIPS(x, x0) vs LPIPS(x0_t, x0)
    placement across the four files, mean/std aggregation, and the
    n_train_img OFF-BY-ONE (the reference's loop breaks on
    `step == n_train_img` AFTER processing that step, :1276-1278 — so
    n_train_img=1 measures TWO images).

  * `Asyrp.set_t_edit_t_addnoise` (diffusion_latent.py:1307-1412) — the
    reference's own selection runs against a synthetic tsv and our product
    CLI must choose the same (t_edit, t_addnoise) from the same file, with
    the CLIP text cosine computed through the shared towers on each side
    (threshold = lpips_edit_th * cosine, :1334).

Also pinned by execution: standalone `--lpips` on a CUSTOM dataset is
BROKEN upstream — compute_lpips_distance never fills
DATASET_PATHS['custom_train'] (only the precompute path :1004-1005 does),
so the bare mode KeyErrors; our CLI runs it standalone (documented-intent
fix).
"""
import os
import pathlib
import re
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

pytestmark = pytest.mark.slow

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent / "refshims"))
import refboot  # noqa: E402

from test_reference_product_parity import (  # noqa: E402
    BASE_ARGS,
    EXP_ID,
    REF_YML,
    _chdir,
    _toy_merges,
    _write_images,
)


def _strip_user_defined(argv):
    """Remove the --user_defined_t_* pairs so the selection path runs."""
    out, skip = [], False
    for a in argv:
        if skip:
            skip = False
            continue
        if a in ("--user_defined_t_edit", "--user_defined_t_addnoise"):
            skip = True
            continue
        out.append(a)
    return out


@pytest.fixture(scope="module")
def lpws(tmp_path_factory):
    """Workspace: reference tree (refws/, with the utils/ dir the reference
    writes tsvs into relative to cwd), our tree (ours/), TWO distinct train
    images (means/stds are order-independent, so the reference's unsorted
    os.listdir cannot matter), and the shared weight artifacts."""
    refboot.install()
    root = tmp_path_factory.mktemp("crossexec_lpips")
    refws = root / "refws"
    ours = root / "ours"
    for d in (refws, ours):
        d.mkdir()
    (refws / "configs").mkdir()
    (refws / "configs" / "cx.yml").write_text(REF_YML)
    (refws / "utils").mkdir()  # tsv destination, relative to cwd (:1296)
    (refws / "script.sh").write_text("# placeholder\n")
    (ours / "cx.yml").write_text(REF_YML)

    _write_images(str(root / "train_imgs"), seed=3)
    _write_images(str(root / "train_imgs"), seed=5)
    _write_images(str(root / "test_imgs"), seed=4)

    vocab = root / "toy_vocab.txt.gz"
    _toy_merges(str(vocab))
    os.environ["ASYRP_TPU_CLIP_BPE"] = str(vocab)

    from test_reference_product_parity import _ref_config_namespace

    from models.ddpm.diffusion import DDPM

    torch.manual_seed(7)
    torch.save(DDPM(_ref_config_namespace()).state_dict(), root / "model.pth")

    # shared LPIPS weights: the refshim's deterministic torch mirror,
    # exported for the JAX side through the real conversion entry point
    import lpips as lpips_shim

    from asyrp_official_tpu.losses import lpips_jax

    alex_sd, lin_sd = lpips_shim.state_dicts_numpy()
    tree = lpips_jax.params_from_torch(alex_sd, lin_sd)
    np.savez(root / "lpips_shared.npz", params=np.array(tree, dtype=object))

    import clip as clip_shim

    torch.save(clip_shim.hf_state_dict_openai_layout(), root / "clip_openai.pth")
    return root


def _ref_runner(ws, extra, strip_user_defined=False):
    """Parse through the reference's real main.py (under the refws cwd —
    config lookup and exp-dir creation are cwd-relative) and return the
    Asyrp instance; callers invoke the method under test themselves, also
    under `_chdir(ws / "refws")` (tsv paths are cwd-relative too)."""
    ref_main = refboot.load_ref_module("main")
    base = _strip_user_defined(BASE_ARGS) if strip_user_defined else BASE_ARGS
    argv = ["main.py"] + base + [
        "--custom_train_dataset_dir", str(ws / "train_imgs"),
        "--custom_test_dataset_dir", str(ws / "test_imgs"),
        "--model_path", str(ws / "model.pth"),
        "--exp", "./runs/cx",
    ] + extra
    with _chdir(ws / "refws"):
        old_argv = sys.argv
        sys.argv = argv
        try:
            args, config = ref_main.parse_args_and_config()
        finally:
            sys.argv = old_argv
        import diffusion_latent

        return diffusion_latent, diffusion_latent.Asyrp(args, config)


def _our_cli(ws, extra, strip_user_defined=False):
    from asyrp_official_tpu.cli.main import main as cli_main

    argv = BASE_ARGS[:]
    if strip_user_defined:
        argv = _strip_user_defined(argv)
    argv[argv.index("cx.yml")] = str(ws / "ours" / "cx.yml")
    argv += [
        "--custom_train_dataset_dir", str(ws / "train_imgs"),
        "--custom_test_dataset_dir", str(ws / "test_imgs"),
        "--model_path", str(ws / "model.pth"),
        "--clip_ckpt", str(ws / "clip_openai.pth"),
        "--work_dir", str(ws / "ours"),
        "--exp", os.path.join(str(ws / "ours"), "runs", "cx"),
    ] + extra
    rc = cli_main(argv)
    assert rc == 0, f"our CLI failed rc={rc}: {argv}"


def _read_tsv(path):
    out = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                t, v = line.split("\t")
                out[int(t)] = float(v)
    return out


TSV_KINDS = ("x", "x_std", "x0_t", "x0_t_std")


def test_reference_lpips_custom_path_broken_upstream(lpws):
    """Standalone --lpips with a CUSTOM dataset crashes the reference:
    DATASET_PATHS never receives custom_train (:1004 runs only in the
    precompute path, :1217 reads it cold)."""
    dl, runner = _ref_runner(lpws, ["--lpips"])
    dl.DATASET_PATHS.pop("custom_train", None)
    dl.DATASET_PATHS.pop("custom_test", None)
    with _chdir(lpws / "refws"):
        with pytest.raises(KeyError, match="custom_train"):
            runner.compute_lpips_distance()


@pytest.fixture(scope="module")
def lpips_tsvs(lpws):
    """Run compute_lpips_distance on BOTH sides (n_train_img=1 → the
    reference's off-by-one measures both images) and return the parsed
    tsv dicts."""
    dl, runner = _ref_runner(lpws, ["--lpips"])
    # the precompute path's wiring (:1004-1005), which real reference runs
    # execute before --lpips ever works on CUSTOM
    dl.DATASET_PATHS["custom_train"] = str(lpws / "train_imgs")
    dl.DATASET_PATHS["custom_test"] = str(lpws / "test_imgs")
    with _chdir(lpws / "refws"):
        runner.compute_lpips_distance()

    _our_cli(lpws, [
        "--lpips", "--lpips_ckpt", str(lpws / "lpips_shared.npz"),
        "--custom_dataset_name", "cx",
    ])

    ref, ours = {}, {}
    for kind in TSV_KINDS:
        ref[kind] = _read_tsv(
            str(lpws / "refws" / "utils" / f"cx_LPIPS_distance_{kind}.tsv")
        )
        ours[kind] = _read_tsv(
            str(lpws / "ours" / "utils" / f"cx_LPIPS_distance_{kind}.tsv")
        )
    return ref, ours


def test_lpips_calibration_tsv_parity(lpips_tsvs):
    ref, ours = lpips_tsvs
    # mean-curve scale sets the tolerance floor for the stds too (a std can
    # be legitimately ~0 when the two images track each other)
    scale = max(abs(v) for v in ref["x"].values())
    assert scale > 0
    for kind in TSV_KINDS:
        assert sorted(ref[kind]) == sorted(ours[kind]), kind
        for t in ref[kind]:
            err = abs(ref[kind][t] - ours[kind][t])
            # cross-framework noise over 4 chained expansive 256^2 forwards
            # + the AlexNet stack measures ~1e-4 of scale; a key-placement /
            # aggregation bug lands at O(1) of it
            assert err <= 3e-3 * scale, (kind, t, ref[kind][t], ours[kind][t])


def test_lpips_x_and_x0t_curves_differ(lpips_tsvs):
    """Guard the placement pin: if the x / x0_t columns were swapped the
    parity test could still pass with a mirrored bug on both sides — but
    the curves themselves must differ (x drifts toward noise, x0_t is the
    one-step denoised estimate)."""
    ref, _ = lpips_tsvs
    diffs = [abs(ref["x"][t] - ref["x0_t"][t]) for t in ref["x"]]
    assert max(diffs) > 1e-3


def test_set_t_edit_t_addnoise_parity(lpws, caplog):
    """The reference's own threshold selection vs our product CLI on the
    same synthetic tsv: t spaced 50 apart, value t/1000 (x0_t) and t/2000
    (x), so LPIPS_th = 0.33 * cosine lands well inside a step and a ~1e-3
    cross-framework cosine difference cannot flip the chosen t."""
    import logging

    rows_x0t = {t: t / 1000.0 for t in range(0, 1000, 50)}
    rows_x = {t: t / 2000.0 for t in range(0, 1000, 50)}
    for base in (lpws / "refws" / "utils", lpws / "ours" / "utils"):
        base.mkdir(exist_ok=True)
        for name, rows in (("x0_t", rows_x0t), ("x", rows_x)):
            with open(base / f"cx_LPIPS_distance_{name}.tsv", "w") as f:
                for t, v in rows.items():
                    f.write(f"{t}\t{v}\n")

    _, runner = _ref_runner(
        lpws, ["--run_test", "--train_delta_block", "--lpips_edit_th", "0.33"],
        strip_user_defined=True,
    )
    with _chdir(lpws / "refws"):
        ref_cosine = runner.set_t_edit_t_addnoise(
            LPIPS_th=0.33, LPIPS_addnoise_th=0.1
        )
    ref_t_edit, ref_t_addnoise = runner.t_edit, runner.t_addnoise
    # sanity: the synthetic curve actually exercised the scan (not a user
    # override), and the threshold scaling moved t_edit off the unscaled 330
    assert ref_t_edit in rows_x0t and rows_x0t[ref_t_edit] >= 0.33 * ref_cosine

    # our side: the full product CLI run_test with the selection path live
    # (user_defined_t_* stripped) and the same pre-seeded Δ checkpoint
    # recipe the main cross-tests use
    from models.ddpm.diffusion import DeltaBlock

    from test_reference_product_parity import H_CH, TEMB_CH

    torch.manual_seed(11)
    layer0 = DeltaBlock(
        in_channels=H_CH, out_channels=H_CH, temb_channels=TEMB_CH, dropout=0.0
    )
    ckdir = lpws / "ours" / "checkpoint"
    ckdir.mkdir(exist_ok=True)
    torch.save(
        {"0": {k: v.detach().clone() for k, v in layer0.state_dict().items()}},
        ckdir / f"{EXP_ID}_0.pth",
    )
    with caplog.at_level(logging.INFO, logger="asyrp_official_tpu.runner"):
        _our_cli(
            lpws,
            ["--run_test", "--train_delta_block", "--n_test_step", "4",
             "--do_train", "0", "--do_test", "1",
             "--custom_dataset_name", "cx"],
            strip_user_defined=True,
        )
    m = None
    for rec in caplog.records:
        m = re.search(
            r"t_edit=(\d+) t_addnoise=(\d+) cosine=([\d.]+)", rec.getMessage()
        ) or m
    assert m, "runner did not log the interval selection"
    our_t_edit, our_t_addnoise, our_cosine = (
        int(m.group(1)), int(m.group(2)), float(m.group(3)),
    )
    assert abs(our_cosine - ref_cosine) < 2e-3, (our_cosine, ref_cosine)
    assert our_t_edit == ref_t_edit
    assert our_t_addnoise == ref_t_addnoise
