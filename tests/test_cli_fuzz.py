"""Deterministic cross-flag fuzz of the run_test product surface.

The 10th review pass found cross-mode bugs by *manual* enumeration
(do_train gate, target-id batching, harvest accumulation); this file
mechanizes that lens: hypothesis (derandomized — the example set is fixed
and reproducible) drives the real CLI over combinations of test-time
flags that the hand-written tests only cover one-at-a-time, asserting the
run succeeds and writes well-formed grids. Train once; fuzz decode-time
behavior against the shared checkpoint, mirroring how a reference user
sweeps flags against one trained Δ (diffusion_latent.py:547-874).
"""
import os
import shutil

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute sweep (TESTING.md fast tier)
from PIL import Image
from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

from asyrp_official_tpu.cli.main import main as cli_main
from asyrp_official_tpu.utils.tinyws import tiny_base_argv, write_tiny_workspace


@pytest.fixture(scope="module")
def ws(tmp_path_factory):
    ws = tmp_path_factory.mktemp("wsfuzz")
    write_tiny_workspace(str(ws))
    rc = cli_main(_args(ws, ["--run_train", "--train_delta_block",
                             "--do_test", "0"]))
    assert rc == 0
    return ws


def _args(ws, extra):
    return tiny_base_argv(
        str(ws / "tiny.yml"), str(ws / "imgs"), str(ws / "w"),
        str(ws / "w" / "runs" / "e"), extra=extra,
    )


# each dimension is a list of argv fragments; later --flag repeats
# override the base argv (argparse last-wins)
# --pass_editing carries --save_x_origin: with no origin row it is the
# reference's own crash case (torch.cat over an empty x_list, :539) —
# covered separately in test_pass_editing_without_rows_fails_loudly
MODE = [[], ["--delta_interpolation", "--num_delta", "2"],
        ["--pass_editing", "--save_x_origin"]]
BATCH = [["--bs_train", "1"], []]  # base is 2
STEPS = [[], ["--n_test_step", "3"], ["--n_test_step", "1"]]  # 1 = single-step decode
NOISE = [[], ["--eta", "0.5"],
         ["--eta", "1.0", "--user_defined_t_addnoise", "700"],  # boost covers 3/4 steps
         ["--sample_type", "ddpm"]]
SCALE = [[], ["--hs_coeff_delta_h", "0.5"]]
SAVES = [[], ["--save_x_origin", "--save_x0"],
         ["--save_x_origin", "--save_process_origin", "--save_process_delta_h"]]
MESH = [[], ["--dp", "2"], ["--dp", "2", "--sp", "2"]]


@settings(max_examples=12, derandomize=True, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(mode=st.sampled_from(MODE), batch=st.sampled_from(BATCH),
       steps=st.sampled_from(STEPS), noise=st.sampled_from(NOISE),
       scale=st.sampled_from(SCALE), saves=st.sampled_from(SAVES),
       mesh=st.sampled_from(MESH))
def test_run_test_flag_combinations(ws, mode, batch, steps, noise, scale,
                                    saves, mesh):
    # bs_train must divide over the mesh — the reference's own assert
    # (main.py:327 `bs_train % n_gpus == 0`); pinned separately below
    assume(not (batch and mesh))
    # the exp dir carries the reference's LC naming suffix
    # ({exp}_LC_{category}_t{t0}_...) — wipe/collect grids across the
    # whole work tree, like test_runner_dp does
    root = ws / "w" / "runs"
    for r, ds, _ in os.walk(root):
        for d in list(ds):
            if d == "test_images":
                shutil.rmtree(os.path.join(r, d), ignore_errors=True)
    extra = (["--run_test", "--train_delta_block"]
             + mode + batch + steps + noise + scale + saves + mesh)
    rc = cli_main(_args(ws, extra))
    assert rc == 0, f"run_test failed under {extra}"

    grids = sorted(
        os.path.join(r, f)
        for r, _, fs in os.walk(root) for f in fs if f.endswith(".png")
    )
    assert grids, f"no grids written under {extra}"
    for p in grids:
        a = np.asarray(Image.open(p))
        assert a.dtype == np.uint8 and a.ndim == 3, (p, a.dtype, a.shape)
        # make_grid geometry: k 32-px panels + 1-px padding = 33k + 1
        assert a.shape[0] % 33 == 1 and a.shape[1] % 33 == 1, (p, a.shape)
        # a constant/black panel means a decode collapsed under the combo
        assert a.std() > 1.0, (p, extra)


# --- training-surface fuzz -------------------------------------------
# train-time dimensions the hand-written tests cover one-at-a-time
# (reference training block diffusion_latent.py:237-441)
T_MODE = [["--train_delta_block"],
          ["--train_delta_block", "--get_h_num", "2"],
          ["--train_delta_h"],
          ["--train_delta_h", "--ignore_timesteps"]]
T_SAVES = [[], ["--save_checkpoint_during_iter", "--save_checkpoint_step", "1"],
           ["--save_train_image", "--save_train_image_step", "1"]]
T_ITER = [[], ["--n_iter", "2", "--save_checkpoint_only_last_iter"]]
T_SCHED = [[], ["--scheduler_step_size", "1", "--sch_gamma", "0.5"]]
T_MESH = [[], ["--dp", "2"], ["--dp", "2", "--sp", "2"]]


@settings(max_examples=8, derandomize=True, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(mode=st.sampled_from(T_MODE), saves=st.sampled_from(T_SAVES),
       iters=st.sampled_from(T_ITER), sched=st.sampled_from(T_SCHED),
       mesh=st.sampled_from(T_MESH))
def test_run_train_flag_combinations(ws, mode, saves, iters, sched, mesh):
    from asyrp_official_tpu.compat.delta_ckpt import load_delta_checkpoint

    extra = (["--run_train", "--do_test", "0"]
             + mode + saves + iters + sched + mesh)
    # fresh work dir per combination: the retrain gate would otherwise
    # skip training when a previous example's checkpoint name collides
    work = "t_" + "_".join(extra).replace("--", "").replace("/", "")
    rc = cli_main(tiny_base_argv(
        str(ws / "tiny.yml"), str(ws / "imgs"), str(ws / work),
        str(ws / work / "runs" / "e"), extra=extra,
    ))
    assert rc == 0, f"run_train failed under {extra}"

    ckdir = ws / work / "checkpoint"
    n_final = int(iters[1]) if iters else 1
    pths = sorted(f for f in os.listdir(ckdir) if f.endswith(".pth"))
    # main per-iteration checkpoints are {exp_id}_{it}.pth (the LC-suffixed
    # exp name); mid-iteration saves carry an extra counter ({it}_{k}.pth)
    # and legitimately survive --save_checkpoint_only_last_iter (the
    # reference removes only {exp_id}_{it-1}.pth, diffusion_latent.py:410)
    main = f"e_LC_CUSTOM_t999_ninv4_ngen4_{n_final - 1}.pth"
    assert main in pths, (pths, extra)
    if iters:  # --save_checkpoint_only_last_iter removed iteration 0's MAIN
        assert "e_LC_CUSTOM_t999_ninv4_ngen4_0.pth" not in pths, (pths, extra)
    loaded = load_delta_checkpoint(str(ckdir / main))
    key = "blocks" if "--train_delta_block" in extra else "delta_rows"
    assert key in loaded, (sorted(loaded), extra)
    if "--get_h_num" in extra:  # untrained extras saved alongside layer_0
        assert len(loaded["blocks"]) == 2
    if "--save_train_image" in extra:
        imgs = ws / work / "runs"
        train_pngs = [f for r, _, fs in os.walk(imgs) for f in fs
                      if f.startswith("train_") and f.endswith(".png")]
        assert train_pngs, f"--save_train_image wrote nothing under {extra}"


# --- DiffStyle-surface fuzz ------------------------------------------
# the style path's tunables (runner.run_style_transfer: hs_coeff,
# n_gen_step, content_replace_step, use_mask, dt_lambda, mesh, bf16)
S_COEFF = [[], ["--hs_coeff", "0.5"]]
S_GEN = [[], ["--n_gen_step", "3"]]
S_REPL = [[], ["--content_replace_step", "1"]]
S_MASK = [[], ["--use_mask"]]
S_DT = [[], ["--dt_lambda", "0.99", "--dt_end", "2"]]
S_MESH = [[], ["--dp", "2"], ["--bf16"]]


@pytest.fixture(scope="module")
def style_dirs(ws):
    rng = np.random.RandomState(7)
    for sub in ("contents", "styles"):
        (ws / sub).mkdir(exist_ok=True)
        for i in range(2):
            Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8)).save(
                ws / sub / f"{i}.png"
            )
    return ws / "contents", ws / "styles"


@settings(max_examples=8, derandomize=True, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(coeff=st.sampled_from(S_COEFF), gen=st.sampled_from(S_GEN),
       repl=st.sampled_from(S_REPL), mask=st.sampled_from(S_MASK),
       dt=st.sampled_from(S_DT), mesh=st.sampled_from(S_MESH))
def test_diff_style_flag_combinations(ws, style_dirs, coeff, gen, repl,
                                      mask, dt, mesh):
    contents, styles = style_dirs
    extra = coeff + gen + repl + mask + dt + mesh
    save = ws / ("s_" + "_".join(extra).replace("--", "") if extra else "s_base")
    rc = cli_main(_args(ws, ["--diff_style",
                             "--content_dir", str(contents),
                             "--style_dir", str(styles),
                             "--save_dir", str(save)] + extra))
    assert rc == 0, f"diff_style failed under {extra}"
    outs = sorted(os.listdir(save))
    # one stylized image per content x style pair
    assert outs == sorted(f"content{c}_style{s}.png" for s in range(2)
                          for c in range(2)), (outs, extra)
    for f in outs:
        a = np.asarray(Image.open(save / f))
        assert a.dtype == np.uint8 and a.shape[0] >= 32, (f, a.shape)
        assert a.std() > 1.0, (f, extra)


def test_bs_not_divisible_by_dp_fails_loudly(ws, caplog):
    """bs_train % dp != 0 is the reference's own hard assert
    (main.py:327 `bs_train % len(gpus) == 0`): loud error, not silent
    padding surprises."""
    rc = cli_main(_args(ws, ["--run_test", "--train_delta_block",
                             "--bs_train", "1", "--dp", "2"]))
    assert rc == 1
    errs = [r for r in caplog.records if r.exc_info]
    assert errs, "cli_main returned 1 but logged no exception"
    err = errs[-1].exc_info[1]
    assert isinstance(err, ValueError)
    assert "bs_train" in str(err) and "--dp" in str(err)


def test_bad_config_fails_loudly(ws, caplog):
    """A mistyped --config follows the same convention as every other
    setup failure: logged exception, rc 1 (not a raw traceback)."""
    rc = cli_main(["--config", str(ws / "nope.yml"),
                   "--exp", str(ws / "badcfg"), "--run_test", "--ni"])
    assert rc == 1
    errs = [r for r in caplog.records if r.exc_info]
    assert errs, "cli_main returned 1 but logged no exception"
    assert "nope.yml" in str(errs[-1].exc_info[1])


def test_pass_editing_without_rows_fails_loudly(ws, caplog):
    """--pass_editing with no origin/x0 rows is the reference's own crash
    case (torch.cat over an empty x_list, diffusion_latent.py:539); ours
    must fail with an explanation, not a bare numpy error."""
    rc = cli_main(_args(ws, ["--run_test", "--train_delta_block",
                             "--pass_editing"]))
    assert rc == 1
    errs = [r for r in caplog.records if r.exc_info]
    assert errs, "cli_main returned 1 but logged no exception"
    err = errs[-1].exc_info[1]
    assert isinstance(err, ValueError)
    assert "pass_editing" in str(err) and "save_x_origin" in str(err)
