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
        "--num_mean_of_delta_hs", "1", "--do_test", "0", "--do_train", "1",
    ])
    rc = cli_main(args)
    assert rc == 0
    latent = os.listdir(ws / "checkpoint_latent")
    assert any("mean" in f for f in latent), latent
    # second invocation consumes the saved global direction
    rc = cli_main(args)
    assert rc == 0


def test_mean_of_delta_hs_equal_to_n_img_saves_nothing(ws, caplog):
    """Reference quirk, preserved + cross-executed
    (test_reference_product_parity.py): the per-image loop breaks on the
    last train image BEFORE the mean-save check (diffusion_latent.py:
    803-806 vs :808-828), so num_mean_of_delta_hs >= n_train_img harvests
    everything and saves NOTHING."""
    import logging

    _make_delta_ckpt(ws, "meq_LC_CUSTOM_t999_ninv4_ngen4_0.pth")
    with caplog.at_level(logging.WARNING):
        rc = cli_main(_common(ws, "meq", [
            "--run_test", "--train_delta_block", "--edit_attr", "smiling",
            "--load_from_checkpoint", "meq",
            "--num_mean_of_delta_hs", "2", "--do_test", "0", "--do_train", "1",
        ]))
    assert rc == 0
    latent = os.listdir(ws / "checkpoint_latent") if (
        ws / "checkpoint_latent").exists() else []
    assert not any(f.startswith("meq_") for f in latent), latent
    assert any("NOT saved" in r.message for r in caplog.records)


def test_mean_of_delta_hs_accumulates_coeff_passes(ws):
    """Harvest x delta_interpolation: the reference accumulates delta_h
    across the per-hs_coeff sweep passes and divides by the IMAGE count
    only (diffusion_latent.py:528-532, :811-815) — with two identical
    sweep coefficients the saved rows must be exactly 2x the
    single-pass rows."""
    from asyrp_official_tpu.compat.delta_ckpt import load_delta_checkpoint

    _make_delta_ckpt(ws, "macc_LC_CUSTOM_t999_ninv4_ngen4_0.pth")
    base = ["--run_test", "--train_delta_block", "--edit_attr", "smiling",
            "--load_from_checkpoint", "macc",
            "--num_mean_of_delta_hs", "1", "--do_test", "0", "--do_train", "1"]
    assert cli_main(_common(ws, "macc1", base)) == 0
    assert cli_main(_common(ws, "macc2", base + [
        "--delta_interpolation", "--num_delta", "2",
        "--min_delta", "1.0", "--max_delta", "1.0",
    ])) == 0
    one = load_delta_checkpoint(
        ws / "checkpoint_latent" / "macc1_LC_CUSTOM_t999_ninv4_ngen4_4_1.pth"
    )["delta_rows"]
    two = load_delta_checkpoint(
        ws / "checkpoint_latent" / "macc2_LC_CUSTOM_t999_ninv4_ngen4_4_1.pth"
    )["delta_rows"]
    assert sorted(one) == sorted(two) and len(one) > 1
    for k in one:
        # the sweep run goes through the BATCHED path (batch-2 program) vs
        # the single pass's batch-1 program: XLA fusion noise is ~3e-6 abs
        # on O(0.3) rows; a missing accumulation would be 2x (100%) off
        np.testing.assert_allclose(two[k], 2.0 * one[k], rtol=1e-4, atol=1e-5)


def test_target_image_id_with_batch_is_loud(ws, caplog):
    """run_test's target filter compares per-image ids against the batch
    start offset; with bs_train > 1 it would silently skip (or drag in
    batch-mates). The reference asserts bs==1 (diffusion_latent.py:781-782);
    we must error, not complete 'successfully' with zero images."""
    _make_delta_ckpt(ws, "tgt_LC_CUSTOM_t999_ninv4_ngen4_0.pth")
    rc = cli_main(_common(ws, "tgt", [
        "--run_test", "--train_delta_block", "--edit_attr", "smiling",
        "--load_from_checkpoint", "tgt",
        "--target_image_id", "1", "--bs_train", "2",
    ]))
    assert rc == 1
    errs = [r for r in caplog.records if r.exc_info]
    assert errs and "bs_train == 1" in str(errs[-1].exc_info[1])


def test_do_train_0_skips_training_loop(ws):
    """--run_train --do_train 0: the reference gates the whole per-iteration
    train block on do_train (diffusion_latent.py:237) — no training, no
    checkpoint written."""
    rc = cli_main(_common(ws, "dt0", [
        "--run_train", "--train_delta_block", "--edit_attr", "smiling",
        "--do_train", "0", "--do_test", "0",
    ]))
    assert rc == 0
    cks = [c for c in os.listdir(ws / "checkpoint") if c.startswith("dt0_")]
    assert not cks, cks

def test_batched_sweep_matches_looped(ws, monkeypatch):
    """--delta_interpolation sweeps batch into one compiled chain
    (runner._batched_sweep): stacking the coefficients along the batch axis
    must reproduce the per-coefficient loop's grids — same chains, same
    step tables, only the dispatch shape differs (sweep semantics:
    diffusion_latent.py:726-755)."""
    from PIL import Image

    _make_delta_ckpt(ws, "swp_LC_CUSTOM_t999_ninv4_ngen4_0.pth")
    base = ["--run_test", "--train_delta_block", "--edit_attr", "smiling",
            "--load_from_checkpoint", "swp", "--do_train", "0",
            "--delta_interpolation", "--num_delta", "3",
            "--min_delta", "-0.5", "--max_delta", "1.0", "--save_x_origin"]
    monkeypatch.delenv("ASYRP_TPU_NO_BATCHED_SWEEP", raising=False)
    assert cli_main(_common(ws, "swb", base)) == 0
    monkeypatch.setenv("ASYRP_TPU_NO_BATCHED_SWEEP", "1")
    assert cli_main(_common(ws, "swl", base)) == 0

    def grids(exp):
        d = ws / "runs" / f"{exp}_LC_CUSTOM_t999_ninv4_ngen4" / "test_images" / "4"
        return {f: np.asarray(Image.open(d / f)).astype(np.int32)
                for f in sorted(os.listdir(d)) if f.endswith(".png")}

    gb, gl = grids("swb"), grids("swl")
    assert sorted(gb) == sorted(gl) and gb
    for name in gb:
        assert gb[name].shape == gl[name].shape, name
        # same framework, same device — only XLA fusion at the batched
        # shape differs; quantization absorbs it to <=1 LSB
        err = np.abs(gb[name] - gl[name]).max()
        assert err <= 1, (name, int(err))


def test_batched_sweep_tail_chunk_and_cap(ws, monkeypatch):
    """A sweep longer than ASYRP_TPU_SWEEP_MAX_BATCH chunks; the padded
    tail chunk must not duplicate or drop rows."""
    from PIL import Image

    _make_delta_ckpt(ws, "swc_LC_CUSTOM_t999_ninv4_ngen4_0.pth")
    monkeypatch.setenv("ASYRP_TPU_SWEEP_MAX_BATCH", "2")
    base = ["--run_test", "--train_delta_block", "--edit_attr", "smiling",
            "--load_from_checkpoint", "swc", "--do_train", "0",
            "--delta_interpolation", "--num_delta", "3",
            "--min_delta", "0.0", "--max_delta", "1.0"]
    assert cli_main(_common(ws, "swc1", base)) == 0
    monkeypatch.setenv("ASYRP_TPU_NO_BATCHED_SWEEP", "1")
    assert cli_main(_common(ws, "swc2", base)) == 0
    for exp in ("swc1", "swc2"):
        d = ws / "runs" / f"{exp}_LC_CUSTOM_t999_ninv4_ngen4" / "test_images" / "4"
        pngs = sorted(f for f in os.listdir(d) if f.endswith(".png"))
        assert pngs, exp
    d1 = ws / "runs" / "swc1_LC_CUSTOM_t999_ninv4_ngen4" / "test_images" / "4"
    d2 = ws / "runs" / "swc2_LC_CUSTOM_t999_ninv4_ngen4" / "test_images" / "4"
    for f in sorted(os.listdir(d1)):
        a = np.asarray(Image.open(d1 / f)).astype(np.int32)
        b = np.asarray(Image.open(d2 / f)).astype(np.int32)
        assert a.shape == b.shape and np.abs(a - b).max() <= 1, f


@pytest.mark.slow
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
