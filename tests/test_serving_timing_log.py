"""run_test serving-timing record (round 5).

The serving capture record (BASELINE.md round 5, VERDICT r5 item 2) rests
on run_test's own log line: first grid carries the chain compile, the
steady-state p50 over the remaining grids is the honest per-batch cost
(save_grid ends in a host fetch — a real barrier even through the TPU
relay, where block_until_ready is a no-op). Pin that instrumentation:

  * serving >1 grid emits exactly one "serving: N grids ..." INFO line
    whose fields are mutually consistent (p50/batch = bs * per-image;
    per-gen-step = per-image / chain length);
  * serving a single grid emits none (a lone compile-contaminated sample
    would be a misleading record — the len(grid_ms) > 1 guard).

Mirrors the timing surface of the reference's per-image prints
(/root/reference/diffusion_latent.py:1009 save loop, which logs no
timing at all — this exceeds it).
"""
import logging
import os
import re

import numpy as np
import pytest


def _serve(tmp_path, caplog, tag, n_test_img):
    import jax

    from asyrp_official_tpu.cli.main import main as cli_main
    from asyrp_official_tpu.compat.delta_ckpt import save_delta_checkpoint
    from asyrp_official_tpu.models.delta import delta_block_init
    from asyrp_official_tpu.utils import hostrng
    from asyrp_official_tpu.utils.tinyws import tiny_base_argv, write_tiny_workspace

    ws = os.path.join(str(tmp_path), tag)
    os.makedirs(os.path.join(ws, "checkpoint"), exist_ok=True)
    cfg, imgs = write_tiny_workspace(ws)
    block = delta_block_init(hostrng.PRNGKey(11), 64, 128)
    save_delta_checkpoint(
        os.path.join(ws, "checkpoint", "tlog_LC_CUSTOM_t999_ninv4_ngen4_0.pth"),
        blocks=[jax.tree.map(np.asarray, block)], flavor="ddpm",
    )
    with caplog.at_level(logging.INFO, logger="asyrp_official_tpu.runner"):
        rc = cli_main(tiny_base_argv(
            cfg, imgs, ws, os.path.join(ws, "runs", "exp"),
            bs_train=1, edit_attr=None,
            extra=["--run_test", "--train_delta_block", "--edit_attr",
                   "smiling", "--load_from_checkpoint", "tlog",
                   "--do_train", "0", "--n_test_img", str(n_test_img)],
        ))
    assert rc == 0
    return [r.getMessage() for r in caplog.records
            if r.getMessage().startswith("serving:")]


def test_multi_grid_serve_logs_consistent_timing(tmp_path, caplog):
    lines = _serve(tmp_path, caplog, "multi", 3)
    assert len(lines) == 1, lines
    m = re.fullmatch(
        r"serving: (\d+) grids, first \(incl\. compile\) (\d+) ms; steady "
        r"p50 (\d+) ms/batch = (\d+) ms/image = ([\d.]+) ms/gen-step "
        r"\((\d+)-step chain, bs (\d+)\)", lines[0])
    assert m, lines[0]
    n_grids, first, p50, per_img, per_step, chain, bs = m.groups()
    assert (n_grids, chain, bs) == ("3", "4", "1")
    assert int(first) > 0 and int(p50) > 0
    # bs 1: per-image == per-batch; per-gen-step = per-image / chain
    assert per_img == p50
    assert abs(float(per_step) - int(per_img) / int(chain)) < 1.0


def test_single_grid_serve_logs_nothing(tmp_path, caplog):
    assert _serve(tmp_path, caplog, "single", 1) == []


def test_serving_batch_advisory_bounds():
    """Long-chain batching advisory (BASELINE.md round 5): fires only for
    bs_train > 1 on chains >= 500 steps — the measured batching-hostile
    regime (bs 4 ran 1.44x worse/image at 1000 steps; bs 8 crashed the
    relay worker). Warning-only: run_test proceeds regardless."""
    from asyrp_official_tpu.runner import serving_batch_advisory

    assert serving_batch_advisory(1, 1000) is None       # batch 1: optimal
    assert serving_batch_advisory(8, 40) is None         # short chain: fine
    assert serving_batch_advisory(2, 499) is None        # below threshold
    for bs, n in ((2, 500), (4, 1000), (8, 1000)):
        msg = serving_batch_advisory(bs, n)
        assert msg and "--bs_train 1" in msg, (bs, n, msg)
