"""Trained-Δ determinism (VERDICT r3 item 7).

The parity tests pin the training MATH against torch; nothing pinned the
training RESULT across rounds — a silent refactor of the scan-carried
optimizer, the origin cache, or the param-init seeding would change trained
checkpoints without failing any test. Two guards:

  1. same-session determinism: the tiny recipe trained twice from one seed
     produces bit-identical Δ params;
  2. a committed golden (tests/golden/tiny_delta_golden.npz): retraining the
     frozen recipe must match at float tolerance. Regenerate DELIBERATELY
     with `python tests/test_train_determinism.py` after an intentional
     training-semantics change, and say why in the commit.

Training determinism is implied by the reference (fixed torch seed, no
dropout, SGD — diffusion_latent.py:301-354 under main.py:314-318 seeding).
"""
import os
import pathlib
import sys

import numpy as np
import pytest

GOLDEN = pathlib.Path(__file__).resolve().parent / "golden" / "tiny_delta_golden.npz"

RECIPE = ["--run_train", "--train_delta_block", "--do_test", "0",
          "--n_iter", "2"]  # 2 iters: the origin cache engages on iter >= 2


def _train_once(ws_root, exp):
    from asyrp_official_tpu.cli.main import main as cli_main
    from asyrp_official_tpu.compat.delta_ckpt import load_delta_checkpoint
    from asyrp_official_tpu.utils.tinyws import tiny_base_argv, write_tiny_workspace

    ws = os.path.join(str(ws_root), exp)
    os.makedirs(ws, exist_ok=True)
    cfg, imgs = write_tiny_workspace(ws)
    rc = cli_main(tiny_base_argv(
        cfg, imgs, ws, os.path.join(ws, "runs", "exp"), extra=RECIPE,
    ))
    assert rc == 0
    ck = os.path.join(ws, "checkpoint", "exp_LC_CUSTOM_t999_ninv4_ngen4_1.pth")
    loaded = load_delta_checkpoint(ck)
    sd = {}
    for i, block in enumerate(loaded["blocks"]):
        import jax

        for path, leaf in jax.tree_util.tree_flatten_with_path(block)[0]:
            key = f"{i}/" + "/".join(str(getattr(p, "key", p)) for p in path)
            sd[key] = np.asarray(leaf)
    return sd


def test_retrain_is_deterministic_and_matches_golden(tmp_path):
    a = _train_once(tmp_path, "a")
    b = _train_once(tmp_path, "b")
    assert sorted(a) == sorted(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)

    assert GOLDEN.exists(), (
        f"{GOLDEN} missing — regenerate with "
        "`python tests/test_train_determinism.py`"
    )
    g = np.load(GOLDEN)
    assert sorted(g.files) == sorted(a), (sorted(g.files), sorted(a))
    for k in a:
        scale = max(np.abs(g[k]).max(), 1e-8)
        err = np.abs(g[k] - a[k]).max() / scale
        # scale-relative: XLA version drift is O(1e-6); a semantics change
        # (loss weight, lr schedule, origin-cache math) lands O(1)
        assert err < 1e-4, (k, err, scale)


if __name__ == "__main__":  # golden regeneration
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    import jax

    jax.config.update("jax_platforms", "cpu")
    import tempfile

    sd = _train_once(tempfile.mkdtemp(), "golden")
    GOLDEN.parent.mkdir(exist_ok=True)
    np.savez(GOLDEN, **sd)
    print(f"wrote {GOLDEN} ({len(sd)} leaves)")
    os._exit(0)
