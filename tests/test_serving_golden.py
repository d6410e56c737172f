"""Serving bit-stability golden (VERDICT r5 item 7).

Training drift is pinned by tests/golden/tiny_delta_golden.npz; nothing
pinned the SERVING chain (run_test: ckpt resolution -> invert -> edited
dual-decode generation -> grid writer) across rounds — an engine refactor
or XLA upgrade could silently move every served pixel without failing a
test. Two guards, mirroring test_train_determinism.py:

  1. same-session determinism: the tiny --run_test recipe served twice
     produces byte-identical grid pixels;
  2. a committed golden (tests/golden/tiny_serving_golden.npz): re-serving
     the frozen recipe must match within one uint8 level per pixel (XLA
     version drift is sub-quantization; a semantics change in the DDIM
     rule, Δ injection, t_edit gating, or the [-1,1]->uint8 writer moves
     pixels by many levels). Regenerate DELIBERATELY with
     `python tests/test_serving_golden.py` after an intentional
     serving-semantics change, and say why in the commit.

Serving determinism is implied by the reference (fixed seed, eta-noise from
the seeded torch generator, diffusion_latent.py:858-1009 under
main.py:314-318 seeding).
"""
import os
import pathlib
import sys

import numpy as np

GOLDEN = pathlib.Path(__file__).resolve().parent / "golden" / "tiny_serving_golden.npz"

RECIPE = ["--run_test", "--train_delta_block", "--edit_attr", "smiling",
          "--load_from_checkpoint", "golden", "--do_train", "0"]


def _serve_once(ws_root, tag):
    import jax

    from asyrp_official_tpu.cli.main import main as cli_main
    from asyrp_official_tpu.compat.delta_ckpt import save_delta_checkpoint
    from asyrp_official_tpu.models.delta import delta_block_init
    from asyrp_official_tpu.utils import hostrng
    from asyrp_official_tpu.utils.tinyws import tiny_base_argv, write_tiny_workspace
    from PIL import Image

    ws = os.path.join(str(ws_root), tag)
    os.makedirs(os.path.join(ws, "checkpoint"), exist_ok=True)
    cfg, imgs = write_tiny_workspace(ws)
    # deterministic trained-block stand-in: hostrng is seed-stable across
    # jax versions (raw threefry, pinned in test_hostrng.py)
    block = delta_block_init(hostrng.PRNGKey(123), 64, 128)
    save_delta_checkpoint(
        os.path.join(ws, "checkpoint", "golden_LC_CUSTOM_t999_ninv4_ngen4_0.pth"),
        blocks=[jax.tree.map(np.asarray, block)], flavor="ddpm",
    )
    rc = cli_main(tiny_base_argv(
        cfg, imgs, ws, os.path.join(ws, "runs", "exp"),
        bs_train=1, edit_attr=None, extra=RECIPE,
    ))
    assert rc == 0
    out = {}
    run_dir = os.path.join(ws, "runs", "exp_LC_CUSTOM_t999_ninv4_ngen4")
    for r, _, fs in os.walk(run_dir):
        for f in sorted(fs):
            if f.endswith(".png"):
                rel = os.path.relpath(os.path.join(r, f), run_dir)
                out[rel] = np.asarray(Image.open(os.path.join(r, f)))
    assert out, f"no grids under {run_dir}"
    return out


def test_serving_is_deterministic_and_matches_golden(tmp_path):
    a = _serve_once(tmp_path, "a")
    b = _serve_once(tmp_path, "b")
    assert sorted(a) == sorted(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)

    assert GOLDEN.exists(), (
        f"{GOLDEN} missing — regenerate with "
        "`python tests/test_serving_golden.py`"
    )
    g = np.load(GOLDEN)
    assert sorted(g.files) == sorted(a), (sorted(g.files), sorted(a))
    for k in a:
        diff = np.abs(g[k].astype(np.int16) - a[k].astype(np.int16))
        # one uint8 level of quantization slack for XLA reduction-order
        # drift; real serving-chain changes move pixels by many levels
        assert diff.max() <= 1, (k, int(diff.max()))
        assert (diff > 0).mean() < 0.01, (k, float((diff > 0).mean()))


if __name__ == "__main__":  # golden regeneration
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    import jax

    jax.config.update("jax_platforms", "cpu")
    import tempfile

    grids = _serve_once(tempfile.mkdtemp(), "golden")
    GOLDEN.parent.mkdir(exist_ok=True)
    np.savez(GOLDEN, **grids)
    print(f"wrote {GOLDEN} ({len(grids)} grids: {sorted(grids)})")
    os._exit(0)
