"""Shared float-parity helpers for the sharded-serving equivalence tests
(test_runner_dp.py / test_runner_multiprocess.py) — one definition of the
noise bound and the artifact loaders so the two suites enforce the SAME
contract."""
import os

import numpy as np


def close_to_scale(a, b, label, bound=1e-4):
    """Scale-relative float bound: max|a-b| <= bound * max|a|.

    With random weights the serving chains are expansive (x_rec reaches
    O(350)), so benign XLA scheduling noise shows up at ~1e-5 RELATIVE TO
    THE ARRAY SCALE while staying huge in per-element rtol terms on
    near-zero entries; a real reduction-order/shard bug lands at O(1) of
    scale. bound=1e-4 is 8x the observed noise ceiling (1.3e-5)."""
    a, b = np.asarray(a), np.asarray(b)
    scale = np.abs(a).max()
    assert scale > 0, label
    err = np.abs(a - b).max() / scale
    assert err <= bound, (label, err, scale)


def load_mean_rows(work_dir):
    """The single harvested mean-Δh checkpoint under
    {work_dir}/checkpoint_latent — the edited-generation-chain artifact."""
    from asyrp_official_tpu.compat.delta_ckpt import load_delta_checkpoint

    d = os.path.join(str(work_dir), "checkpoint_latent")
    files = sorted(os.listdir(d))
    assert len(files) == 1, (work_dir, files)
    return load_delta_checkpoint(os.path.join(d, files[0]))["delta_rows"]


def tiny_lpips_ckpt(path, seed=0):
    """Random-weight LPIPS (AlexNet features + lin heads) checkpoint in the
    --lpips_ckpt npz layout. Random weights are fine for PIPELINE tests: the
    calibration stage's control flow, batching, and tsv format don't depend
    on the values (metric parity has its own suite,
    test_lpips_metric_parity.py)."""
    from asyrp_official_tpu.losses import lpips_jax

    r = np.random.RandomState(seed)
    idx = [0, 3, 6, 8, 10]
    chans = [(3, 64, 11), (64, 192, 5), (192, 384, 3), (384, 256, 3),
             (256, 256, 3)]
    alex_sd = {}
    for j, (cin, cout, k) in zip(idx, chans):
        alex_sd[f"features.{j}.weight"] = (
            r.randn(cout, cin, k, k).astype(np.float32) * 0.05
        )
        alex_sd[f"features.{j}.bias"] = r.randn(cout).astype(np.float32) * 0.05
    lin_sd = {
        f"lin{i}.model.1.weight": np.abs(
            r.randn(1, c, 1, 1).astype(np.float32)
        )
        for i, c in enumerate([64, 192, 384, 256, 256])
    }
    params = lpips_jax.params_from_torch(alex_sd, lin_sd)
    np.savez(path, params=np.array(params, dtype=object))
    return str(path)


def load_pairs_npz(work_dir):
    """All precompute caches under {work_dir}/precomputed — the
    inversion/reconstruction-chain artifacts."""
    d = os.path.join(str(work_dir), "precomputed")
    files = sorted(f for f in os.listdir(d) if f.endswith(".npz"))
    assert files, f"no precompute cache under {d}"
    return {f: np.load(os.path.join(d, f)) for f in files}


def randomize_zero_params(model, seed=123, std=0.05):
    """Light up the OpenAI UNets' zero_module'd branches for parity tests.

    The guided/improved UNets zero-initialize every residual-branch output
    (ResBlock out conv, attention proj_out, the final out conv —
    models/improved_ddpm/nn.py:68-74), so a fresh-init model is
    output-identically-zero through ALL of those paths: a parity test on
    raw init weights never exercises the resblock in/emb layers,
    scale-shift application, or attention qkv at the output (discovered
    round 4 — et was bitwise 0 in every openai forward-parity fixture).
    Real released weights are nonzero there. Re-randomize every all-zero
    parameter in place (GroupNorm biases included — any valid weight
    assignment is a valid parity point) before converting/saving.
    Returns the number of tensors touched."""
    import torch

    g = torch.Generator().manual_seed(seed)
    n = 0
    with torch.no_grad():
        for p in model.parameters():
            if p.numel() and float(p.abs().max()) == 0.0:
                p.copy_(torch.randn(p.shape, generator=g) * std)
                n += 1
    return n
