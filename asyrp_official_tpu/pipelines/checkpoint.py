"""Native training-state checkpointing (orbax) — full-fidelity resume.

The reference saves torch optimizer/scheduler state inside its Δ `.pth`
files (diffusion_latent.py:402-404). Our reference-compatible `.pth` writer
(compat/delta_ckpt.py) carries the Δ params; THIS module adds the native
sidecar with the complete train state — Δ params, optax optimizer state,
outer-iteration counter — so resume is bit-exact. Orbax handles atomic
writes and async-friendly layouts.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

__all__ = ["save_train_state", "load_train_state"]

# sentinel subtree standing in for an absent `extra` — orbax restore
# structure must not depend on save-time arguments
_EMPTY_EXTRA = {"_none": np.zeros((), np.float32)}


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def _flat_save(path: str, state) -> None:
    """Multi-process fallback: one flat .npz per host, no coordination.
    orbax's commit protocol (primary_host=0 directory barriers, and the
    array-metadata store even under primary_host=None) deadlocks when every
    host writes its OWN work dir; the state here is fully replicated, so a
    plain flattened-leaves file is lossless. Restored via `like`'s treedef.

    Written via per-process temp + atomic rename: on a SHARED filesystem
    every host targets the same path — the contents are identical (state is
    replicated), so last-rename-wins leaves a complete file either way."""
    leaves = [np.asarray(x) for x in jax.tree.leaves(state)]
    tmp = f"{path}.tmp.p{jax.process_index()}"
    with open(tmp, "wb") as f:
        np.savez(f, *leaves)
    os.replace(tmp, path)


def _flat_load(path: str, like):
    d = np.load(path)
    leaves = [d[f"arr_{i}"] for i in range(len(d.files))]
    treedef = jax.tree.structure(like)
    if treedef.num_leaves != len(leaves):
        raise ValueError(
            f"flat train-state {path} has {len(leaves)} leaves, "
            f"restore structure expects {treedef.num_leaves}"
        )
    return jax.tree.unflatten(treedef, leaves)


def save_train_state(
    path: str, *, trainable, opt_state, it_out: int, extra: Optional[Dict] = None
) -> None:
    path = os.path.abspath(path)
    state = {
        "trainable": trainable,
        "opt_state": opt_state,
        "meta": {"it_out": np.asarray(it_out)},
        # always present: a conditional key would make the restore
        # structure depend on save-time arguments the loader can't know
        "extra": extra if extra else _EMPTY_EXTRA,
    }
    if jax.process_count() > 1:
        _flat_save(path, state)
        return
    ocp = _ocp()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def load_train_state(path: str, *, like: Dict[str, Any]) -> Optional[Dict[str, Any]]:
    """`like` is a pytree of the same structure (e.g. the freshly-initialized
    state) used to restore concrete array types; callers who saved a real
    `extra` must include a matching like["extra"]. Returns None if absent."""
    path = os.path.abspath(path)
    if not os.path.exists(path):
        return None
    like2 = dict(like)
    if "extra" not in like2:
        like2["extra"] = _EMPTY_EXTRA
    if os.path.isfile(path):  # multi-process flat sidecar
        try:
            return _flat_load(path, like2)
        except ValueError:
            return _flat_load(path, like)
    ocp = _ocp()
    ckptr = ocp.StandardCheckpointer()
    try:
        return ckptr.restore(path, like2)
    except Exception as primary:
        # sidecars written before 'extra' became unconditional restore with
        # the caller's original structure; if THAT also fails, the ckpt is
        # genuinely bad — surface the first error, not the fallback's
        try:
            return ckptr.restore(path, like)
        except Exception:
            raise primary
