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


def save_train_state(
    path: str, *, trainable, opt_state, it_out: int, extra: Optional[Dict] = None
) -> None:
    ocp = _ocp()
    path = os.path.abspath(path)
    state = {
        "trainable": trainable,
        "opt_state": opt_state,
        "meta": {"it_out": np.asarray(it_out)},
        # always present: a conditional key would make the restore
        # structure depend on save-time arguments the loader can't know
        "extra": extra if extra else _EMPTY_EXTRA,
    }
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
    ocp = _ocp()
    ckptr = ocp.StandardCheckpointer()
    like2 = dict(like)
    if "extra" not in like2:
        like2["extra"] = _EMPTY_EXTRA
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
