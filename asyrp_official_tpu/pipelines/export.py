"""AOT export of the fused serving engine (`engine.make_invert_edit`).

Production serving should not pay Python tracing or (worse) remote
recompilation at cold start: `export_invert_edit` lowers the whole
invert→edit program once — for any target platform, from any host — and
serializes it (StableHLO via `jax.export`). `load_serving` restores a
callable with the original `(params, edit, x0, rng)` signature from the
artifact alone; the model code is not needed at load time.

The exported calling convention is the FLATTENED leaf list of
(params, edit): `EditState` is a custom pytree whose static fields
(mode/flavor/...) are baked into the traced program at export, so the
artifact only needs the array leaves back in flattening order — no
pytree-serialization registry required.

The reference (eager torch) has no equivalent; this is
production-serving surface beyond parity.
"""
from __future__ import annotations

import json
import os
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

from asyrp_official_tpu.core.schedule import Schedule
from asyrp_official_tpu.models.delta import EditState
from asyrp_official_tpu.models.registry import ModelSpec
from asyrp_official_tpu.pipelines import engine

__all__ = ["export_invert_edit", "save_serving", "load_serving"]

_META_SUFFIX = ".meta.json"


def export_invert_edit(
    spec: ModelSpec,
    schedule: Schedule,
    seq_inv,
    seq_gen,
    example_params,
    example_edit: EditState,
    *,
    t_edit: int,
    t_addnoise: int = -1,
    batch: int = 1,
    image_size: int = 256,
    channels: int = 3,
    compute_dtype=jnp.float32,
    platforms: Sequence[str] = ("tpu",),
) -> Tuple[bytes, dict]:
    """Lower + serialize the fused serving program. Returns
    (artifact_bytes, meta) where meta records the leaf split and input
    shape needed to rebuild the public signature."""
    run = engine.make_invert_edit(
        spec, schedule, seq_inv, seq_gen, t_edit=t_edit,
        t_addnoise=t_addnoise, compute_dtype=compute_dtype,
    )

    p_leaves, p_def = jax.tree.flatten(example_params)
    e_leaves, e_def = jax.tree.flatten(example_edit)
    n_p, n_e = len(p_leaves), len(e_leaves)

    def flat_fn(*leaves):
        params = jax.tree.unflatten(p_def, leaves[:n_p])
        edit = jax.tree.unflatten(e_def, leaves[n_p : n_p + n_e])
        x0, key = leaves[n_p + n_e], leaves[n_p + n_e + 1]
        return run(params, edit, x0, key)

    def _sds(x):
        a = jnp.asarray(x)
        return jax.ShapeDtypeStruct(a.shape, a.dtype)

    args = (
        [_sds(x) for x in p_leaves]
        + [_sds(x) for x in e_leaves]
        + [
            jax.ShapeDtypeStruct(
                (batch, image_size, image_size, channels), jnp.float32
            ),
            _sds(jax.random.PRNGKey(0)),
        ]
    )
    exported = jax_export.export(jax.jit(flat_fn), platforms=list(platforms))(
        *args
    )
    meta = {
        "n_params_leaves": n_p,
        "n_edit_leaves": n_e,
        "batch": batch,
        "image_size": image_size,
        "channels": channels,
        "platforms": list(platforms),
        "t_edit": int(t_edit),
        "t_addnoise": int(t_addnoise),
    }
    return exported.serialize(), meta


def save_serving(path: str, artifact: bytes, meta: dict) -> None:
    """Write `{path}` (serialized program) + `{path}.meta.json`
    (tmp-then-replace — a half-written artifact must not load)."""
    for target, write in (
        (path, lambda f: f.write(artifact)),
        (path + _META_SUFFIX, lambda f: json.dump(meta, f, indent=1)),
    ):
        tmp = f"{target}.tmp.{os.getpid()}"
        mode = "wb" if target == path else "w"
        try:
            with open(tmp, mode) as f:
                write(f)
            os.replace(tmp, target)
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)


def load_serving(path: str) -> Callable:
    """Restore `fn(params, edit, x0, rng) -> x_edited` from an artifact
    written by `save_serving`. Only the leaf COUNT is checked here; leaf
    shapes/dtypes are validated by the deserialized program itself."""
    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    with open(path + _META_SUFFIX) as f:
        meta = json.load(f)
    n_p, n_e = meta["n_params_leaves"], meta["n_edit_leaves"]

    def fn(params, edit, x0, rng):
        p_leaves = jax.tree.leaves(params)
        e_leaves = jax.tree.leaves(edit)
        if len(p_leaves) != n_p or len(e_leaves) != n_e:
            raise ValueError(
                f"artifact expects {n_p} param leaves + {n_e} edit leaves, "
                f"got {len(p_leaves)} + {len(e_leaves)}"
            )
        leaves = [jnp.asarray(x) for x in (*p_leaves, *e_leaves, x0, rng)]
        return exported.call(*leaves)

    fn.meta = meta
    return fn
