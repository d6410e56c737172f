"""Shape debugging — the reference's `forward_layer_check`
(models/ddpm/diffusion.py:582-678) prints every tensor shape then drops into
pdb; here the same information comes from abstract evaluation (no FLOPs, no
debugger): a table of every layer boundary's shape for any family/config.
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

__all__ = ["forward_shape_report"]


def forward_shape_report(spec, batch: int = 1) -> List[Tuple[str, tuple]]:
    """Abstractly evaluate the forward and report (stage, shape) rows, plus
    print them. Works for both families via the ModelSpec interface."""
    import numpy as np

    cfg = spec.config
    res = spec.resolution
    cin = getattr(cfg, "in_channels", 3)
    rows: List[Tuple[str, tuple]] = [("input", (batch, res, res, cin))]

    params_shape = jax.eval_shape(lambda k: spec.init(k), jax.random.PRNGKey(0))
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params_shape))
    rows.append(("params (count)", (n_params,)))

    def fwd(params, x, t):
        eps, eps_mod, delta_h, middle_h = spec.apply(params, x, t)
        return eps, middle_h

    x = jax.ShapeDtypeStruct((batch, res, res, cin), jnp.float32)
    t = jax.ShapeDtypeStruct((batch,), jnp.float32)
    eps, mid = jax.eval_shape(fwd, params_shape, x, t)
    rows.append(("middle_h (h-space)", tuple(mid.shape)))
    rows.append(("eps output", tuple(eps.shape)))

    for name, shape in rows:
        print(f"{name:24s} {shape}")
    return rows
