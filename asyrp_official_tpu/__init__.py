"""Asyrp-TPU: a TPU-native (JAX/XLA/Pallas) framework for h-space editing of
frozen diffusion models, with the capabilities of kwonminki/Asyrp_official
("Diffusion Models already have a Semantic Latent Space", ICLR 2023).

Built from scratch, TPU-first:
  * NHWC tensor layout everywhere (XLA-preferred on TPU).
  * Pure-functional models over param pytrees; encoder runs once, the two
    decoder passes of the asymmetric reverse process are fused into a single
    2B-batch decode (bigger MXU matmuls, no skip-list mutation hazard).
  * The per-timestep Python control flow of the reference (t >= t_edit
    gating, eta noise boosting, per-t delta lookup) is compiled into static
    step tables driven by `jax.lax.scan` — one XLA compile per
    (schedule, shape).
  * Multi-device scaling via `jax.sharding.Mesh` + NamedSharding (batch
    sharding for inference/precompute, psum'd Δ-grads for training).
"""

__version__ = "0.1.0"

from asyrp_official_tpu.core.schedule import (
    Schedule,
    make_schedule,
    space_timesteps,
    train_seq,
    uniform_seq,
)


def __getattr__(name):
    """Lazy top-level API (keeps bare `import asyrp_official_tpu` light)."""
    if name == "resolve":
        from asyrp_official_tpu.models.registry import resolve

        return resolve
    if name == "EditState":
        from asyrp_official_tpu.models.delta import EditState

        return EditState
    if name == "engine":
        from asyrp_official_tpu.pipelines import engine

        return engine
    if name == "AsyrpRunner":
        from asyrp_official_tpu.runner import AsyrpRunner

        return AsyrpRunner
    raise AttributeError(name)
