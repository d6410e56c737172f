"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4).

Note: this image's sitecustomize registers an `axon` TPU backend and locks
JAX_PLATFORMS at interpreter start, so the env-var route doesn't work here —
`jax.config.update` after import does.
"""
import os

import re as _re

flags = os.environ.get("XLA_FLAGS", "")
# enforce the exact count — a pre-set flag with a DIFFERENT value would
# silently break every 8-device mesh test with confusing device errors
flags = _re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
REFERENCE = pathlib.Path("/root/reference")

sys.path.insert(0, str(REPO))


@pytest.fixture(scope="session")
def reference_path():
    """Path to the read-only PyTorch reference, for parity tests."""
    if not REFERENCE.exists():
        pytest.skip("reference repo not available")
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    return REFERENCE
