"""Multichip dryrun under CI: the full training step over an 8-device mesh
(the driver runs __graft_entry__.dryrun_multichip the same way)."""
import jax
import pytest


@pytest.mark.slow
def test_dryrun_multichip_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh (conftest)")
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)  # raises on any sharding/compile failure


def test_dryrun_multichip_2():
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(2)
