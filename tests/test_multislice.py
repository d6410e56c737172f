"""DCN multi-slice helpers (single-host semantics)."""
import numpy as np

from asyrp_official_tpu.parallel.multislice import (
    combine_delta_means,
    process_info,
    shard_work,
)


def test_process_info_single_host():
    assert process_info() == (0, 1)


def test_shard_work_partition():
    items = list(range(10))
    shards = [shard_work(items, i, 3) for i in range(3)]
    assert shards[0] == [0, 1, 2, 3]
    assert sum(shards, []) == items
    # every item exactly once
    assert sorted(x for s in shards for x in s) == items


def test_combine_delta_means_single():
    s = np.ones((2, 2)) * 6
    np.testing.assert_allclose(combine_delta_means(s, 3), 2.0)


def test_make_mesh_validates_device_count():
    import jax
    import pytest

    from asyrp_official_tpu.parallel import mesh as pmesh

    n = len(jax.devices())
    with pytest.raises(ValueError, match="available"):
        pmesh.make_mesh(n + 1)
    assert pmesh.make_mesh(-1).devices.size == n  # -1 == all
