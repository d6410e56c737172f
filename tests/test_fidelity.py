"""Fidelity-gate harness (weights-gated metric; machinery tested with
random LPIPS params)."""
import numpy as np
import pytest
from PIL import Image

import jax

from asyrp_official_tpu.losses import lpips_jax
from asyrp_official_tpu.pipelines.fidelity import compare_images, compare_output_dirs


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    a = tmp_path_factory.mktemp("ours")
    b = tmp_path_factory.mktemp("theirs")
    rng = np.random.RandomState(0)
    for i in range(3):
        img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(a / f"img_{i}.png")
        Image.fromarray(img).save(b / f"img_{i}.png")  # identical
    Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8)).save(
        b / "extra.png"
    )
    return str(a), str(b)


def test_identical_dirs_zero(dirs):
    lp = lpips_jax.init(jax.random.PRNGKey(0))
    report = compare_output_dirs(dirs[0], dirs[1], lp)
    assert report["n"] == 3  # filename intersection
    assert report["mean"] == pytest.approx(0.0, abs=1e-6)


def test_different_images_nonzero(dirs, tmp_path):
    lp = lpips_jax.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(9)
    p1 = str(tmp_path / "x.png")
    p2 = str(tmp_path / "y.png")
    Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8)).save(p1)
    Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8)).save(p2)
    report = compare_images(lp, [p1], [p2])
    assert report["mean"] > 0


def test_no_overlap_raises(tmp_path):
    a = tmp_path / "a"; a.mkdir()
    b = tmp_path / "b"; b.mkdir()
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(a / "only_a.png")
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(b / "only_b.png")
    lp = lpips_jax.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        compare_output_dirs(str(a), str(b), lp)
