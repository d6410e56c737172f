"""Datasets, loader, precompute cache semantics, LPIPS calibration stage."""
import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from asyrp_official_tpu.core.schedule import make_schedule
from asyrp_official_tpu.data.datasets import (
    ImageFolderDataset,
    Loader,
    center_crop_arr,
    get_dataset,
    imagenet_classes,
)
from asyrp_official_tpu.losses import lpips_jax
from asyrp_official_tpu.models import ddpmpp
from asyrp_official_tpu.models.registry import ModelSpec
from asyrp_official_tpu.pipelines import precompute as pc
from asyrp_official_tpu.pipelines.lpips_stage import compute_lpips_distance

CFG = ddpmpp.DDPMppConfig(
    ch=32, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(16,), resolution=32
)
SPEC = ModelSpec(family="ddpmpp", config=CFG, learn_sigma=False, delta_flavor="ddpm")
SCHED = make_schedule()


@pytest.fixture(scope="module")
def img_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    for i in range(6):
        arr = (rng.rand(40, 40, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"img_{i}.png")
    return str(d)


def test_image_folder(img_dir):
    ds = ImageFolderDataset(img_dir, image_size=32)
    assert len(ds) == 6
    x = ds[0]
    assert x.shape == (32, 32, 3)
    assert x.dtype == np.float32
    assert -1.0 <= x.min() and x.max() <= 1.0
    # tail-N split semantics (CustomImageDataset, data_utils.py:18-22)
    tr = ImageFolderDataset(img_dir, 32, test_nums=2, train=True)
    te = ImageFolderDataset(img_dir, 32, test_nums=2, train=False)
    assert len(tr) == 4 and len(te) == 2


def test_loader_batching(img_dir):
    ds = ImageFolderDataset(img_dir, image_size=32)
    batches = list(Loader(ds, batch_size=4))
    assert len(batches) == 1  # drop_last
    assert batches[0].shape == (4, 32, 32, 3)


def test_get_dataset_custom(img_dir):
    tr, te = get_dataset(
        "CUSTOM",
        {"custom_train": img_dir, "custom_test": img_dir},
        category="CUSTOM",
        image_size=32,
    )
    assert len(tr) == 6 and len(te) == 6


def test_center_crop_arr():
    img = Image.fromarray(np.zeros((100, 80, 3), np.uint8))
    arr = center_crop_arr(img, 32)
    assert arr.shape == (32, 32, 3)


def test_imagenet_classes_asset():
    dic = imagenet_classes()
    assert len(dic) == 1000
    assert dic["0"][0].startswith("n")


def test_precompute_cache_roundtrip(img_dir, tmp_path):
    params = SPEC.init(jax.random.PRNGKey(0))
    ds = ImageFolderDataset(img_dir, image_size=32)
    kw = dict(
        n_img=3, n_inv_step=4, mode="train", category="TESTCAT",
        cache_dir=str(tmp_path), batch_size=2,
    )
    pairs = pc.precompute_pairs(SPEC, params, SCHED, ds, **kw)
    assert pairs["x0"].shape == (3, 32, 32, 3)
    assert pairs["x_lat"].shape == (3, 32, 32, 3)
    base = pc.pairs_cache_path(str(tmp_path), "TESTCAT", "train", 999, 3, 4)
    assert os.path.exists(base + ".npz")
    # cache hit returns identical latents without recompute
    again = pc.precompute_pairs(SPEC, params, SCHED, ds, **kw)
    np.testing.assert_allclose(again["x_lat"], pairs["x_lat"])


def test_precompute_partial_resume(img_dir, tmp_path):
    params = SPEC.init(jax.random.PRNGKey(0))
    ds = ImageFolderDataset(img_dir, image_size=32)
    kw = dict(n_inv_step=4, mode="test", category="TESTCAT",
              cache_dir=str(tmp_path), batch_size=2)
    small = pc.precompute_pairs(SPEC, params, SCHED, ds, n_img=2, **kw)
    big = pc.precompute_pairs(SPEC, params, SCHED, ds, n_img=4, **kw)
    # the first 2 rows must be reused verbatim from the smaller cache
    np.testing.assert_allclose(big["x_lat"][:2], small["x_lat"])
    assert big["x_lat"].shape[0] == 4


def test_reference_pth_cache_interop(tmp_path, reference_path):
    """Our loader reads the reference's torch pair-cache format."""
    import torch

    pairs = [
        [torch.randn(1, 3, 8, 8), torch.randn(1, 3, 8, 8), torch.randn(1, 3, 8, 8)]
        for _ in range(3)
    ]
    base = str(tmp_path / "ref_pairs")
    torch.save(pairs, base + ".pth")
    loaded = pc.load_pairs_cache(base)
    assert loaded["x0"].shape == (3, 8, 8, 3)
    np.testing.assert_allclose(
        loaded["x_lat"][0], np.transpose(pairs[0][2][0].numpy(), (1, 2, 0))
    )


def test_random_noise_pairs():
    params = SPEC.init(jax.random.PRNGKey(0))
    out = pc.random_noise_pairs(
        SPEC, params, SCHED, n_img=3, n_inv_step=4, image_size=32,
        saved_noise=False,
    )
    assert out["x_lat"].shape == (3, 32, 32, 3)
    assert np.all(out["x0"] == 0)


def test_lpips_stage_writes_reference_format(img_dir, tmp_path):
    params = SPEC.init(jax.random.PRNGKey(0))
    lp = lpips_jax.init(jax.random.PRNGKey(1))
    ds = ImageFolderDataset(img_dir, image_size=32)
    curves = compute_lpips_distance(
        SPEC, params, SCHED, ds, lp, n_img=2, n_inv_step=5, batch_size=2,
        out_dir=str(tmp_path), dataset_name="testset",
    )
    assert set(curves) == {"x", "x_std", "x0_t", "x0_t_std"}
    assert len(curves["x"]) == 4  # seq[1:]
    # tsv round-trip through the interval-selection reader
    from asyrp_official_tpu.utils.assets import load_lpips_tsv

    path = os.path.join(str(tmp_path), "testset_LPIPS_distance_x0_t.tsv")
    assert os.path.exists(path)
    back = load_lpips_tsv(path)
    assert back == {t: pytest.approx(v) for t, v in curves["x0_t"].items()}


def test_loader_reshuffles_each_epoch(img_dir):
    """shuffle=True must produce a fresh permutation per pass (torch
    DataLoader semantics): a fixed permutation starves the drop_last tail
    of the same samples forever."""
    ds = ImageFolderDataset(str(img_dir), image_size=8)
    ld = Loader(ds, batch_size=1, shuffle=True, seed=0, drop_last=False)

    def epoch_sig():
        return tuple(float(b.sum()) for b in ld)

    e1, e2 = epoch_sig(), epoch_sig()
    assert sorted(e1) == sorted(e2)  # same samples...
    assert e1 != e2                  # ...different order
