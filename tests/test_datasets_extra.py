"""Dialog/attr datasets with synthetic annotations; with-h precompute cache;
respacing + EMA utilities; entry() traceability."""
import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from asyrp_official_tpu.core.schedule import make_schedule, space_timesteps, update_ema
from asyrp_official_tpu.data.datasets import CelebAAttrDataset, CelebADialogDataset
from asyrp_official_tpu.models import ddpmpp
from asyrp_official_tpu.models.registry import ModelSpec
from asyrp_official_tpu.pipelines.precompute import precompute_with_h


@pytest.fixture(scope="module")
def dialog_root(tmp_path_factory):
    d = tmp_path_factory.mktemp("dialog")
    rng = np.random.RandomState(0)
    lines = []
    for i in range(8):
        name = f"{i:06d}.jpg"
        Image.fromarray((rng.rand(40, 40, 3) * 255).astype(np.uint8)).save(d / name)
        young = 0 if i % 2 == 0 else 5
        lines.append(f"{name} 0 0 0 3 {young} ")
    with open(d / "train_attr_list.txt", "w") as f:
        f.write("\n".join(lines))
    return str(d)


def test_dialog_dataset_pairs(dialog_root):
    ds = CelebADialogDataset(dialog_root, train=True, guid="Young", image_size=32)
    assert len(ds) == 4  # min(#attr==0, #attr==5)
    img0, img5 = ds[0]
    assert img0.shape == (32, 32, 3) and img5.shape == (32, 32, 3)


def test_attr_dataset(tmp_path):
    rng = np.random.RandomState(1)
    names = ["Smiling", "Young"] + [f"A{i}" for i in range(38)]
    lines = ["2", " ".join(names)]
    for i in range(2):
        name = f"{i}.jpg"
        Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8)).save(
            tmp_path / name
        )
        lines.append(name + " " + " ".join(["1" if j % 2 else "-1" for j in range(40)]))
    anno = tmp_path / "CelebAMask-HQ-attribute-anno.txt"
    anno.write_text("\n".join(lines))
    ds = CelebAAttrDataset(str(tmp_path), image_size=32)
    assert len(ds) == 2
    img, attrs = ds[0]
    assert img.shape == (32, 32, 3) and attrs.shape == (40,)
    assert ds.attr_names[0] == "Smiling"


def test_precompute_with_h_cache(tmp_path):
    cfg = ddpmpp.DDPMppConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                              attn_resolutions=(16,), resolution=32)
    spec = ModelSpec("ddpmpp", cfg, False, "ddpm")
    params = spec.init(jax.random.PRNGKey(0))
    sched = make_schedule()
    x0 = np.random.RandomState(0).randn(1, 32, 32, 3).astype(np.float32)
    out = precompute_with_h(
        spec, params, sched, x0, n_inv_step=4, cache_key="img0",
        cache_dir=str(tmp_path),
    )
    assert out["h_traj"].shape == (3, 1, 16, 16, cfg.bottleneck_ch)
    assert list(out["h_times"]) == [0, 333, 666]
    # cache hit
    again = precompute_with_h(
        spec, params, sched, x0, n_inv_step=4, cache_key="img0",
        cache_dir=str(tmp_path),
    )
    np.testing.assert_allclose(again["x_lat"], out["x_lat"])


def test_space_timesteps():
    assert space_timesteps(1000, "ddim25") == list(range(0, 1000, 40))
    out = space_timesteps(100, [10])
    assert len(out) == 10 and out[0] == 0 and out[-1] == 99
    two = space_timesteps(100, [5, 5])
    assert len(two) == 10 and two[5] == 50
    with pytest.raises(ValueError):
        space_timesteps(10, [20])


def test_update_ema():
    ema = {"w": jnp.ones(3)}
    new = {"w": jnp.zeros(3)}
    out = update_ema(ema, new, rate=0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.9)

@pytest.mark.slow
def test_graft_entry_traces():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    # trace (no execution) — the driver's compile-check precondition
    shapes = jax.eval_shape(fn, *args)
    assert shapes[0].shape == (1, 256, 256, 3)
    assert shapes[1].shape == (1, 256, 256, 3)


def test_edit_recon_pair_dataset(tmp_path):
    """sc_loss_dataset.py analog: paired edit/recon images by file name."""
    import numpy as np
    from PIL import Image

    from asyrp_official_tpu.data.datasets import EditReconPairDataset

    for sub in ("edit_image", "recon_image"):
        (tmp_path / sub).mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        for sub, ofs in (("edit_image", 0), ("recon_image", 100)):
            Image.fromarray(
                ((rng.rand(20, 20, 3) * 100) + ofs).astype(np.uint8)
            ).save(tmp_path / sub / f"{i}.png")
    ds = EditReconPairDataset(str(tmp_path), image_size=16)
    assert len(ds) == 3
    e, r = ds[0]
    assert e.shape == r.shape == (16, 16, 3)
    assert e.dtype == np.float32 and e.min() >= -1 and e.max() <= 1
    # recon images were built brighter — the pairing is by name, not mixed
    assert r.mean() > e.mean()
