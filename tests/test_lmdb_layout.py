"""Byte-level LMDB layout pinned WITHOUT the `lmdb` package (absent in this
image — ROUND3.md): a dict-backed fake of the four lmdb API points the
readers/writer touch (`open`, `begin`, `txn.get`, `txn.put`) lets the real
code paths run end-to-end:

  our `data/prepare_lmdb.prepare` writes → BOTH our `CelebAHQLMDB` and the
  reference's own `MultiResolutionDataset`
  (/root/reference/datasets/CelebA_HQ_dataset.py:8-40) read the SAME store
  and must decode the same images — which executes the exact
  '{res}-{idx:05d}' / 'length' key encoding on both sides instead of just
  asserting the scheme as a string (VERDICT r3 item 8).

If the real lmdb package ever lands, swap the fake for a tmpdir LMDB; the
test body is already the round-trip.
"""
import io
import pathlib
import sys
import types

import numpy as np
import pytest
from PIL import Image

torch = pytest.importorskip("torch")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent / "refshims"))


class _FakeTxn:
    def __init__(self, store):
        self.store = store

    def get(self, key):
        assert isinstance(key, bytes), f"lmdb keys are bytes, got {type(key)}"
        return self.store.get(key)

    def put(self, key, value):
        assert isinstance(key, bytes) and isinstance(value, bytes)
        self.store[key] = value

    def cursor(self):
        raise NotImplementedError

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class _FakeEnv:
    stores = {}  # path -> dict, shared across open() calls like real lmdb

    def __init__(self, path):
        self.store = _FakeEnv.stores.setdefault(path, {})

    def begin(self, write=False):
        return _FakeTxn(self.store)

    def close(self):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


@pytest.fixture()
def fake_lmdb(monkeypatch):
    mod = types.ModuleType("lmdb")
    mod.open = lambda path, **kw: _FakeEnv(path)
    monkeypatch.setitem(sys.modules, "lmdb", mod)
    _FakeEnv.stores.clear()
    return mod


def _write_images(dir_, n=2, size=300):
    dir_.mkdir(exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(n):
        Image.fromarray(
            (rng.rand(size, size, 3) * 255).astype(np.uint8)
        ).save(dir_ / f"{i}.png")


def test_prepare_then_both_readers_roundtrip(fake_lmdb, tmp_path, monkeypatch):
    from asyrp_official_tpu.data.datasets import CelebAHQLMDB
    from asyrp_official_tpu.data.prepare_lmdb import prepare

    _write_images(tmp_path / "imgs")
    n = prepare(
        str(tmp_path / "LMDB_train"), str(tmp_path / "imgs"),
        n_worker=1, sizes=(64, 128),
    )
    assert n == 2
    store = _FakeEnv.stores[str(tmp_path / "LMDB_train")]
    # the exact stylegan2 byte layout (reference utils/prepare_lmdb_data.py
    # and CelebA_HQ_dataset.py:32)
    assert set(store.keys()) == {
        b"length", b"64-00000", b"64-00001", b"128-00000", b"128-00001"
    }
    assert store[b"length"] == b"2"

    ours = CelebAHQLMDB(str(tmp_path / "LMDB_train"), image_size=128)
    assert len(ours) == 2
    a0 = ours[0]
    assert a0.shape == (128, 128, 3) and a0.dtype == np.float32

    # the REFERENCE reader over the same store. Its module binds `lmdb` at
    # import time (CelebA_HQ_dataset.py:2) — if an earlier test already
    # imported it (bound to the refshims placeholder), rebind to the fake
    import refboot

    refboot.install()
    import datasets.CelebA_HQ_dataset as ref_ds

    monkeypatch.setattr(ref_ds, "lmdb", fake_lmdb)
    MultiResolutionDataset = ref_ds.MultiResolutionDataset

    import torchvision.transforms as tfs

    ref = MultiResolutionDataset(
        str(tmp_path / "LMDB_train"),
        tfs.Compose([tfs.ToTensor(),
                     tfs.Normalize((0.5, 0.5, 0.5), (0.5, 0.5, 0.5))]),
        resolution=128,
    )
    assert len(ref) == 2
    for i in range(2):
        ref_img = np.transpose(ref[i].numpy(), (1, 2, 0))
        np.testing.assert_allclose(ref_img, ours[i], atol=1e-6)


def test_reader_errors_are_loud(fake_lmdb, tmp_path):
    from asyrp_official_tpu.data.datasets import CelebAHQLMDB
    from asyrp_official_tpu.data.prepare_lmdb import prepare

    _write_images(tmp_path / "imgs")
    prepare(str(tmp_path / "db"), str(tmp_path / "imgs"), n_worker=1,
            sizes=(64,))
    # missing resolution names the key and the rebuild remedy
    r = CelebAHQLMDB(str(tmp_path / "db"), image_size=256)
    with pytest.raises(KeyError, match="256-00000"):
        r[0]
    # non-stylegan2 store (no 'length') refuses at open
    _FakeEnv.stores["empty"] = {}
    with pytest.raises(ValueError, match="length"):
        CelebAHQLMDB("empty")
