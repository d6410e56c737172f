"""Native C++ image loader: build, decode parity vs PIL, fallback behavior."""
import os

import numpy as np
import pytest
from PIL import Image

from asyrp_official_tpu.data import native_loader as nl


@pytest.fixture(scope="module")
def img_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("nimgs")
    rng = np.random.RandomState(0)
    paths = []
    for i, ext in enumerate(["png", "jpg", "png", "jpg"]):
        arr = (rng.rand(100, 80, 3) * 255).astype(np.uint8)
        p = str(d / f"img_{i}.{ext}")
        Image.fromarray(arr).save(p, quality=95)
        paths.append(p)
    return paths


def test_native_lib_builds():
    lib = nl.get_lib()
    if lib is None:
        pytest.skip("native toolchain/libs unavailable — PIL fallback covers")
    assert hasattr(lib, "asyrp_decode_resize_batch")


def test_batch_decode_shapes_and_range(img_files):
    out = nl.decode_resize_batch(img_files, 64)
    assert out.shape == (4, 64, 64, 3)
    assert out.dtype == np.float32
    assert -1.0 <= out.min() and out.max() <= 1.0


def test_native_close_to_pil(img_files):
    if nl.get_lib() is None:
        pytest.skip("native loader unavailable")
    native = nl.decode_resize_batch(img_files[:1], 64)
    img = Image.open(img_files[0]).convert("RGB").resize((64, 64), Image.BILINEAR)
    pil = np.asarray(img, np.float32)[None] / 127.5 - 1.0
    # same bilinear half-pixel convention → near-identical (8-bit rounding)
    assert np.abs(native - pil).mean() < 0.02


def test_bad_file_falls_back(img_files, tmp_path, monkeypatch):
    if nl.get_lib() is None:
        pytest.skip("native loader unavailable")
    bad = str(tmp_path / "corrupt.jpg")
    with open(bad, "wb") as f:
        f.write(b"\xff\xd8garbage")
    # the PIL repair must be invoked for EXACTLY the failed file and its
    # result land in that row; good rows keep their native result
    called = []

    def stub(p, s):
        called.append(p)
        return np.full((s, s, 3), 0.5, np.float32)

    monkeypatch.setattr(nl, "_pil_decode_one", stub)
    out = nl.decode_resize_batch([bad, img_files[0]], 32)
    assert called == [bad]
    assert np.all(out[0] == 0.5) and not np.all(out[1] == 0.5)


def test_rgba_png_matches_pil_convention(tmp_path):
    """Transparent PNGs: native must DROP alpha like PIL convert('RGB'),
    not composite it onto black."""
    if nl.get_lib() is None:
        pytest.skip("native loader unavailable")
    rng = np.random.RandomState(3)
    rgba = (rng.rand(40, 40, 4) * 255).astype(np.uint8)
    rgba[..., 3] = 0  # fully transparent — compositing would zero the RGB
    p = str(tmp_path / "t.png")
    Image.fromarray(rgba, "RGBA").save(p)
    native = nl.decode_resize_batch([p], 40)[0]
    pil = np.asarray(
        Image.open(p).convert("RGB"), np.float32
    ) / 127.5 - 1.0
    np.testing.assert_allclose(native, pil, atol=1e-5)


def test_multiple_bad_files_all_repaired(img_files, tmp_path, monkeypatch):
    """Per-item status: several undecodable files in one batch are each
    repaired individually (first failure must not mask the rest), and
    good rows keep their native result."""
    if nl.get_lib() is None:
        pytest.skip("native loader unavailable")
    good = img_files[0]
    bad1 = str(tmp_path / "b1.jpg")
    bad2 = str(tmp_path / "b2.jpg")
    for b in (bad1, bad2):
        with open(b, "wb") as f:
            f.write(b"\xff\xd8junk")
    called = []

    def stub(p, s):
        called.append(p)
        return np.full((s, s, 3), 0.5, np.float32)

    monkeypatch.setattr(nl, "_pil_decode_one", stub)
    out = nl.decode_resize_batch([bad1, good, bad2], 32)
    assert sorted(called) == sorted([bad1, bad2])
    assert np.all(out[0] == 0.5) and np.all(out[2] == 0.5)
    assert not np.all(out[1] == 0.5)
    # and when PIL also cannot decode, the error propagates
    monkeypatch.undo()
    with pytest.raises(Exception):
        nl.decode_resize_batch([bad1], 32)


def test_dataset_wrapper(img_files):
    d = os.path.dirname(img_files[0])
    ds = nl.NativeImageFolderDataset(d, image_size=32)
    assert len(ds) == 4
    batch = ds.load_batch([0, 1, 2])
    assert batch.shape == (3, 32, 32, 3)
