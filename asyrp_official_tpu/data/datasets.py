"""Datasets — torch-free (PIL + numpy) readers producing NHWC float32
images in [-1, 1], covering every reference dataset family
(datasets/data_utils.py:36-87 and the per-dataset modules):

  * ImageFolderDataset — CustomImageDataset semantics (dir listing order,
    optional tail-N test split, (S,S) resize; datasets/data_utils.py:14-34);
    also serves MetFACE/FFHQ (test_nums=500 split, :57-62);
  * AFHQDataset — {root}/{mode}/{class}/*.png glob
    (datasets/AFHQ_dataset.py:7-25);
  * ImageNetDataset — per-class glob + BOX/BICUBIC center or random crop
    (datasets/IMAGENET_dataset.py:10-111);
  * CelebAHQLMDB / LSUNLMDB — stylegan2-layout LMDB readers (gated on the
    `lmdb` package; datasets/CelebA_HQ_dataset.py:8-60,
    datasets/LSUN_dataset.py);
  * CelebADialogDataset — paired images by attribute intensity from
    train/val_attr_list.txt (datasets/CelebA_HQ_dataset_dialog.py:10-50);
  * CelebAAttrDataset — 40-attribute annotation reader
    (datasets/CelebA_HQ_dataset_with_attr.py).

`Loader` replaces the torch DataLoader (bs_train / test bs=1, drop_last,
shuffle; datasets/data_utils.py:67-87).
"""
from __future__ import annotations

import json
import math
import os
import random
from glob import glob
from io import BytesIO
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

__all__ = [
    "ImageFolderDataset",
    "AFHQDataset",
    "ImageNetDataset",
    "CelebAHQLMDB",
    "LSUNLMDB",
    "CelebADialogDataset",
    "CelebAAttrDataset",
    "Loader",
    "get_dataset",
    "imagenet_classes",
]

_ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets")


def imagenet_classes() -> Dict[str, Tuple[str, str]]:
    with open(os.path.join(_ASSETS, "imagenet_classes.json")) as f:
        return {k: tuple(v) for k, v in json.load(f).items()}


def _to_pm1(img: Image.Image) -> np.ndarray:
    arr = np.asarray(img.convert("RGB"), np.float32) / 127.5 - 1.0
    return arr  # HWC


class ImageFolderDataset:
    def __init__(
        self,
        img_dir: str,
        image_size: int = 256,
        test_nums: Optional[int] = None,
        train: bool = True,
        resample=Image.BILINEAR,
    ):
        self.img_dir = img_dir
        files = os.listdir(img_dir)
        if test_nums is not None:
            files = files[:-test_nums] if train else files[-test_nums:]
        self.files = files
        self.image_size = image_size
        self.resample = resample

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx) -> np.ndarray:
        img = Image.open(os.path.join(self.img_dir, self.files[idx]))
        # torchvision Resize((S,S)) uses bilinear — matched default
        img = img.convert("RGB").resize(
            (self.image_size, self.image_size), self.resample
        )
        return _to_pm1(img)


class EditReconPairDataset:
    """Semantic-consistency pair reader (the reference's orphan
    datasets/sc_loss_dataset.py:10-39): `{path}/edit_image/{name}` paired
    with `{path}/recon_image/{name}`, both resized; returns
    (edit, recon) NHWC float arrays in [-1, 1]. The reference calls
    `img.resize((res, res))` with PIL's default filter — BICUBIC — so
    that is the default here too (unlike the torchvision-Resize-based
    datasets above, which default to bilinear)."""

    def __init__(self, path: str, image_size: int = 256,
                 resample=Image.BICUBIC):
        self.edit_dir = os.path.join(path, "edit_image")
        self.recon_dir = os.path.join(path, "recon_image")
        self.names = sorted(os.listdir(self.edit_dir))
        self.image_size = image_size
        self.resample = resample

    def __len__(self):
        return len(self.names)

    def __getitem__(self, idx):
        name = self.names[idx]
        out = []
        for d in (self.edit_dir, self.recon_dir):
            img = Image.open(os.path.join(d, name)).convert("RGB")
            img = img.resize((self.image_size, self.image_size), self.resample)
            out.append(_to_pm1(img))
        return tuple(out)


class AFHQDataset:
    def __init__(self, root: str, mode: str = "train", animal_class: str = "dog",
                 image_size: int = 256):
        self.paths = glob(os.path.join(root, mode, animal_class, "*.png"))
        self.image_size = image_size

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx) -> np.ndarray:
        img = Image.open(self.paths[idx]).resize((self.image_size, self.image_size))
        return _to_pm1(img)


def center_crop_arr(pil_image: Image.Image, image_size: int) -> np.ndarray:
    """BOX-downsample by powers of two then BICUBIC, center crop
    (datasets/IMAGENET_dataset.py:69-86 — the ADM preprocessing)."""
    while min(*pil_image.size) >= 2 * image_size:
        pil_image = pil_image.resize(
            tuple(x // 2 for x in pil_image.size), resample=Image.BOX
        )
    scale = image_size / min(*pil_image.size)
    pil_image = pil_image.resize(
        tuple(round(x * scale) for x in pil_image.size), resample=Image.BICUBIC
    )
    arr = np.array(pil_image)
    cy = (arr.shape[0] - image_size) // 2
    cx = (arr.shape[1] - image_size) // 2
    return arr[cy : cy + image_size, cx : cx + image_size]


def random_crop_arr(
    pil_image: Image.Image, image_size: int, min_crop_frac=0.8, max_crop_frac=1.0
) -> np.ndarray:
    min_dim = math.ceil(image_size / max_crop_frac)
    max_dim = math.ceil(image_size / min_crop_frac)
    dim = random.randrange(min_dim, max_dim + 1)
    while min(*pil_image.size) >= 2 * dim:
        pil_image = pil_image.resize(
            tuple(x // 2 for x in pil_image.size), resample=Image.BOX
        )
    scale = dim / min(*pil_image.size)
    pil_image = pil_image.resize(
        tuple(round(x * scale) for x in pil_image.size), resample=Image.BICUBIC
    )
    arr = np.array(pil_image)
    cy = random.randrange(arr.shape[0] - image_size + 1)
    cx = random.randrange(arr.shape[1] - image_size + 1)
    return arr[cy : cy + image_size, cx : cx + image_size]


class ImageNetDataset:
    def __init__(
        self,
        root: str,
        mode: str = "val",
        class_num: Optional[int] = None,
        image_size: int = 256,
        random_crop: bool = True,
        random_flip: bool = False,
    ):
        if class_num is None:
            raise ValueError("class_num is required (reference exits without it)")
        wnid = imagenet_classes()[str(class_num)][0]
        pat = os.path.join(
            root, mode, wnid, wnid, "*.jpeg" if mode == "train" else "*.JPEG"
        )
        self.paths = sorted(glob(pat))
        self.image_size = image_size
        self.random_crop = random_crop
        self.random_flip = random_flip

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx) -> np.ndarray:
        img = Image.open(self.paths[idx])
        img.load()
        img = img.convert("RGB")
        arr = (
            random_crop_arr(img, self.image_size)
            if self.random_crop
            else center_crop_arr(img, self.image_size)
        )
        if self.random_flip and random.random() < 0.5:
            arr = arr[:, ::-1]
        return arr.astype(np.float32) / 127.5 - 1.0


class CelebAHQLMDB:
    """stylegan2 multi-resolution LMDB (keys '{res}-{idx:05d}', 'length')."""

    def __init__(self, path: str, image_size: int = 256):
        try:
            import lmdb
        except ImportError as e:
            raise ImportError(
                "CelebA-HQ LMDB reading requires the `lmdb` package"
            ) from e
        self.env = lmdb.open(
            path, max_readers=32, readonly=True, lock=False,
            readahead=False, meminit=False,
        )
        self.path = path
        with self.env.begin(write=False) as txn:
            raw = txn.get(b"length")
        if raw is None:
            raise ValueError(
                f"{path}: no 'length' key — not a stylegan2-layout LMDB "
                "(build one with data/prepare_lmdb.py)"
            )
        self.length = int(raw.decode())
        self.image_size = image_size

    def close(self):
        if self.env is not None:
            self.env.close()
            self.env = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __len__(self):
        return self.length

    def __getitem__(self, idx) -> np.ndarray:
        with self.env.begin(write=False) as txn:
            key = f"{self.image_size}-{str(idx).zfill(5)}".encode()
            img_bytes = txn.get(key)
        if img_bytes is None:
            raise KeyError(
                f"{self.path}: no image at resolution {self.image_size} "
                f"(key {key.decode()!r}) — the LMDB was built without that "
                "size (prepare_lmdb.py --size)"
            )
        return _to_pm1(Image.open(BytesIO(img_bytes)))


class LSUNLMDB:
    """LSUN LMDB (webp blobs keyed by hash; vendored-torchvision layout,
    datasets/LSUN_dataset.py). Preprocessing matches the reference's
    torchvision pipeline: Resize(short side -> S, BILINEAR) then
    CenterCrop(S) (LSUN_dataset.py:277-281)."""

    def __init__(self, path: str, image_size: int = 256):
        try:
            import lmdb
        except ImportError as e:
            raise ImportError("LSUN reading requires the `lmdb` package") from e
        self.env = lmdb.open(
            path, max_readers=1, readonly=True, lock=False,
            readahead=False, meminit=False,
        )
        with self.env.begin(write=False) as txn:
            self.length = txn.stat()["entries"]
            self.keys = [k for k in txn.cursor().iternext(keys=True, values=False)]
        self.image_size = image_size

    def close(self):
        if self.env is not None:
            self.env.close()
            self.env = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __len__(self):
        return self.length

    def __getitem__(self, idx) -> np.ndarray:
        with self.env.begin(write=False) as txn:
            img_bytes = txn.get(self.keys[idx])
        img = Image.open(BytesIO(img_bytes)).convert("RGB")
        w, h = img.size
        size = self.image_size
        scale = size / min(w, h)
        img = img.resize(
            (round(w * scale), round(h * scale)), Image.BILINEAR
        )
        w, h = img.size
        left, top = (w - size) // 2, (h - size) // 2
        return _to_pm1(img.crop((left, top, left + size, top + size)))


def _read_attr_list(path: str, columns: Sequence[str]):
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= len(columns):
                rows.append(
                    {c: (parts[i] if i == 0 else int(parts[i])) for i, c in enumerate(columns)}
                )
    return rows


DIALOG_COLUMNS = ("file_name", "Bangs", "Eyeglasses", "No_Beard", "Smiling", "Young")


class CelebADialogDataset:
    """Pairs (attr==0, attr==5) images for one attribute (the reference
    hardcodes guid='Young', datasets/CelebA_HQ_dataset_dialog.py:12).
    `attr_list_path` defaults to `{root}/train_attr_list.txt` — copy the
    annotation file next to the dataset (the reference vendors it in its
    repo)."""

    def __init__(
        self,
        root: str,
        train: bool = True,
        guid: str = "Young",
        image_size: int = 256,
        attr_list_path: Optional[str] = None,
    ):
        name = "train_attr_list.txt" if train else "val_attr_list.txt"
        attr_list_path = attr_list_path or os.path.join(root, name)
        rows = _read_attr_list(attr_list_path, DIALOG_COLUMNS)
        zeros = [r for r in rows if r[guid] == 0]
        fives = [r for r in rows if r[guid] == 5]
        self.min_num = min(len(zeros), len(fives))
        self.zeros = zeros[: self.min_num]
        self.fives = fives[: self.min_num]
        self.root = root
        self.image_size = image_size

    def __len__(self):
        return self.min_num

    def _load(self, fname: str) -> np.ndarray:
        img = Image.open(os.path.join(self.root, fname))
        # torchvision Resize((S,S)) default filter — BILINEAR
        # (CelebA_HQ_dataset_dialog.py:56-58)
        return _to_pm1(img.convert("RGB").resize(
            (self.image_size, self.image_size), Image.BILINEAR
        ))

    def __getitem__(self, idx):
        return self._load(self.zeros[idx]["file_name"]), self._load(
            self.fives[idx]["file_name"]
        )


class CelebAAttrDataset:
    """CelebAMask-HQ 40-attribute annotation reader
    (datasets/CelebA_HQ_dataset_with_attr.py). Returns (image, attrs[40])."""

    def __init__(self, root: str, anno_path: Optional[str] = None, image_size: int = 256):
        anno_path = anno_path or os.path.join(root, "CelebAMask-HQ-attribute-anno.txt")
        with open(anno_path) as f:
            lines = f.read().strip().split("\n")
        self.attr_names = lines[1].split()
        self.rows = []
        for line in lines[2:]:
            parts = line.split()
            self.rows.append((parts[0], np.array([int(x) for x in parts[1:]], np.int32)))
        self.root = root
        self.image_size = image_size

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, idx):
        fname, attrs = self.rows[idx]
        img = Image.open(os.path.join(self.root, fname))
        return (
            _to_pm1(img.convert("RGB").resize(
                (self.image_size, self.image_size), Image.BILINEAR
            )),  # torchvision Resize default (CelebA_HQ_dataset_with_attr.py:147)
            attrs,
        )


class Loader:
    """Batched iterator over a dataset yielding [B, H, W, C] numpy arrays —
    the DataLoader stand-in (drop_last semantics,
    datasets/data_utils.py:67-87)."""

    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
                 seed: int = 0, drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        order = list(range(len(self.dataset)))
        if self.shuffle:
            # fresh permutation per pass — torch DataLoader(shuffle=True)
            # reshuffles each epoch; a fixed seed would also starve the
            # drop_last tail of the SAME samples forever. Still
            # deterministic given (seed, epoch).
            random.Random(self.seed * 100003 + self._epoch).shuffle(order)
            self._epoch += 1
        batch = []
        for i in order:
            batch.append(self.dataset[i])
            if len(batch) == self.batch_size:
                yield _stack(batch)
                batch = []
        if batch and not self.drop_last:
            yield _stack(batch)


def _stack(batch):
    if isinstance(batch[0], tuple):
        return tuple(np.stack([b[j] for b in batch]) for j in range(len(batch[0])))
    return np.stack(batch)


def get_dataset(
    dataset_type: str,
    dataset_paths: Dict[str, str],
    *,
    category: str = "",
    image_size: int = 256,
    target_class_num: Optional[int] = None,
):
    """Dispatcher mirroring datasets/data_utils.py:36-64. Returns
    (train_dataset, test_dataset)."""
    if category == "CUSTOM":
        return (
            ImageFolderDataset(dataset_paths["custom_train"], image_size),
            ImageFolderDataset(dataset_paths["custom_test"], image_size),
        )
    if dataset_type == "AFHQ":
        root = dataset_paths["AFHQ"]
        return (
            AFHQDataset(root, "train", "dog", image_size),
            AFHQDataset(root, "test", "dog", image_size),
        )
    if dataset_type == "LSUN":
        root = dataset_paths["LSUN"]
        return (
            LSUNLMDB(os.path.join(root, f"{category}_train_lmdb"), image_size),
            LSUNLMDB(os.path.join(root, f"{category}_val_lmdb"), image_size),
        )
    if dataset_type == "CelebA_HQ":
        root = dataset_paths["CelebA_HQ"]
        return (
            CelebAHQLMDB(os.path.join(root, "LMDB_train"), image_size),
            CelebAHQLMDB(os.path.join(root, "LMDB_test"), image_size),
        )
    if dataset_type == "CelebA_HQ_Dialog":
        root = dataset_paths["CelebA_HQ_Dialog"]
        # the reference returns None for the test split (its construction
        # is commented out, CelebA_HQ_dataset_dialog.py:68-69) — build it
        # when the val annotation file is present, since this dataset
        # supports train=False and a None split crashes precompute
        val_path = os.path.join(root, "val_attr_list.txt")
        return (
            CelebADialogDataset(root, train=True, image_size=image_size),
            CelebADialogDataset(root, train=False, image_size=image_size)
            if os.path.exists(val_path)
            else None,
        )
    if dataset_type == "IMAGENET":
        root = dataset_paths["IMAGENET"]
        return (
            ImageNetDataset(root, "train", target_class_num, image_size),
            ImageNetDataset(root, "val", target_class_num, image_size),
        )
    if dataset_type == "MetFACE":
        d = os.path.join(dataset_paths["MetFACE"], "images")
        return (
            ImageFolderDataset(d, image_size, test_nums=500, train=True),
            ImageFolderDataset(d, image_size, test_nums=500, train=False),
        )
    if dataset_type == "FFHQ":
        d = dataset_paths["FFHQ"]
        return (
            ImageFolderDataset(d, image_size, test_nums=500, train=True),
            ImageFolderDataset(d, image_size, test_nums=500, train=False),
        )
    raise ValueError(f"unknown dataset type {dataset_type}")
