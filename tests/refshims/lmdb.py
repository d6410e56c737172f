"""Import-time placeholder: datasets/CelebA_HQ_dataset.py:2 (and the dialog/
with_attr variants) `import lmdb` unconditionally even when the CUSTOM
dataset path is selected. Any runtime use raises."""


def open(*args, **kwargs):
    raise RuntimeError(
        "refshim lmdb: the real lmdb package is not installed in this "
        "image — the cross-execution tests only exercise the CUSTOM "
        "dataset path, which never opens an LMDB"
    )
