"""Import-time placeholder for datasets/CelebA_HQ_dataset_with_attr.py:8.
That dataset is outside the cross-execution paths; raise on use rather than
approximate natural-sort order."""


def natsorted(*args, **kwargs):
    raise RuntimeError(
        "refshim natsort: not installed — the cross-execution tests never "
        "construct the with-attr CelebA dataset"
    )
