"""torchvision shim (see refshims/README.md) — pinned to the semantics of
torchvision==0.10.0, the version in the reference's requirements.txt."""
from . import datasets, models, transforms, utils  # noqa: F401

__version__ = "0.10.0+refshim"
