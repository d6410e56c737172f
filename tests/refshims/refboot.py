"""Bootstrap for cross-executing the reference in-process.

Puts the shims and the reference on sys.path in the right order, pins the
reference's namespace packages against site-packages collisions (the
reference's `datasets/` has no __init__.py, so the installed HuggingFace
`datasets` — a regular package — would otherwise win the import), and loads
the reference's `main` under a non-colliding module name (`/root/repo/main.py`
would shadow a plain `import main`).
"""
import importlib.util
import pathlib
import sys
import types

SHIMS = pathlib.Path(__file__).resolve().parent
REFERENCE = pathlib.Path("/root/reference")


def install(reference=REFERENCE):
    reference = pathlib.Path(reference)
    for p in (str(SHIMS), str(reference)):
        if p in sys.path:
            sys.path.remove(p)
    # shims first (torchvision/clip/lmdb/natsort), then the reference, both
    # ahead of the repo root so `import main`-style names resolve to the
    # reference inside its own modules
    sys.path.insert(0, str(reference))
    sys.path.insert(0, str(SHIMS))
    # the reference's datasets/ is a namespace package; a regular package of
    # the same name later on sys.path (HF datasets) would take precedence —
    # pre-register the namespace pinned to the reference tree
    existing = sys.modules.get("datasets")
    if existing is None or not str(
        getattr(existing, "__path__", [""])[0]
    ).startswith(str(reference)):
        pkg = types.ModuleType("datasets")
        pkg.__path__ = [str(reference / "datasets")]
        sys.modules["datasets"] = pkg


def load_ref_module(name, filename=None):
    """Load a top-level reference module under the alias `ref_<name>`
    (plain `import main` would collide with the repo's own main.py)."""
    install()
    alias = f"ref_{name}"
    if alias in sys.modules:
        return sys.modules[alias]
    spec = importlib.util.spec_from_file_location(
        alias, str(REFERENCE / (filename or f"{name}.py"))
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[alias] = mod
    spec.loader.exec_module(mod)
    return mod
