"""Docs must not rot: README.md / MIGRATION.md commands and snippets stay
executable against the real surface.

The reference ships four .sh scripts whose flags we parse verbatim
(test_cli_script_compat.py); this file applies the same discipline to OUR
OWN documentation — every backticked --flag must exist in the parser, every
documented CLI command must parse, every Python snippet must compile and
its imports + module-attribute references must resolve.
"""
import ast
import re
import shlex
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
DOCS = [REPO / "README.md", REPO / "MIGRATION.md"]

FENCE_RE = re.compile(r"```([a-z]*)\n(.*?)```", re.S)


def _blocks(path, lang):
    return [m.group(2) for m in FENCE_RE.finditer(path.read_text())
            if m.group(1) == lang]


def _parser():
    from asyrp_official_tpu.cli.main import build_parser

    return build_parser()


def test_every_documented_flag_exists():
    opts = set()
    for action in _parser()._actions:
        opts.update(action.option_strings)
    for doc in DOCS:
        flags = set(re.findall(r"--[A-Za-z0-9_]+", doc.read_text()))
        missing = sorted(f for f in flags if f not in opts)
        assert not missing, f"{doc.name} documents unknown flags: {missing}"


def _documented_cli_commands():
    """Yield (doc, argv) for each CLI invocation in a bash fence."""
    for doc in DOCS:
        for block in _blocks(doc, "bash"):
            joined = block.replace("\\\n", " ")
            for line in joined.splitlines():
                line = line.strip()
                if "cli.main" not in line and not line.startswith("python main.py"):
                    continue
                tokens = shlex.split(line)
                start = max(
                    (i + 1 for i, t in enumerate(tokens)
                     if t.endswith("cli.main") or t.endswith("main.py")),
                    default=None,
                )
                if start is None:
                    continue
                argv = tokens[start:]
                # elided middles ("...") stand for flags shown elsewhere —
                # substitute the minimal required args
                if "..." in argv:
                    argv = [t for t in argv if t != "..."]
                    if "--config" not in argv:
                        argv += ["--config", "celeba.yml"]
                    if "--exp" not in argv:
                        argv += ["--exp", "./runs/doc"]
                yield doc.name, argv


def test_documented_cli_commands_parse():
    commands = list(_documented_cli_commands())
    assert len(commands) >= 4, "README lost its documented CLI commands"
    parser = _parser()
    for doc, argv in commands:
        try:
            args = parser.parse_args(argv)
        except SystemExit as e:  # argparse errors exit; surface the command
            pytest.fail(f"{doc}: documented command no longer parses: {argv} ({e})")
        assert args.config


def _import_nodes(tree):
    for node in tree.body:
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            yield node


def _attr_chain(node):
    """x.a.b -> ('x', ['a', 'b']) when the base is a plain Name."""
    parts = []
    while isinstance(node, ast.Attribute):
        parts.append(node.attr)
        node = node.value
    if isinstance(node, ast.Name):
        return node.id, list(reversed(parts))
    return None, None


def test_readme_python_snippets_resolve():
    blocks = _blocks(REPO / "README.md", "python")
    assert blocks, "README lost its python snippets"
    for block in blocks:
        tree = ast.parse(block)  # must stay valid syntax
        ns = {}
        for node in _import_nodes(tree):
            exec(compile(ast.Module([node], []), "<readme>", "exec"), ns)
        # names the snippet assigns locally — attribute lookups on those
        # can't be checked without running the (weights-requiring) snippet
        local = set()
        for node in ast.walk(tree):
            if isinstance(node, ast.Assign):
                for t in node.targets:
                    for n in ast.walk(t):
                        if isinstance(n, ast.Name):
                            local.add(n.id)
        for node in ast.walk(tree):
            if not isinstance(node, ast.Attribute):
                continue
            base, chain = _attr_chain(node)
            if base is None or base in local or base not in ns:
                continue
            obj = ns[base]
            for part in chain:
                assert hasattr(obj, part), (
                    f"README snippet references {base}.{'.'.join(chain)} "
                    f"but {type(obj).__name__} has no {part!r}"
                )
                obj = getattr(obj, part)


def test_readme_snippet_spec_methods_exist():
    # the snippet's `spec.` attribute uses (spec is a local; checked here)
    from asyrp_official_tpu.models.registry import resolve

    spec = resolve("CelebA_HQ")
    text = "\n".join(_blocks(REPO / "README.md", "python"))
    for attr in sorted(set(re.findall(r"\bspec\.([A-Za-z_0-9]+)", text))):
        assert hasattr(spec, attr), f"README uses spec.{attr}"


def test_serve_edit_example_runs(tmp_path, monkeypatch):
    """The documented serving recipe (examples/serve_edit.py) must stay
    executable, not just present: run its demo in-process at --tiny size
    and check the edited outputs land."""
    import importlib.util

    import numpy as np
    from PIL import Image

    path = REPO / "examples" / "serve_edit.py"
    spec = importlib.util.spec_from_file_location("serve_edit_demo", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = tmp_path / "out"
    monkeypatch.setattr("sys.argv", [
        "serve_edit.py", "--demo", "--tiny", "--batch", "2", "--n_step", "4",
        "--out", str(out),
    ])
    mod.main()
    imgs = sorted(out.glob("edited_*.png"))
    assert len(imgs) == 2, list(out.iterdir())
    a = np.asarray(Image.open(imgs[0]))
    assert a.dtype == np.uint8 and a.shape == (32, 32, 3)


def test_migration_api_table_names_exist():
    from asyrp_official_tpu.runner import AsyrpRunner

    for method in ("run_training", "run_test", "run_lpips", "get_pairs",
                   "set_interval", "save_grid"):
        assert hasattr(AsyrpRunner, method), method
    # artifact-table claims
    assert (REPO / "main.py").exists()  # the `python main.py` shim
    assert (REPO / "examples" / "serve_edit.py").exists()
    tok_src = (REPO / "asyrp_official_tpu" / "losses" / "tokenizer.py").read_text()
    assert "ASYRP_TPU_CLIP_BPE" in tok_src  # env var documented in MIGRATION
