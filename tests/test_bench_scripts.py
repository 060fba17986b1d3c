"""Static import-contract checks for the bench/CLI harness scripts.

VERDICT r4 #3 lesson: ``scripts/bench_train_sweep.py`` shipped with
``from qasr_ijcnlp_tpu.models.dims import base_dims`` — a symbol that never
existed — and crashed on first on-chip use; nothing in the suite imported
the script, so a green run said nothing about it.  These tests walk every
``scripts/*.py`` plus the repo-root harnesses (``bench.py``,
``__graft_entry__.py``) with the AST and verify that every
``qasr_ijcnlp_tpu`` import — module-level AND function-level — names a real
module and real attributes, without executing the scripts (most need a TPU
or minutes of wall clock).
"""

import ast
import importlib
import pathlib

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
SCRIPTS = sorted((REPO / "scripts").glob("*.py")) + [
    REPO / "bench.py",
    REPO / "__graft_entry__.py",
]


def _package_imports(path: pathlib.Path):
    """Yield (lineno, module, names) for every qasr_ijcnlp_tpu import in
    the file, at any nesting depth."""
    tree = ast.parse(path.read_text(), filename=str(path))
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom):
            if node.level == 0 and node.module and node.module.startswith(
                "qasr_ijcnlp_tpu"
            ):
                yield node.lineno, node.module, [a.name for a in node.names]
        elif isinstance(node, ast.Import):
            for a in node.names:
                if a.name.startswith("qasr_ijcnlp_tpu"):
                    yield node.lineno, a.name, []


def test_scripts_enumerated():
    assert len(SCRIPTS) > 20  # the bench harness family + root entries


@pytest.mark.parametrize("path", SCRIPTS, ids=lambda p: p.name)
def test_script_parses(path):
    ast.parse(path.read_text(), filename=str(path))


@pytest.mark.parametrize("path", SCRIPTS, ids=lambda p: p.name)
def test_script_package_imports_resolve(path):
    problems = []
    for lineno, module, names in _package_imports(path):
        try:
            mod = importlib.import_module(module)
        except Exception as e:  # missing module is exactly the bug class
            problems.append(f"{path.name}:{lineno} import {module}: {e!r}")
            continue
        for name in names:
            if name == "*" or hasattr(mod, name):
                continue
            try:  # ``from pkg import submodule`` is also legal
                importlib.import_module(f"{module}.{name}")
            except ImportError:
                problems.append(
                    f"{path.name}:{lineno} `from {module} import {name}` "
                    "names a symbol that does not exist"
                )
    assert not problems, "\n".join(problems)
