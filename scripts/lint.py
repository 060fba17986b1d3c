#!/usr/bin/env python
"""Project lint gate (reference parity: whisper/.flake8 + pre-commit).

Uses ruff (config in pyproject.toml [tool.ruff]) when installed; falls back
to flake8; and in hermetic images with neither, degrades to a full
``compileall`` syntax pass so the gate always runs *something*.
"""
import shutil
import subprocess
import sys

ROOT = __file__.rsplit("/", 2)[0]
TARGETS = ["qasr_ijcnlp_tpu", "tests", "scripts", "bench.py", "__graft_entry__.py"]


def main() -> int:
    if shutil.which("ruff"):
        return subprocess.call(["ruff", "check", *TARGETS], cwd=ROOT)
    try:
        import flake8  # noqa: F401

        return subprocess.call(
            [sys.executable, "-m", "flake8", "--max-line-length=100",
             "--extend-ignore=E203,E501,E731,E741,W605", *TARGETS], cwd=ROOT)
    except ImportError:
        pass
    print("lint: no ruff/flake8 in this environment; running compile-only pass")
    rc = subprocess.call(
        [sys.executable, "-m", "compileall", "-q", *TARGETS], cwd=ROOT)
    return rc


if __name__ == "__main__":
    sys.exit(main())
