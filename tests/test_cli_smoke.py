"""Smoke tests: every CLI script must at least parse/compile and respond to
--help without touching a checkpoint (ADVICE r1: a stray indent shipped a
serving CLI that could not parse at all)."""

import os
import pathlib
import py_compile
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
SCRIPTS = sorted((REPO / "scripts").glob("*.py"))
TOOLS = sorted((REPO / "tools").glob("*.py"))


@pytest.mark.parametrize("path", SCRIPTS + TOOLS + [REPO / "__graft_entry__.py",
                                                    REPO / "bench.py"],
                         ids=lambda p: str(p.relative_to(REPO)))
def test_script_compiles(path):
    py_compile.compile(str(path), doraise=True)


@pytest.mark.parametrize("path", SCRIPTS, ids=lambda p: p.name)
def test_script_help(path):
    """argparse --help exercises the import-free prologue of each CLI."""
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    out = subprocess.run([sys.executable, str(path), "--help"],
                         capture_output=True, text=True, timeout=120, env=env)
    assert out.returncode == 0, out.stderr
    assert "usage" in out.stdout.lower()
