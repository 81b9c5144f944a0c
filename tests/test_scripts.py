"""Script-tier smoke tests: everything under scripts/ must at least compile;
the pure-CPU scripts run end to end."""

import py_compile
import subprocess
import sys
from pathlib import Path

import pytest

SCRIPTS = sorted((Path(__file__).resolve().parent.parent / "scripts").glob("*.py"))


@pytest.mark.parametrize("script", SCRIPTS, ids=lambda p: p.name)
def test_script_compiles(script):
    py_compile.compile(str(script), doraise=True)


def test_verify_idf_math_runs():
    r = subprocess.run([sys.executable, "scripts/verify_idf_math.py"],
                       capture_output=True, text=True,
                       cwd=Path(__file__).resolve().parent.parent)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "all IDF math checks passed" in r.stdout


def test_collect_term_data_runs(tmp_path):
    out = tmp_path / "terms.jsonl"
    r = subprocess.run([sys.executable, "scripts/collect_term_data.py",
                        "--output", str(out)],
                       capture_output=True, text=True,
                       cwd=Path(__file__).resolve().parent.parent)
    assert r.returncode == 0, r.stderr
    assert out.exists() and len(out.read_text().splitlines()) >= 20
