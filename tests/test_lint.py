"""Lint gate as part of the suite (≙ reference format.sh CI gate run by
contributors before commit, format.sh:26-57)."""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_lint_gate_clean():
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "lint.py")],
        cwd=REPO, capture_output=True, text=True)
    assert proc.returncode == 0, proc.stdout + proc.stderr


def test_lint_catches_violations(tmp_path):
    bad = tmp_path / "bad.py"
    bad.write_text(
        "import os\n"          # unused import
        "x = 1   \n"           # trailing whitespace
        "y = '" + "a" * 120 + "'\n")  # long line
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "lint.py"), str(bad)],
        cwd=REPO, capture_output=True, text=True)
    assert proc.returncode == 1
    assert "F401" in proc.stdout
    assert "W291" in proc.stdout
    assert "E501" in proc.stdout
