"""The repo passes its own static checks (scripts/static_check.py — the
stdlib stand-in for the reference's pre-commit suite, SURVEY.md §4 row 4)."""

import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]


def test_static_checks_pass():
    proc = subprocess.run(
        [sys.executable, str(ROOT / "scripts" / "static_check.py")],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, f"static checks failed:\n{proc.stdout}"
