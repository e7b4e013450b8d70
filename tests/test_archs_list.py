"""ARCHS.md integrity: the generated model-zoo coverage list must match
the generator's table, and every claimed piece of test evidence must
exist (VERDICT r2 'documentation integrity' — claims may not drift from
the test suite)."""

import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent


def test_archs_md_current_and_verified():
    r = subprocess.run(
        [sys.executable, str(ROOT / "scripts" / "gen_arch_list.py"),
         "--check"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stdout + r.stderr
