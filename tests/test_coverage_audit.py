"""COVERAGE.md stays in sync with the query registry (doc-rot guard)."""


def test_coverage_audit_passes():
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "scripts/coverage_audit.py"],
        capture_output=True,
        text=True,
    )
    assert r.returncode == 0, r.stdout + r.stderr
