"""Replicates the driver's DuckDB-oracle gate at sf0.001 (fast).

Run scripts/oracle_check.py directly for per-query iteration or sf0.01.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_all_queries_match_duckdb_oracle():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "oracle_check.py")],
        capture_output=True,
        text=True,
        timeout=1200,
    )
    out = proc.stdout.replace("\r", "\n")
    assert proc.returncode == 0, f"oracle check failed:\n{out}\n{proc.stderr[-2000:]}"
    assert "[FAIL]" not in out
