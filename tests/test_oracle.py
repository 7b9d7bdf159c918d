"""Replicates the driver's DuckDB-oracle gate at sf0.001 (fast).

Run scripts/oracle_check.py directly for per-query iteration or sf0.01.
"""

import pytest

# slow (~440 s): the full 190-query local oracle sweep. The driver re-runs its own oracle gate every round and scripts/oracle_check.py covers targeted sweeps at sf0.001/sf0.01; this module is the redundant in-suite copy.
pytestmark = pytest.mark.slow

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_all_queries_match_duckdb_oracle():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "oracle_check.py")],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    out = proc.stdout.replace("\r", "\n")
    assert proc.returncode == 0, f"oracle check failed:\n{out}\n{proc.stderr[-2000:]}"
    assert "[FAIL]" not in out


def test_no_oracle_outputs_hugeint_or_arrays():
    """Static driver-contract gate on every oracle's OUTPUT schema.

    The driver canonicalizes both result sets through pandas; DuckDB
    HUGEINT (what uncast ``sum(integer)`` returns) lands as float64
    there while Spark's long lands as int64, so the value hash differs
    on dtype alone even when every value matches — this turned 8 driver
    rows red in round 5. Array-typed output columns crash the driver's
    ``sort_values`` outright (the 9th red row). ``DESCRIBE SELECT``
    exposes both without executing the query.
    """
    import duckdb

    sys.path.insert(0, REPO)
    import __spark_entry__ as entrymod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_TINY", "/root/testdata/sf0.001")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders "
        "lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    bad = []
    for name, sql in entrymod.oracle_sql().items():
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
        for col, typ, *_ in desc:
            t_up = typ.upper()
            if t_up == "HUGEINT" or t_up.startswith("DECIMAL(38"):
                bad.append(f"{name}.{col}: {typ} (uncast integer sum?)")
            if t_up.endswith("[]") or t_up.startswith(("STRUCT", "MAP", "LIST")):
                bad.append(f"{name}.{col}: {typ} (driver can't canonicalize)")
    assert not bad, "oracle output-type violations:\n" + "\n".join(bad)
