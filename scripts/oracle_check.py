"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet dir, then compares row count, column names
and exact values (column-name-sorted, row-sorted) — the same contract
the driver hashes.

Usage: python scripts/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from mack_spark.session import get_session

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except ImportError:
        pass
    return v


def compare(name: str, spark, con, sf_dir: str, sql: str | None, fn) -> str:
    sdf = fn(spark, sf_dir)
    scols = sorted(sdf.columns)
    srows = sorted(
        (tuple(_norm(r[c]) for c in scols) for r in sdf.collect()), key=repr
    )
    if sql is None:
        return f"ROWS_ONLY ({len(srows)} rows)"
    ddf = con.execute(sql)
    dcols_raw = [d[0] for d in ddf.description]
    drows_raw = ddf.fetchall()
    dcols_order = sorted(range(len(dcols_raw)), key=lambda i: dcols_raw[i])
    dcols = [dcols_raw[i] for i in dcols_order]
    drows = sorted(
        (tuple(_norm(r[i]) for i in dcols_order) for r in drows_raw), key=repr
    )
    if scols != dcols:
        return f"SCHEMA MISMATCH spark={scols} duck={dcols}"
    if len(srows) != len(drows):
        return f"ROWCOUNT MISMATCH spark={len(srows)} duck={len(drows)}"
    if srows != drows:
        for i, (a, b) in enumerate(zip(srows, drows)):
            if a != b:
                return f"VALUE MISMATCH at sorted-row {i}:\n  spark={a}\n  duck ={b}"
    return f"OK ({len(srows)} rows)"


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
    only = set(args[1:]) if args and os.path.isdir(args[0]) else set(args)
    spark = get_session("oracle-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            verdict = compare(name, spark, con, sf_dir, oracles.get(name), fn)
        except Exception as e:  # noqa: BLE001
            verdict = f"ERROR {type(e).__name__}: {str(e)[:300]}"
        status = "PASS" if verdict.startswith(("OK", "ROWS_ONLY")) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"[{status}] {name}: {verdict}", flush=True)
    extra_oracles = set(oracles) - set(qs)
    if extra_oracles:
        failures += 1
        print(f"[FAIL] oracle_sql keys without queries: {extra_oracles}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
