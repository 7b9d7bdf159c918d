"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet dir, then compares through *pandas* —
column names, row counts, dtype kinds, and exact cell values — the way
the driver canonicalizes before hashing.

The r5 judge found the old ``fetchall()``-based compare blind to two
driver failure modes: DuckDB ``sum(integer)`` returns HUGEINT which
pandas renders as float64 while Spark emits int64 (hash differs on
dtype alone), and array-typed columns crash the driver's
``sort_values``. Both now fail loudly here: dtype *kinds* are compared
per column (int vs float is a FAIL even when values match), and the
row sort runs on the pandas frame so list cells raise exactly like the
driver.

Usage: python scripts/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entrymod
from mack_spark.session import get_session

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon_pdf(pdf: "pd.DataFrame") -> "pd.DataFrame":
    """Column-name-sort + row-sort like the driver. List/array cells make
    ``sort_values`` raise, replicating the driver's canonicalizer crash."""
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(
            by=list(pdf.columns), kind="mergesort", na_position="last"
        ).reset_index(drop=True)
    return pdf


def _col_kind(series: "pd.Series") -> str:
    """Dtype *kind* for hash-compatibility: 'i' int, 'f' float, 'b' bool,
    'M' date/time, 'O' string/other, 'n' all-null (matches anything)."""
    k = series.dtype.kind
    if k in ("i", "u"):
        return "i"
    if k in ("f", "b", "M"):
        return "M" if k == "M" else k
    # object column: classify by first non-null cell
    for v in series:
        if v is None or (isinstance(v, float) and math.isnan(v)):
            continue
        if isinstance(v, bool):
            return "b"
        if isinstance(v, (dt.datetime, dt.date, pd.Timestamp)):
            return "M"
        if isinstance(v, (int, np.integer)):
            return "i"
        if isinstance(v, (float, np.floating, decimal.Decimal)):
            return "f"
        if isinstance(v, (list, tuple, np.ndarray)):
            raise TypeError(
                "array-typed cell — the driver canonicalizer crashes on these"
            )
        return "O"
    return "n"


def _cell(v):
    """Normalize one pandas cell to a plain comparable Python value."""
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, (bool,)):
        return v
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "NaN" if math.isnan(f) else f
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None).isoformat()
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        # dates compare against midnight timestamps (both engines cast
        # to DATE in the SQL, so this only conflates equal values)
        return dt.datetime(v.year, v.month, v.day).isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        raise TypeError(
            "array-typed cell — the driver canonicalizer crashes on these"
        )
    return v


def compare(name: str, spark, con, sf_dir: str, sql: str | None, fn) -> str:
    sdf = fn(spark, sf_dir)
    spdf = _canon_pdf(sdf.toPandas())
    if sql is None:
        return f"ROWS_ONLY ({len(spdf)} rows)"
    dpdf = _canon_pdf(con.execute(sql).df())
    scols, dcols = list(spdf.columns), list(dpdf.columns)
    if scols != dcols:
        return f"SCHEMA MISMATCH spark={scols} duck={dcols}"
    if len(spdf) != len(dpdf):
        return f"ROWCOUNT MISMATCH spark={len(spdf)} duck={len(dpdf)}"
    for c in scols:
        sk, dk = _col_kind(spdf[c]), _col_kind(dpdf[c])
        if "n" not in (sk, dk) and sk != dk:
            return (
                f"DTYPE MISMATCH col={c} spark_kind={sk}({spdf[c].dtype}) "
                f"duck_kind={dk}({dpdf[c].dtype}) — driver hash would differ"
            )
    srows = [tuple(_cell(v) for v in row) for row in spdf.itertuples(index=False)]
    drows = [tuple(_cell(v) for v in row) for row in dpdf.itertuples(index=False)]
    srows.sort(key=repr)
    drows.sort(key=repr)
    if srows != drows:
        for i, (a, b) in enumerate(zip(srows, drows)):
            if a != b:
                return f"VALUE MISMATCH at sorted-row {i}:\n  spark={a}\n  duck ={b}"
    return f"OK ({len(srows)} rows)"


def main():
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
    only = set(args[1:]) if args and os.path.isdir(args[0]) else set(args)
    spark = get_session("oracle-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            # tables may be single files (driver testdata) or Spark
            # directories of part files (scaled synth dirs)
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet"
            + ("/*.parquet')" if os.path.isdir(f"{sf_dir}/{t}.parquet") else "')")
        )
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    record: dict = {}
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
        m = re.search(r"\((\d+) rows\)", verdict)
        record[name] = {
            "status": status,
            "check": verdict.split(" ")[0],
            "rows": int(m.group(1)) if m else None,
        }
        print(f"[{status}] {name}: {verdict}", flush=True)
    extra_oracles = set(oracles) - set(qs)
    if extra_oracles:
        failures += 1
        print(f"[FAIL] oracle_sql keys without queries: {extra_oracles}")
    if json_out:
        import json

        payload = {
            "sf": (
                float(m.group(1))
                if (m := re.search(r"sf([0-9.]+)", sf_dir))
                else -1.0
            ),
            "n_queries": len(record),
            "n_pass": sum(1 for v in record.values() if v["status"] == "PASS"),
            "n_hash_checked": sum(
                1 for v in record.values() if v["check"] == "OK"
            ),
            "n_rows_only": sum(
                1 for v in record.values() if v["check"] == "ROWS_ONLY"
            ),
            "queries": dict(sorted(record.items())),
        }
        with open(json_out, "w") as f:
            json.dump(payload, f, indent=1)
            f.write("\n")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
