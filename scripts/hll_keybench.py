"""Micro-bench: single-pass HLL key discovery vs the reference's loop.

The reference's ``find_composite_key_candidates`` runs ONE Spark job
(``select(combo).distinct().count()``) per column combination — O(2^n)
jobs (reference mack/__init__.py:558-586). This engine's version
(mack_spark/keys.py:76) does one ``approx_count_distinct`` aggregation
per combination SIZE plus one exact verify of sketch winners.

Workload: 10-column table derived from orders where every single column
is non-unique and the only key is the LAST size-2 combination in
``itertools.combinations`` order — so the reference strategy must run
10 + 45 = 55 full jobs while ours runs ~4. Both strategies return the
same answer; timings go to stdout and BASELINE.md.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/hll_keybench.py
"""
import os
import sys
import time
from itertools import combinations

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mack_spark.session import get_session
from mack_spark.keys import find_composite_key_candidates


def reference_find(df):
    """Faithful re-expression of the reference's O(2^n)-jobs algorithm
    (one distinct().count() job per combination, combination order)."""
    total = df.distinct().count()
    for n in range(1, len(df.columns) + 1):
        for combo in combinations(df.columns, n):
            if df.select(*combo).distinct().count() == total:
                if n == len(df.columns):
                    raise ValueError("No composite key candidates could be identified.")
                return list(combo)
    raise ValueError("No composite key candidates could be identified.")


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("hll-keybench")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")

    # 8 junk columns (all non-unique), then the unique pair (c9, c10)
    # LAST in column order -> last of the 45 size-2 combinations.
    df = orders.select(
        F.col("o_orderstatus").alias("c1"),
        F.col("o_orderpriority").alias("c2"),
        F.year("o_orderdate").alias("c3"),
        F.month("o_orderdate").alias("c4"),
        F.dayofmonth("o_orderdate").alias("c5"),
        F.pmod("o_custkey", F.lit(97)).alias("c6"),
        F.pmod("o_orderkey", F.lit(31)).alias("c7"),
        (F.col("o_totalprice") > 100000).alias("c8"),
        (F.col("o_orderkey") / 4096).cast("bigint").alias("c9"),
        F.pmod("o_orderkey", F.lit(4096)).alias("c10"),
    )
    df.write.mode("overwrite").parquet("/tmp/hll_keybench_input")
    mat = spark.read.parquet("/tmp/hll_keybench_input")
    n_rows = mat.count()

    t0 = time.time()
    ours = find_composite_key_candidates(mat)
    t_ours = time.time() - t0

    t0 = time.time()
    ref = reference_find(mat)
    t_ref = time.time() - t0

    assert ours == ref == ["c9", "c10"], (ours, ref)
    print(
        f"rows={n_rows} cols=10 | single-pass HLL: {t_ours:.2f}s"
        f" | reference per-combo jobs (55 jobs): {t_ref:.2f}s"
        f" | speedup {t_ref / t_ours:.1f}x"
    )


if __name__ == "__main__":
    main()
