"""Generate a scaled-up copy of a testdata dir for scaling experiments
(VERDICT r6 #6: one sf1-class bench pass to expose effects the small
corpus hides — O(n²)-in-bucket candidate growth, driver-side collects,
shuffle spill).

Each table is the base table unioned with ``factor - 1`` key-shifted
copies. Content columns are perturbed per copy so the scaled corpus
keeps a REALISTIC duplicate structure instead of degenerating into
factor-sized clone groups (which would measure the adversarial
hot-bucket path, not scaling):

* ``documents.text`` gets a per-copy suffix token — near-dup clusters
  keep their within-copy shape, across-copy texts differ;
* ``embeddings.embedding`` is circularly shifted by the copy index —
  norms and within-copy geometry are preserved, across-copy vectors
  decorrelate;
* key columns shift by ``copy * (max_key + 1)`` so referential
  integrity (orders→customer, lineitem→orders) survives per copy.

Usage: python scripts/make_scaled_sf.py [src_dir] [dest_dir] [factor]
Defaults: /root/testdata/sf0.1 /tmp/sf1-synth 10
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mack_spark.session import get_session

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# key columns to shift per copy, per table (FK columns shift by the
# PARENT's stride so joins stay consistent)
KEYS = {
    "customer": {"c_custkey": "c_custkey"},
    "supplier": {"s_suppkey": "s_suppkey"},
    "part": {"p_partkey": "p_partkey"},
    "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
    "lineitem": {
        "l_orderkey": "o_orderkey",
        "l_partkey": "p_partkey",
        "l_suppkey": "s_suppkey",
    },
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}
# tiny dimension tables are copied as-is (scaling them would break
# nation/region semantics)
UNSCALED = {"region", "nation"}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dest = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1-synth"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_session("make-scaled-sf")
    os.makedirs(dest, exist_ok=True)

    strides = {}
    for name in TABLES:
        df = spark.read.parquet(f"{src}/{name}.parquet")
        for col, stride_key in KEYS.get(name, {}).items():
            if stride_key not in strides:
                base_tbl, base_col = next(
                    (t, c)
                    for t in TABLES
                    for c, sk in KEYS.get(t, {}).items()
                    if sk == stride_key and c == stride_key
                )
                strides[stride_key] = (
                    spark.read.parquet(f"{src}/{base_tbl}.parquet")
                    .agg(F.max(base_col))
                    .collect()[0][0]
                    + 1
                )

    for name in TABLES:
        df = spark.read.parquet(f"{src}/{name}.parquet")
        if name in UNSCALED:
            out = df
        else:
            copies = []
            for i in range(factor):
                c = df
                for col, stride_key in KEYS.get(name, {}).items():
                    c = c.withColumn(
                        col, F.col(col) + F.lit(i * strides[stride_key])
                    )
                if name == "documents" and i > 0:
                    c = c.withColumn(
                        "text",
                        F.when(
                            F.col("text").isNotNull(),
                            F.concat(F.col("text"), F.lit(f" rep{i}")),
                        ),
                    )
                if name == "embeddings" and i > 0:
                    dim = 64
                    k = i % dim
                    c = c.withColumn(
                        "embedding",
                        F.concat(
                            F.slice("embedding", k + 1, dim - k),
                            F.slice("embedding", 1, k),
                        ),
                    )
                copies.append(c)
            out = copies[0]
            for c in copies[1:]:
                out = out.unionByName(c)
        n_files = max(1, min(32, out.rdd.getNumPartitions()))
        out.repartition(n_files).write.mode("overwrite").parquet(
            f"{dest}/{name}.parquet"
        )
        print(f"{name}: {spark.read.parquet(f'{dest}/{name}.parquet').count()} rows")


if __name__ == "__main__":
    main()
