"""Cross-table integrity audits.

The data-quality complement of the key-discovery family in
:mod:`mack_spark.keys` (single-table candidate keys, reference
mack/__init__.py:358-418): these check the *relationships* between
tables — the referential contract an LLM-data pipeline relies on when
documents, embeddings, and shard manifests must stay 1:1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def referential_audit(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """One-row referential-integrity summary between two tables.

    Output columns: ``n_left, n_right, n_left_null_keys,
    n_right_null_keys, n_left_dup_keys, n_right_dup_keys,
    n_left_orphans, n_right_orphans`` — orphans are rows whose
    (non-null) key has no match on the other side; dup_keys counts
    rows beyond the first per key (0 = key is unique).

    SCALE: each side reduces to one row per distinct key (map-side
    combinable count) before the full-outer join, so the join input is
    key-cardinality-sized, not table-sized; the result is a single
    aggregate row. NULL keys never join (SQL semantics) — they're
    counted separately, not as orphans.
    """
    lk = (
        left.select(F.col(left_key).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("ln"))
    )
    rk = (
        right.select(F.col(right_key).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("rn"))
    )
    joined = lk.join(rk, "k", "full_outer")
    return joined.agg(
        F.sum(F.when(F.col("k").isNotNull(), F.coalesce("ln", F.lit(0))).otherwise(0)).alias("__l_nonnull"),
        F.sum(F.when(F.col("k").isNotNull(), F.coalesce("rn", F.lit(0))).otherwise(0)).alias("__r_nonnull"),
        F.sum(F.when(F.col("k").isNull(), F.coalesce("ln", F.lit(0))).otherwise(0)).alias("n_left_null_keys"),
        F.sum(F.when(F.col("k").isNull(), F.coalesce("rn", F.lit(0))).otherwise(0)).alias("n_right_null_keys"),
        F.sum(
            F.when(F.col("k").isNotNull() & (F.col("ln") > 1), F.col("ln") - 1).otherwise(0)
        ).alias("n_left_dup_keys"),
        F.sum(
            F.when(F.col("k").isNotNull() & (F.col("rn") > 1), F.col("rn") - 1).otherwise(0)
        ).alias("n_right_dup_keys"),
        F.sum(
            F.when(F.col("k").isNotNull() & F.col("rn").isNull(), F.col("ln")).otherwise(0)
        ).alias("n_left_orphans"),
        F.sum(
            F.when(F.col("k").isNotNull() & F.col("ln").isNull(), F.col("rn")).otherwise(0)
        ).alias("n_right_orphans"),
    ).select(
        (F.col("__l_nonnull") + F.col("n_left_null_keys")).alias("n_left"),
        (F.col("__r_nonnull") + F.col("n_right_null_keys")).alias("n_right"),
        "n_left_null_keys",
        "n_right_null_keys",
        "n_left_dup_keys",
        "n_right_dup_keys",
        "n_left_orphans",
        "n_right_orphans",
    )
