"""Skew-resilient join: salt-and-replicate for power-law join keys.

AQE's skew-join splitting handles moderate skew transparently; this
operator is the explicit version for pathological keys (one user id
with 10^9 events joined against a big — non-broadcastable — right
side), where you want the fan-out pinned and predictable rather than
discovered at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join two LARGE frames on an equi key whose distribution is
    skewed, spreading each hot key over ``num_salts`` reducers.

    The skewed (left) side gets a deterministic salt in [0, num_salts)
    hashed from the whole row, so one hot key's rows scatter across
    ``num_salts`` shuffle partitions instead of one; the right side is
    replicated once per salt (``explode(sequence(...))`` — row-local,
    no shuffle of its own beyond the join's). Each left row matches
    exactly one replica, so the result is row-identical to the plain
    join. Cost: right side shuffles num_salts× its size — worth it
    exactly when the hot reducer, not total bytes, is the bottleneck.
    Only inner/left joins are safe (a right/full join would see
    ``num_salts`` copies of unmatched right rows).
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    l = left.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(num_salts)),
    )
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    joined = l.join(
        r,
        (l[left_key] == r[right_key]) & (l["__salt"] == r["__salt"]),
        how,
    )
    return joined.drop("__salt")


def key_skew_profile(
    df: DataFrame, key_cols, top: int = 10, round_digits: int = 6
) -> DataFrame:
    """Heavy-hitter diagnosis for a join/aggregation key: the top-N
    keys by row count with each key's share of the table and the
    cumulative share — the numbers that decide between a plain shuffle,
    AQE skew splitting, and explicit salting (``salted_join``).

    SCALE: one map-side-combined aggregation (shuffle carries one row
    per distinct key) + a windowed top-N over the aggregated counts.
    Returns ``(rank, *key_cols, n_rows, share, cum_share)``.
    """
    key_cols = list(key_cols)
    counts = df.groupBy(*key_cols).agg(F.count("*").alias("n_rows"))
    total = df.count()
    # orderBy + limit compiles to TakeOrderedAndProject: per-partition
    # top-N merged on the driver — no global sort even with billions of
    # distinct keys. The ranking window then runs over <= top rows.
    head = counts.orderBy(
        F.col("n_rows").desc(), *[F.col(c).asc() for c in key_cols]
    ).limit(top)
    w = Window.orderBy(F.col("n_rows").desc(), *[F.col(c).asc() for c in key_cols])
    ranked = head.withColumn("rank", F.row_number().over(w)).withColumn(
        "share", F.round(F.col("n_rows") / F.lit(float(total)), round_digits)
    )
    wc = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    return ranked.withColumn(
        "cum_share",
        F.round(F.sum(F.col("n_rows") / F.lit(float(total))).over(wc), round_digits),
    ).select("rank", *key_cols, "n_rows", "share", "cum_share")
