"""Retention cohort analysis over an event stream.

The classic product-analytics matrix: users grouped by first-seen week
(their cohort), tracked for activity in each subsequent week —
``retention[cohort, k]`` = fraction of the cohort active k weeks
later. The reference (mack) has no behavioral-analytics surface; this
extends the rebuild's events family (sessionize / funnel / as-of)
with the cohort primitive.

SCALE: two aggregations keyed by user (first-seen, distinct active
weeks — the second reuses the first's hash distribution by the subset
rule), one user-keyed join, then a rollup to the tiny (cohort, week)
matrix joined against broadcast cohort sizes. No data-sized global
stage; weeks are ISO (``date_trunc('week')`` — identical Monday-start
semantics in Spark and DuckDB, which keeps the oracle exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    round_rate: int = 4,
) -> DataFrame:
    """Weekly retention matrix: ``(cohort_week, weeks_since,
    n_active_users, cohort_size, retention)``.

    ``cohort_week`` is the ISO week (Monday, DATE) of the user's first
    event; ``weeks_since`` counts whole weeks from cohort to activity
    week (0 = the cohort week itself, so ``retention`` at 0 is 1.0 by
    construction); ``retention = n_active_users / cohort_size`` as one
    IEEE division rounded to ``round_rate``.
    """
    week = lambda c: F.date_trunc("week", c)  # noqa: E731
    firsts = df.groupBy(user_col).agg(
        F.to_date(week(F.min(ts_col))).alias("cohort_week")
    )
    active = (
        df.select(F.col(user_col), F.to_date(week(F.col(ts_col))).alias("week"))
        .distinct()
    )
    joined = active.join(firsts, user_col).select(
        user_col,
        "cohort_week",
        (F.datediff(F.col("week"), F.col("cohort_week")) / F.lit(7))
        .cast("int")
        .alias("weeks_since"),
    )
    counts = joined.groupBy("cohort_week", "weeks_since").agg(
        F.count(F.lit(1)).alias("n_active_users")
    )
    sizes = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return counts.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        "weeks_since",
        "n_active_users",
        "cohort_size",
        F.round(
            F.col("n_active_users").cast("double")
            / F.col("cohort_size").cast("double"),
            round_rate,
        ).alias("retention"),
    )
