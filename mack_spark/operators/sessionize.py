"""Batch sessionization of an event stream.

Gap-based sessions: a new session starts when the gap to the previous
event of the same user exceeds ``gap_minutes``. Classic lag + running
sum — one shuffle on user_id, then window functions within partitions.

SCALE: the only shuffle is partitionBy(user_id); skewed power-users are
handled by AQE skew splitting only for the join case, so for extreme
skew pre-split hot users by day first. The streaming equivalent is
``session_window`` in mack_spark.streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    tiebreak_cols: list | None = None,
) -> DataFrame:
    """Assign session ids and summarize sessions per user.

    Returns ``(user_id, session_id, n_events, session_start,
    session_end)`` — session_id is 1-based per user in time order.
    ``tiebreak_cols`` make the intra-user ordering total when multiple
    events share a timestamp (required for deterministic output).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, *(tiebreak_cols or []))
    # Microsecond-exact gap (unix_timestamp would truncate to seconds,
    # misclassifying gaps that straddle the threshold by <1s).
    gap = F.unix_micros(F.col(ts_col)) - F.unix_micros(F.lag(ts_col).over(w))
    with_bound = events.withColumn(
        "is_new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1).otherwise(0),
    )
    with_sid = with_bound.withColumn(
        "session_id", F.sum("is_new_session").over(w)
    )
    return (
        with_sid.groupBy(user_col, "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
    )


def event_debounce(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    debounce_seconds: int = 300,
) -> DataFrame:
    """Telemetry debounce: collapse each burst of same ``(user, type)``
    events into its first event. A burst breaks when the gap to the
    previous event (kept or not) exceeds ``debounce_seconds`` — the
    gap-based variant of :func:`sessionize` applied as deduplication,
    the standard double-fire/retry suppression for clickstreams and
    device telemetry before counting.

    Returns the kept (burst-head) events with the suppression count:
    ``(event_id, user_id, event_type, ts, n_suppressed)``.

    SCALE: one shuffle on ``(user, type)`` — the same lag + running-sum
    window as sessionize, then the per-burst aggregation reuses that
    partitioning (no second exchange). The head row is selected by
    ``min(struct(ts, id))`` inside the aggregate, so no second window
    pass over the events. Microsecond-exact gaps (unix_micros), total
    order via the ``id_col`` tiebreak.
    """
    w = Window.partitionBy(user_col, type_col).orderBy(ts_col, id_col)
    # cast: unix_micros rejects TIMESTAMP_NTZ (what a raw parquet read
    # yields); the cast is a no-op on plain TIMESTAMP columns
    ts = F.col(ts_col).cast("timestamp")
    gap = F.unix_micros(ts) - F.unix_micros(F.lag(ts).over(w))
    head = F.when(
        gap.isNull() | (gap > debounce_seconds * 1_000_000), 1
    ).otherwise(0)
    with_burst = events.withColumn("__burst", F.sum(head).over(w))
    return (
        with_burst.groupBy(user_col, type_col, "__burst")
        .agg(
            F.min(F.struct(F.col(ts_col), F.col(id_col))).alias("__head"),
            F.count(F.lit(1)).alias("__blen"),
        )
        .select(
            F.col(f"__head.{id_col}").alias(id_col),
            F.col(user_col),
            F.col(type_col),
            F.col(f"__head.{ts_col}").alias(ts_col),
            (F.col("__blen") - F.lit(1)).cast("long").alias("n_suppressed"),
        )
    )


def gap_fill_daily(
    df: DataFrame,
    ts_col: str = "ts",
    series_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Per-series daily gap fill: aggregate to (series, day), build the
    full min..max date spine per series, left-join, zero-fill counts
    and forward-fill the last observed daily mean.

    SCALE: the spine is ``sequence(min_day, max_day)`` exploded from
    one row per series — thousands of rows for years of days, never a
    driver loop. The forward-fill window partitions by the series key,
    so state and sort stay per-series (a global unpartitioned
    gap-fill would serialize; always carry a series key at scale).
    """
    daily = (
        df.groupBy(
            F.col(series_col).alias("series"), F.to_date(ts_col).alias("d")
        )
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum(
                    F.floor(F.col(value_col) * F.lit(10000.0)).cast(
                        "decimal(38,0)"
                    )
                ).cast("double")
                / F.lit(10000.0)
                / F.count("*"),
                6,
            ).alias("avg_v"),
        )
    )
    spine = (
        daily.groupBy("series")
        .agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
        .select(
            "series",
            F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day"),
        )
    )
    w = (
        Window.partitionBy("series")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    daily_r = daily.withColumnRenamed("series", "d_series")
    return (
        spine.join(
            daily_r,
            (F.col("series") == F.col("d_series")) & (F.col("day") == F.col("d")),
            "left",
        )
        .select(
            "series",
            "day",
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.last("avg_v", ignorenulls=True).over(w).alias("avg_value_ff"),
        )
        .orderBy("series", "day")
    )
