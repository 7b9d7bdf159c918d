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


def conversion_funnel(
    events: DataFrame,
    steps: list | None = None,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered conversion funnel: a user reaches step k when an event of
    that step's type occurs AT OR AFTER their step-(k−1) arrival — the
    sequence-enforced funnel (plain type co-occurrence, what a semi-join
    measures, overcounts users who purchased before ever viewing).

    Returns one row per step: ``(step, step_name, n_users, conversion,
    avg_delay_sec)`` — conversion is the share of the PREVIOUS step's
    users (NULL for step 1), avg_delay_sec the mean seconds from the
    previous step's arrival (exact integer-microsecond sums, so the
    mean is order-independent).

    SCALE: one filtered per-user min-aggregation per step, chained
    through user-keyed joins — every frame after the first aggregation
    is at most one row per surviving user, shrinking monotonically; the
    final report is k single-row aggregates unioned. No window over the
    raw events, no ordering pass.
    """
    steps = steps or ["view", "click", "purchase"]
    ts = F.col(ts_col).cast("timestamp")
    arrivals = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts).alias("t_prev"))
    )
    report = [
        arrivals.agg(
            F.lit(1).alias("step"),
            F.lit(steps[0]).alias("step_name"),
            F.count(F.lit(1)).alias("n_users"),
            F.lit(None).cast("double").alias("conversion"),
            F.lit(None).cast("double").alias("avg_delay_sec"),
        )
    ]
    prev = arrivals
    for k, name in enumerate(steps[1:], start=2):
        nxt = (
            events.filter(F.col(type_col) == name)
            .select(F.col(user_col), ts.alias("t_evt"))
            .join(prev, user_col)
            .filter(F.col("t_evt") >= F.col("t_prev"))
            .groupBy(user_col, "t_prev")
            .agg(F.min("t_evt").alias("t_cur"))
        )
        stats = nxt.agg(
            F.count(F.lit(1)).alias("n_users"),
            (
                F.sum(
                    F.unix_micros(F.col("t_cur")) - F.unix_micros(F.col("t_prev"))
                ).cast("double")
                / F.count(F.lit(1)).cast("double")
                / F.lit(1000000.0)
            ).alias("raw_delay"),
        ).crossJoin(prev.agg(F.count(F.lit(1)).alias("n_prev")))
        report.append(
            stats.select(
                F.lit(k).alias("step"),
                F.lit(name).alias("step_name"),
                F.col("n_users"),
                F.round(
                    F.col("n_users").cast("double") / F.col("n_prev").cast("double"),
                    6,
                ).alias("conversion"),
                F.round(F.col("raw_delay"), 6).alias("avg_delay_sec"),
            )
        )
        prev = nxt.select(user_col, F.col("t_cur").alias("t_prev"))
    out = report[0]
    for r in report[1:]:
        out = out.unionByName(r)
    return out.orderBy("step")


def event_gap_percentiles(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    ps: tuple = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Inter-arrival-time distribution per event type: exact nearest-
    rank percentiles of the gap (seconds) between consecutive events of
    the same type — the latency/cadence profile behind rate alarms and
    debounce-threshold tuning (pair with :func:`event_debounce`).

    Gaps are exact integer microseconds (lag over a total (ts, id)
    order); the percentile runs on the integer domain and only the
    OUTPUT converts to seconds, so there is no float-rank hazard.

    Returns ``(event_type, p, gap_seconds)``.

    SCALE: one shuffle on the type for the lag window, then the grouped
    exact-percentile machinery over per-(type, gap) counts — the window
    sort is per-type over distinct gap values, never a global order.
    """
    from mack_spark.operators.profile import grouped_exact_percentiles

    ts = F.col(ts_col).cast("timestamp")
    w = Window.partitionBy(type_col).orderBy(ts_col, id_col)
    gaps = events.select(
        F.col(type_col),
        (F.unix_micros(ts) - F.unix_micros(F.lag(ts).over(w))).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    out = grouped_exact_percentiles(gaps, type_col, "gap_us", ps)
    return out.select(
        F.col(type_col),
        "p",
        F.round(F.col("value").cast("double") / F.lit(1000000.0), 6).alias(
            "gap_seconds"
        ),
    )
