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
