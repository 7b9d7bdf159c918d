"""Interval (range) join — points matched to containing intervals.

Spark has no native range join: the naive ``p.ts BETWEEN i.start AND
i.end`` predicate becomes a broadcast-nested-loop (or, with an equi key
present, a sort-merge that still filters post-hoc). This operator
bucketizes time into fixed-width chunks, explodes each interval to the
buckets it covers, and equi-joins points to intervals on the bucket id
before applying the exact containment filter.

SCALE: the join is a plain hash/sort-merge on a well-distributed
integer key; cost is |P| + Σ(interval_width/bucket) rows, and each
(point, interval) pair meets in exactly ONE bucket (the point's), so no
post-join dedup is needed. Pick ``bucket_seconds`` near the typical
interval width: too small explodes intervals into many rows, too large
degrades bucket selectivity toward the cross product. Long-tail
intervals (≫ bucket) are the skew risk — cap or split them upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_US = 1_000_000


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Inner-join every point row to every interval row containing its
    timestamp (inclusive on both ends). All other columns from both
    sides pass through; colliding names must be resolved by the caller
    beforehand.
    """
    width = bucket_seconds * _US
    # Integer DIV, not double `/`: float division can land an epoch on
    # the wrong side of a bucket boundary.
    p = points.withColumn(
        "__bucket", F.expr(f"unix_micros({ts_col}) DIV {width}")
    )
    i = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.expr(f"unix_micros({start_col}) DIV {width}"),
                F.expr(f"unix_micros({end_col}) DIV {width}"),
            )
        ),
    )
    return (
        p.join(i, "__bucket")
        .filter(
            (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
        )
        .drop("__bucket")
    )
