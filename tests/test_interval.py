"""interval_join: inclusive boundaries, bucket-spanning intervals, and
the one-bucket-per-pair no-duplicate guarantee."""

import datetime as dt

from mack_spark.operators import interval_join


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_inclusive_bounds_and_bucket_spanning(spark):
    points = spark.createDataFrame(
        [
            (1, _ts(10, 0)),   # == start -> inclusive
            (2, _ts(12, 0)),   # == end   -> inclusive
            (3, _ts(11, 30)),  # inside, different hour-bucket than start/end
            (4, _ts(12, 1)),   # after end -> no match
        ],
        ["pid", "ts"],
    )
    intervals = spark.createDataFrame(
        [(100, _ts(10, 0), _ts(12, 0))], ["iid", "start", "end"]
    )
    out = interval_join(points, intervals, "ts", "start", "end", bucket_seconds=3600)
    got = sorted((r["pid"], r["iid"]) for r in out.collect())
    assert got == [(1, 100), (2, 100), (3, 100)]


def test_no_duplicate_pairs_even_for_wide_intervals(spark):
    # interval spans 50 buckets with a tiny bucket width; the pair must
    # still appear exactly once.
    points = spark.createDataFrame([(1, _ts(10, 30))], ["pid", "ts"])
    intervals = spark.createDataFrame(
        [(7, _ts(10, 0), _ts(11, 0))], ["iid", "start", "end"]
    )
    out = interval_join(points, intervals, "ts", "start", "end", bucket_seconds=73)
    assert out.count() == 1


def test_overlapping_intervals_all_match(spark):
    points = spark.createDataFrame([(1, _ts(10, 30))], ["pid", "ts"])
    intervals = spark.createDataFrame(
        [
            (1, _ts(10, 0), _ts(11, 0)),
            (2, _ts(9, 0), _ts(12, 0)),
            (3, _ts(10, 31), _ts(11, 0)),  # starts after the point
        ],
        ["iid", "start", "end"],
    )
    out = interval_join(points, intervals, "ts", "start", "end")
    assert sorted(r["iid"] for r in out.collect()) == [1, 2]
