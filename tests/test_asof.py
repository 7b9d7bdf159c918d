"""asof_join edge cases: exact-timestamp ties, unmatched left rows,
deterministic right-side tiebreaks."""

import datetime as dt

from mack_spark.operators import asof_join

from conftest import assert_df_equality


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


def test_asof_backward_inclusive_and_unmatched(spark):
    left = spark.createDataFrame(
        [
            (1, _ts(10), "p1"),   # matches r@5
            (1, _ts(20), "p2"),   # matches r@20 (exact tie -> inclusive)
            (2, _ts(1), "p3"),    # no prior right row -> NULLs
        ],
        ["k", "ts", "tag"],
    )
    right = spark.createDataFrame(
        [
            (1, _ts(5), 50.0),
            (1, _ts(20), 200.0),
            (2, _ts(2), 999.0),   # after left@1 -> must not match
        ],
        ["k", "ts", "v"],
    )
    out = asof_join(left, right, ["k"], "ts", ["v"], suffix="_r")
    expected = spark.createDataFrame(
        [
            (1, _ts(10), "p1", _ts(5), 50.0),
            (1, _ts(20), "p2", _ts(20), 200.0),
            (2, _ts(1), "p3", None, None),
        ],
        "k long, ts timestamp, tag string, ts_r timestamp, v_r double",
    )
    assert_df_equality(
        out.select("k", "ts", "tag", "ts_r", "v_r"), expected
    )


def test_asof_null_right_value_not_stitched_from_older_row(spark):
    """A matched right row with a genuine NULL in one value column must
    surface that NULL, not a value forward-filled from an older right
    row (the per-column last(ignorenulls) bug)."""
    left = spark.createDataFrame([(1, _ts(30), "p")], ["k", "ts", "tag"])
    right = spark.createDataFrame(
        [(1, _ts(5), 50.0, "old"), (1, _ts(20), None, "new")],
        "k long, ts timestamp, v double, src string",
    )
    out = asof_join(left, right, ["k"], "ts", ["v", "src"], suffix="_r")
    row = out.select("ts_r", "v_r", "src_r").collect()[0]
    assert row["ts_r"] == _ts(20)
    assert row["v_r"] is None          # NOT 50.0 from the older row
    assert row["src_r"] == "new"


def test_asof_right_tiebreak_picks_greatest(spark):
    left = spark.createDataFrame([(1, _ts(10), "p")], ["k", "ts", "tag"])
    right = spark.createDataFrame(
        [(1, _ts(5), 1.0, 7), (1, _ts(5), 2.0, 9)],
        ["k", "ts", "v", "seq"],
    )
    out = asof_join(
        left, right, ["k"], "ts", ["v"], suffix="_r", right_tiebreak_col="seq"
    )
    rows = out.select("v_r").collect()
    assert [r["v_r"] for r in rows] == [2.0]
