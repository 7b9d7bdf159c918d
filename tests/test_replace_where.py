"""Round-14: ``replaceWhere`` on the open-protocol table —
delta-spark's predicate overwrite (``.option("replaceWhere", ...)``),
the idiomatic partition/date-range backfill. One commit: files with no
matching row are untouched (phase-1 stats prune), partially-matching
files are rewritten keeping survivors, new data lands alongside;
incoming rows must all satisfy the predicate (Delta's constraint
check). CDF records deletes for the replaced rows and inserts for the
new ones; row-tracked survivors keep their ids."""

import pytest

from mack_spark.sources.delta_log import (
    DeltaProtocolError,
    DeltaProtocolTable,
)

SCHEMA = "pkey int, part string, v int"


def _mk(spark, tmp_path, name="t", **kw):
    df = spark.createDataFrame(
        [(i, "a" if i < 10 else "b", i * 10) for i in range(20)], SCHEMA
    )
    return DeltaProtocolTable.create(spark, str(tmp_path / name), df, **kw)


class TestReplaceWhere:
    def test_partition_replace_prunes_untouched(self, spark, tmp_path):
        t = _mk(spark, tmp_path, partition_by=["part"])
        before_b = {
            p for p in t.snapshot().files if "part=b" in p
        }
        new = spark.createDataFrame(
            [(100, "a", 1), (101, "a", 2)], SCHEMA
        )
        t.overwrite(new, replace_where="part = 'a'")
        snap = t.snapshot()
        # the b-partition files were not rewritten
        assert before_b <= set(snap.files)
        rows = {r["pkey"] for r in t.to_df().collect()}
        assert rows == {100, 101} | set(range(10, 20))

    def test_unpartitioned_partial_file_rewrite(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(i, "x", i) for i in range(100)], SCHEMA
        ).coalesce(1)
        t = DeltaProtocolTable.create(spark, str(tmp_path / "u"), df)
        new = spark.createDataFrame([(500, "x", 55)], SCHEMA)
        t.overwrite(new, replace_where="v >= 50")
        vals = sorted(r["v"] for r in t.to_df().collect())
        assert vals == list(range(50)) + [55]

    def test_constraint_check_refuses_stray_rows(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        bad = spark.createDataFrame([(1, "b", 1)], SCHEMA)
        with pytest.raises(DeltaProtocolError, match="NOT matching"):
            t.overwrite(bad, replace_where="part = 'a'")
        # nothing committed
        assert t.snapshot().version == 0
        assert t.to_df().count() == 20

    def test_no_matching_files_is_pure_insert(self, spark, tmp_path):
        t = _mk(spark, tmp_path, partition_by=["part"])
        new = spark.createDataFrame([(200, "c", 9)], SCHEMA)
        t.overwrite(new, replace_where="part = 'c'")
        assert t.to_df().count() == 21

    def test_cdf_records_deletes_and_inserts_only(self, spark, tmp_path):
        t = _mk(
            spark, tmp_path,
            properties={"delta.enableChangeDataFeed": "true"},
        )
        new = spark.createDataFrame([(300, "a", 7)], SCHEMA)
        t.overwrite(new, replace_where="part = 'a'")
        ch = t.table_changes(1, 1)
        by_kind = {
            r["_change_type"]: r["n"]
            for r in ch.groupBy("_change_type").count()
            .withColumnRenamed("count", "n").collect()
        }
        assert by_kind == {"delete": 10, "insert": 1}

    def test_row_tracking_survivors_keep_ids(self, spark, tmp_path):
        t = _mk(
            spark, tmp_path,
            properties={"delta.enableRowTracking": "true"},
        )
        before = {
            r["pkey"]: r["_row_id"]
            for r in t.to_df(with_row_ids=True).collect()
        }
        new = spark.createDataFrame([(400, "a", 3)], SCHEMA)
        t.overwrite(new, replace_where="part = 'a'")
        after = {
            r["pkey"]: r["_row_id"]
            for r in t.to_df(with_row_ids=True).collect()
        }
        for k in range(10, 20):  # part=b survivors share files with no
            assert after[k] == before[k]  # matching rows OR are rewritten
        assert after[400] not in before.values()

    def test_merge_schema_refused(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        new = spark.createDataFrame([(1, "a", 1)], SCHEMA)
        with pytest.raises(DeltaProtocolError, match="mergeSchema"):
            t.overwrite(new, merge_schema=True, replace_where="part = 'a'")

    def test_time_travel_and_restore_across_replace(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        new = spark.createDataFrame([(999, "a", 0)], SCHEMA)
        t.overwrite(new, replace_where="part = 'a'")
        assert t.to_df(version_as_of=0).count() == 20
        t.restore(0)
        assert t.to_df().count() == 20
