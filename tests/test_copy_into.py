"""COPY INTO (round 15): idempotent batch file ingest.

Databricks/delta-spark semantics: each source file lands exactly once
across any number of re-runs, crashes, and restarts — the per-file
SetTransaction watermark rides the same commit as the file's rows.
"""

import os
import shutil

import pytest

from mack_spark.sources.delta_log import (
    DeltaProtocolError,
    DeltaProtocolTable,
    clear_replay_cache,
)


def _land(spark, d, name, rows):
    """Write one parquet file under the landing dir; returns its path."""
    tmp = str(d / f"_stage_{name}")
    spark.createDataFrame(rows, "k int, v string").coalesce(1) \
        .write.mode("overwrite").parquet(tmp)
    part = next(
        f for f in os.listdir(tmp)
        if f.endswith(".parquet") and not f.startswith(".")
    )
    os.makedirs(d / "landing", exist_ok=True)
    dst = str(d / "landing" / name)
    shutil.copyfile(os.path.join(tmp, part), dst)
    shutil.rmtree(tmp)
    return dst


@pytest.fixture
def target(spark, tmp_path):
    df = spark.createDataFrame([(0, "seed")], "k int, v string")
    return DeltaProtocolTable.create(spark, str(tmp_path / "t"), df)


class TestCopyInto:
    def test_triple_overlapping_copy_lands_each_file_once(
        self, spark, tmp_path, target
    ):
        _land(spark, tmp_path, "a.parquet", [(1, "a"), (2, "a")])
        _land(spark, tmp_path, "b.parquet", [(3, "b")])
        src = str(tmp_path / "landing")
        m1 = target.copy_into(src)
        assert m1["num_loaded_files"] == 2 and m1["num_inserted_rows"] == 3
        # second run: nothing new
        m2 = target.copy_into(src)
        assert m2["num_loaded_files"] == 0 and m2["num_skipped_files"] == 2
        # a third file arrives; third run loads ONLY it
        _land(spark, tmp_path, "c.parquet", [(4, "c")])
        m3 = target.copy_into(src)
        assert m3["num_loaded_files"] == 1 and m3["num_skipped_files"] == 2
        got = sorted(r["k"] for r in target.to_df().collect())
        assert got == [0, 1, 2, 3, 4]

    def test_restart_replay_still_skips(self, spark, tmp_path, target):
        _land(spark, tmp_path, "a.parquet", [(1, "a")])
        src = str(tmp_path / "landing")
        target.copy_into(src)
        # cold restart: fresh handle, replay cache dropped — the
        # watermarks come back from the log itself
        clear_replay_cache(target.path)
        t2 = DeltaProtocolTable(spark, target.path)
        m = t2.copy_into(src)
        assert m["num_loaded_files"] == 0 and m["num_skipped_files"] == 1
        assert t2.to_df().count() == 2

    def test_modified_file_reloads(self, spark, tmp_path, target):
        p = _land(spark, tmp_path, "a.parquet", [(1, "a")])
        src = str(tmp_path / "landing")
        target.copy_into(src)
        # rewrite the file with a newer mtime → watermark moves
        p2 = _land(spark, tmp_path, "a.parquet", [(9, "a2")])
        os.utime(p2, ns=(os.stat(p2).st_mtime_ns + 2_000_000_000,) * 2)
        m = target.copy_into(src)
        assert m["num_loaded_files"] == 1
        got = sorted(r["k"] for r in target.to_df().collect())
        assert got == [0, 1, 9]

    def test_files_and_pattern_filters(self, spark, tmp_path, target):
        _land(spark, tmp_path, "x1.parquet", [(1, "x")])
        _land(spark, tmp_path, "x2.parquet", [(2, "x")])
        _land(spark, tmp_path, "y1.parquet", [(3, "y")])
        src = str(tmp_path / "landing")
        m = target.copy_into(src, files=["x1.parquet"])
        assert m["num_loaded_files"] == 1
        m = target.copy_into(src, pattern="x*.parquet")
        assert m["num_loaded_files"] == 1  # x1 already in, x2 new
        got = sorted(r["k"] for r in target.to_df().collect())
        assert got == [0, 1, 2]

    def test_force_reloads(self, spark, tmp_path, target):
        _land(spark, tmp_path, "a.parquet", [(1, "a")])
        src = str(tmp_path / "landing")
        target.copy_into(src)
        m = target.copy_into(src, force=True)
        assert m["num_loaded_files"] == 1
        assert target.to_df().count() == 3  # seed + 1 + 1 (forced dup)

    def test_schema_mismatch_fails_before_commit(
        self, spark, tmp_path, target
    ):
        tmp = str(tmp_path / "_bad")
        spark.createDataFrame(
            [("no", "ints")], "a string, b string"
        ).coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(
            f for f in os.listdir(tmp) if f.endswith(".parquet")
        )
        os.makedirs(tmp_path / "landing", exist_ok=True)
        shutil.copyfile(
            os.path.join(tmp, part),
            str(tmp_path / "landing" / "bad.parquet"),
        )
        v0 = target.snapshot().version
        with pytest.raises(DeltaProtocolError):
            target.copy_into(str(tmp_path / "landing"))
        assert target.snapshot().version == v0  # nothing landed

    def test_non_parquet_format_refused(self, spark, tmp_path, target):
        with pytest.raises(DeltaProtocolError, match="PARQUET"):
            target.copy_into(str(tmp_path), file_format="csv")


class TestCopyIntoSql:
    def test_sql_statement(self, spark, tmp_path, target):
        from mack_spark.sql_ddl import DeltaSqlSession

        _land(spark, tmp_path, "a.parquet", [(1, "a")])
        _land(spark, tmp_path, "b.parquet", [(2, "b")])
        src = str(tmp_path / "landing")
        sq = DeltaSqlSession(spark).register("t", target)
        r = sq.sql(
            f"COPY INTO t FROM '{src}' FILEFORMAT = PARQUET"
        ).collect()[0]
        assert r["num_loaded_files"] == 2
        assert r["num_inserted_rows"] == 2
        r2 = sq.sql(
            f"COPY INTO t FROM '{src}' FILEFORMAT = PARQUET"
        ).collect()[0]
        assert r2["num_loaded_files"] == 0
        assert r2["num_skipped_files"] == 2

    def test_sql_files_pattern_options(self, spark, tmp_path, target):
        from mack_spark.sql_ddl import DeltaSqlSession

        _land(spark, tmp_path, "a.parquet", [(1, "a")])
        src = str(tmp_path / "landing")
        sq = DeltaSqlSession(spark).register("t", target)
        r = sq.sql(
            f"COPY INTO t FROM '{src}' FILEFORMAT = PARQUET"
            " FILES = ('a.parquet')"
        ).collect()[0]
        assert r["num_loaded_files"] == 1
        r2 = sq.sql(
            f"COPY INTO t FROM '{src}' FILEFORMAT = PARQUET"
            " PATTERN = '*.parquet'"
            " COPY_OPTIONS ('force' = 'true')"
        ).collect()[0]
        assert r2["num_loaded_files"] == 1  # force reloads
