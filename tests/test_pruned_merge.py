"""Partition-pruned merge: merge_overwrite(touched_partitions=...) must
rewrite ONLY the touched partitions (untouched partition files are
hard-linked from the previous snapshot, byte-identical and job-free)
while producing exactly the same table contents as a full rewrite."""

import os

from pyspark.sql import functions as F

import mack_spark as mk
from mack_spark.tables import ManagedTable

from conftest import assert_df_equality

SCHEMA = "pkey int, attr string, seg string, is_current boolean, effective_time timestamp, end_time timestamp"


def _partition_files(table, seg):
    snap = table._snapshot_dir()
    d = os.path.join(snap, f"seg={seg}")
    return sorted(
        (n, os.stat(os.path.join(d, n)).st_ino)
        for n in os.listdir(d)
        if n.endswith(".parquet")
    )


def _base_rows(spark):
    return spark.createDataFrame(
        [
            (1, "A", "s1", True, None, None),
            (2, "B", "s2", True, None, None),
            (3, "C", "s3", True, None, None),
        ],
        SCHEMA,
    ).withColumn("effective_time", F.to_timestamp(F.lit("2020-01-01")))


def test_pruned_merge_links_untouched_partitions(spark, tmp_path):
    table = ManagedTable.create(
        spark, str(tmp_path / "dim"), df=_base_rows(spark), partition_by=["seg"]
    )
    before_s2 = _partition_files(table, "s2")
    before_s3 = _partition_files(table, "s3")

    updates = spark.createDataFrame(
        [(1, "A2", "s1", None)],
        "pkey int, attr string, seg string, effective_time timestamp",
    ).withColumn("effective_time", F.to_timestamp(F.lit("2021-06-01")))
    mk.type_2_scd_generic_upsert(
        table, updates, "pkey", ["attr", "seg"],
        "is_current", "effective_time", "end_time",
    )

    # Untouched partitions survived as the same files (hard links, not a
    # rewrite — Spark generates fresh random file names on any rewrite).
    assert _partition_files(table, "s2") == before_s2
    assert _partition_files(table, "s3") == before_s3

    out = table.toDF()
    assert out.count() == 4  # closed v1 + new current + 2 untouched
    s1 = {(r["attr"], r["is_current"]) for r in out.filter("seg = 's1'").collect()}
    assert s1 == {("A", False), ("A2", True)}


def test_pruned_merge_matches_full_rewrite(spark, tmp_path):
    df = _base_rows(spark)
    pruned = ManagedTable.create(spark, str(tmp_path / "p"), df=df, partition_by=["seg"])
    full = ManagedTable.create(spark, str(tmp_path / "f"), df=df, partition_by=["seg"])

    updates = spark.createDataFrame(
        [(2, "B2", "s2", None), (9, "NEW", "s9", None)],
        "pkey int, attr string, seg string, effective_time timestamp",
    ).withColumn("effective_time", F.to_timestamp(F.lit("2021-06-01")))

    mk.type_2_scd_generic_upsert(
        pruned, updates, "pkey", ["attr", "seg"],
        "is_current", "effective_time", "end_time",
    )
    # Same post-state committed without the pruning hint.
    from mack_spark.scd import scd2_post_state

    post = scd2_post_state(
        full.toDF(), updates, "pkey", ["attr", "seg"],
        "is_current", "effective_time", "end_time",
    )
    full.merge_overwrite(post, operation="MERGE")

    cols = ["pkey", "attr", "seg", "is_current", "effective_time", "end_time"]
    assert_df_equality(
        pruned.toDF().select(*cols).orderBy("pkey", "is_current"),
        full.toDF().select(*cols).orderBy("pkey", "is_current"),
    )


def test_pruned_merge_handles_deleted_partition(spark, tmp_path):
    # A touched partition whose post-state has no rows simply vanishes.
    t = ManagedTable.create(
        spark,
        str(tmp_path / "d"),
        df=spark.createDataFrame([(1, "s1"), (2, "s2")], "id int, seg string"),
        partition_by=["seg"],
    )
    post = t.toDF().filter("seg <> 's1'")
    t.merge_overwrite(post, operation="DELETE", touched_partitions=[{"seg": "s1"}])
    assert [r["seg"] for r in t.toDF().collect()] == ["s2"]
