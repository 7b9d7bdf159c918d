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


# ---------------------------------------------------------------- file-pruned
# merge_overwrite(touched_keys=...) on UNPARTITIONED tables: per-file
# min/max footer stats pick the files a touched key can live in; the
# rest are hard-linked (same inode) into the new snapshot.


def _snapshot_files(table):
    snap = table._snapshot_dir()
    return {
        n: os.stat(os.path.join(snap, n)).st_ino
        for n in os.listdir(snap)
        if n.endswith(".parquet") and not n.startswith(("_", "."))
    }


def _ranged_table(spark, path, n=100, files=4):
    df = (
        spark.range(n)
        .select(
            F.col("id").cast("int").alias("pkey"),
            F.concat(F.lit("v"), F.col("id")).alias("attr"),
        )
        .repartitionByRange(files, "pkey")
        .sortWithinPartitions("pkey")
    )
    return ManagedTable.create(spark, str(path), df=df)


def test_file_pruned_scd2_links_untouched_files(spark, tmp_path):
    table = _ranged_table(spark, tmp_path / "t")
    before = _snapshot_files(table)
    assert len(before) == 4

    updates = spark.createDataFrame(
        [(5, "A2", None)], "pkey int, attr string, effective_time timestamp"
    ).withColumn("effective_time", F.to_timestamp(F.lit("2021-06-01")))
    base = table.toDF().select(
        "pkey", "attr",
        F.lit(True).alias("is_current"),
        F.to_timestamp(F.lit("2020-01-01")).alias("effective_time"),
        F.lit(None).cast("timestamp").alias("end_time"),
    )
    table.overwrite(base, operation="WRITE")
    # overwrite rewrote everything; re-cluster by key so file ranges are
    # disjoint again, then snapshot inodes
    table.overwrite(
        table.toDF().repartitionByRange(4, "pkey").sortWithinPartitions("pkey"),
        operation="WRITE",
    )
    before = _snapshot_files(table)
    assert len(before) == 4

    mk.type_2_scd_generic_upsert(
        table, updates, "pkey", ["attr"],
        "is_current", "effective_time", "end_time",
    )

    after = _snapshot_files(table)
    shared = set(before.values()) & set(after.values())
    # key 5 lives in exactly one of the four range files: the other
    # three must be hard links of the previous snapshot's files
    assert len(shared) == 3, (before, after)

    out = table.toDF()
    assert out.count() == 101  # 100 rows + one closed version
    s = {(r["attr"], r["is_current"]) for r in out.filter("pkey = 5").collect()}
    assert s == {("v5", False), ("A2", True)}


def test_file_pruned_drop_duplicates_pkey(spark, tmp_path):
    df = (
        spark.range(100)
        .select(
            F.col("id").cast("int").alias("pkey"),
            (F.col("id") % 50).cast("int").alias("c1"),
        )
    )
    # duplicate c1 groups: each c1 value appears twice (pkey k and k+50)
    clustered = df.repartitionByRange(4, "c1").sortWithinPartitions("c1")
    table = ManagedTable.create(spark, str(tmp_path / "dd"), df=clustered)
    before = _snapshot_files(table)

    mk.drop_duplicates_pkey(table, "pkey", ["c1"])

    out = table.toDF()
    assert out.count() == 50
    assert out.agg(F.max("pkey")).collect()[0][0] == 49  # min-pkey survivors
    # every file had duplicates (c1 values repeat everywhere), so this
    # asserts only correctness; the pruning assertion is the disjoint
    # case below


def test_file_pruned_out_of_range_insert_survives(spark, tmp_path):
    table = _ranged_table(spark, tmp_path / "oor")
    base = table.toDF().select(
        "pkey", "attr",
        F.lit(True).alias("is_current"),
        F.to_timestamp(F.lit("2020-01-01")).alias("effective_time"),
        F.lit(None).cast("timestamp").alias("end_time"),
    ).repartitionByRange(4, "pkey").sortWithinPartitions("pkey")
    table.overwrite(base, operation="WRITE")
    before = _snapshot_files(table)

    # key 1000 is beyond every file's max: the insert must land in the
    # rewrite region even though no existing file range contains it
    updates = spark.createDataFrame(
        [(1000, "NEW", None)], "pkey int, attr string, effective_time timestamp"
    ).withColumn("effective_time", F.to_timestamp(F.lit("2021-06-01")))
    mk.type_2_scd_generic_upsert(
        table, updates, "pkey", ["attr"],
        "is_current", "effective_time", "end_time",
    )
    out = table.toDF()
    assert out.count() == 101
    assert out.filter("pkey = 1000").count() == 1
    # no base file contained key 1000 -> ALL base files stay hard-linked
    after = _snapshot_files(table)
    assert set(before.values()) <= set(after.values())


def test_file_pruned_matches_full_rewrite(spark, tmp_path):
    from mack_spark.dedup import drop_duplicates_pkey_post

    df = (
        spark.range(60)
        .select(
            F.col("id").cast("int").alias("pkey"),
            F.when(F.col("id") < 3, 0).otherwise(F.col("id")).cast("int").alias("c1"),
        )
        .repartitionByRange(3, "pkey")
    )
    pruned = ManagedTable.create(spark, str(tmp_path / "fp"), df=df)
    full = ManagedTable.create(spark, str(tmp_path / "ff"), df=df)

    mk.drop_duplicates_pkey(pruned, "pkey", ["c1"])
    full.merge_overwrite(
        drop_duplicates_pkey_post(full.toDF(), ["pkey"], ["c1"]),
        operation="MERGE-DELETE",
    )
    assert_df_equality(
        pruned.toDF().orderBy("pkey"), full.toDF().orderBy("pkey")
    )


def test_file_pruned_merge_string_key(spark, tmp_path):
    """String-typed merge keys: footer min/max are strings; range
    pruning and the rewrite filter must behave identically."""
    df = (
        spark.range(90)
        .select(
            F.concat(F.lit("cust-"), F.lpad(F.col("id").cast("string"), 4, "0")).alias("ckey"),
            (F.col("id") % 45).cast("int").alias("grp"),
            F.col("id").cast("int").alias("pkey"),
        )
        .repartitionByRange(3, "ckey")
        .sortWithinPartitions("ckey")
    )
    pruned = ManagedTable.create(spark, str(tmp_path / "sp"), df=df)
    full = ManagedTable.create(spark, str(tmp_path / "sf"), df=df)

    # delete the rows of three specific string keys
    doomed = spark.createDataFrame(
        [("cust-0003",), ("cust-0004",), ("cust-0088",)], "ckey string"
    )
    post_p = pruned.toDF().join(doomed, "ckey", "left_anti")
    post_f = full.toDF().join(doomed, "ckey", "left_anti")
    before = _snapshot_files(pruned)
    pruned.merge_overwrite(
        post_p, operation="MERGE-DELETE", touched_keys=("ckey", doomed)
    )
    full.merge_overwrite(post_f, operation="MERGE-DELETE")
    assert_df_equality(
        pruned.toDF().orderBy("ckey"), full.toDF().orderBy("ckey")
    )
    # keys hit files 1 and 3 of 3; the middle file must be hard-linked
    after = _snapshot_files(pruned)
    assert len(set(before.values()) & set(after.values())) == 1


def test_file_pruned_refuses_statless_file(spark, tmp_path):
    """A file with suppressed footer stats voids the disjointness
    closure: pruning must fall back to the full overwrite instead of
    silently dropping that file's rows whose keys sit inside an
    untouched file's [min,max] interval."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = (
        spark.createDataFrame(
            [(i, f"v{i}") for i in list(range(10)) + list(range(15, 36))],
            "pkey int, attr string",
        )
        .repartitionByRange(2, "pkey")
        .sortWithinPartitions("pkey")
    )
    table = ManagedTable.create(spark, str(tmp_path / "nostat"), df=df)

    # plant a file whose keys (20-29) sit INSIDE the second spark file's
    # [15,35] range but whose footer carries no statistics
    snap = table._snapshot_dir()
    planted = pa.table(
        {
            "pkey": pa.array(range(20, 30), pa.int32()),
            "attr": pa.array([f"x{i}" for i in range(20, 30)]),
        }
    )
    pq.write_table(
        planted,
        os.path.join(snap, "part-nostats.parquet"),
        write_statistics=False,
    )
    assert table.toDF().count() == 41

    # touch key 0 only: broken pruning would mark the planted file
    # "touched" rangelessly and its 10 rows would vanish from the
    # rewrite region while never being hard-linked
    doomed = spark.createDataFrame([(0,)], "pkey int")
    post = table.toDF().join(doomed, "pkey", "left_anti")
    before = _snapshot_files(table)
    table.merge_overwrite(
        post, operation="MERGE-DELETE", touched_keys=("pkey", doomed)
    )
    out = table.toDF()
    assert out.count() == 40
    assert out.filter(F.col("pkey").between(20, 29)).count() == 20
    # the fallback is a full rewrite: no previous-snapshot hard links
    after = _snapshot_files(table)
    assert not (set(before.values()) & set(after.values()))
