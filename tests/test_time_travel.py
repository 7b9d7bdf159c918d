"""Retained snapshots: time travel + RESTORE under the
``mack.retain_snapshots`` table property (VERDICT r2 "what's missing"
item 2 — the reference inherits real versioned reads from Delta's log,
reference mack/__init__.py:616-627; the stand-in retains the last N
replaced snapshot dirs, hard-link-cheap)."""

import pytest
from pyspark.sql import functions as F

import mack_spark as mk
from mack_spark.tables import ManagedTable


def _mk(spark, tmp_path, retain=2):
    df = spark.createDataFrame([(1, "v0")], "id int, v string")
    return ManagedTable.create(
        spark, str(tmp_path / "tt"), df,
        properties={"mack.retain_snapshots": str(retain)},
    )


def test_time_travel_reads_replaced_snapshots(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.overwrite(spark.createDataFrame([(1, "v1")], "id int, v string"))
    t.overwrite(spark.createDataFrame([(1, "v2")], "id int, v string"))
    assert t.toDF().collect()[0].v == "v2"
    assert t.toDF(version=0).collect()[0].v == "v0"
    assert t.toDF(version=1).collect()[0].v == "v1"
    # current version is also addressable explicitly
    assert t.toDF(version=2).collect()[0].v == "v2"


def test_retention_trims_oldest(spark, tmp_path):
    t = _mk(spark, tmp_path, retain=1)
    t.overwrite(spark.createDataFrame([(1, "v1")], "id int, v string"))
    t.overwrite(spark.createDataFrame([(1, "v2")], "id int, v string"))
    # only the last replaced snapshot (v1) is retained; v0 is gone
    assert t.toDF(version=1).collect()[0].v == "v1"
    with pytest.raises(ValueError, match="not retained"):
        t.toDF(version=0)


def test_no_retention_by_default(spark, tmp_path):
    df = spark.createDataFrame([(1, "v0")], "id int, v string")
    t = ManagedTable.create(spark, str(tmp_path / "nr"), df)
    t.overwrite(spark.createDataFrame([(1, "v1")], "id int, v string"))
    with pytest.raises(ValueError, match="not retained"):
        t.toDF(version=0)


def test_restore_commits_forward(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.overwrite(spark.createDataFrame([(1, "v1")], "id int, v string"))
    t.restore(0)
    assert t.toDF().collect()[0].v == "v0"
    # restore is a new version, not an undo: history moved forward
    assert mk.latest_version(t) == 2
    assert "RESTORE VERSION AS OF 0" in [h["operation"] for h in t.history()]
    # and the pre-restore content is itself retained
    assert t.toDF(version=1).collect()[0].v == "v1"


def test_merge_paths_respect_retention(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "pkey int, c1 string"
    )
    t = ManagedTable.create(
        spark, str(tmp_path / "mr"), df,
        properties={"mack.retain_snapshots": "2"},
    )
    mk.kill_duplicates(t, ["c1"])
    assert t.toDF().count() == 1
    assert t.toDF(version=0).count() == 3


def test_compact_sort_by_clusters_for_pruning(spark, tmp_path):
    from mack_spark.tables import optimize_compact

    df = spark.range(100).select(
        F.col("id").cast("int").alias("pkey"),
        F.concat(F.lit("x"), F.col("id")).alias("v"),
    ).repartition(8)
    t = ManagedTable.create(spark, str(tmp_path / "cs"), df)
    out = optimize_compact(t, target_file_bytes=1, sort_by=["pkey"])
    assert out["files_after"] >= 2
    # footer ranges must now be disjoint: per-file min/max don't overlap
    stats = t._file_key_stats(t._data_files(), "pkey")
    ivs = sorted(v[:2] for v in stats.values() if v is not None)
    assert len(ivs) == len(stats)
    for (alo, ahi), (blo, bhi) in zip(ivs, ivs[1:]):
        assert ahi < blo, ivs


def test_vacuum_removes_orphans_keeps_live(spark, tmp_path):
    import os

    t = _mk(spark, tmp_path, retain=1)
    t.overwrite(spark.createDataFrame([(1, "v1")], "id int, v string"))
    # fabricate crash debris: an orphan snapshot dir and a stale staging dir
    os.makedirs(os.path.join(t.path, "v=99-deadbeef"))
    os.makedirs(os.path.join(t.path, ".staging-deadbeef"))
    doomed = mk.vacuum(t, dry_run=True)
    # debris dirs plus the marker of the committed overwrite (markers
    # for durably committed versions are prunable — see _claim_version)
    assert {os.path.basename(d) for d in doomed} == {
        "v=99-deadbeef",
        ".staging-deadbeef",
        "v00000000000000000001.commit",
    }
    mk.vacuum(t)
    names = set(os.listdir(t.path))
    assert "v=99-deadbeef" not in names and ".staging-deadbeef" not in names
    assert os.listdir(os.path.join(t.path, "_commits")) == []
    # live current + retained snapshots still readable
    assert t.toDF().collect()[0].v == "v1"
    assert t.toDF(version=0).collect()[0].v == "v0"


def test_shallow_clone_is_zero_copy_and_independent(spark, tmp_path):
    import os

    src_df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "id int, v string"
    )
    src = ManagedTable.create(
        spark, str(tmp_path / "src"), src_df,
        properties={"team": "x"}, partition_by=None,
    )
    clone = mk.shallow_clone(src, str(tmp_path / "clone"))
    # zero-copy: every clone file shares an inode with a source file
    src_inodes = {os.stat(f).st_ino for f in src._data_files()}
    clone_inodes = {os.stat(f).st_ino for f in clone._data_files()}
    assert clone_inodes <= src_inodes and clone_inodes
    assert clone.toDF().count() == 10
    assert clone.detail()["properties"]["team"] == "x"
    assert mk.latest_version(clone) == 0
    # independence: mutate the clone, source unchanged; delete source,
    # clone still readable (inode refcounting keeps shared bytes alive)
    mk.kill_duplicates(clone, ["v"])  # no dups -> no-op content, new version
    clone.append(spark.createDataFrame([(99, "new")], "id int, v string"))
    assert src.toDF().count() == 10
    import shutil as _sh
    _sh.rmtree(src.path)
    assert clone.toDF().count() == 11


def test_table_changes_insert_delete(spark, tmp_path):
    t = _mk(spark, tmp_path, retain=3)
    t.overwrite(spark.createDataFrame([(1, "v0"), (2, "x")], "id int, v string"))
    t.overwrite(spark.createDataFrame([(2, "x"), (3, "y")], "id int, v string"))
    ch = mk.table_changes(t, from_version=1).orderBy("id", "_change_type")
    rows = [(r.id, r.v, r._change_type) for r in ch.collect()]
    assert rows == [(1, "v0", "delete"), (3, "y", "insert")]
    # explicit endpoints: v0 [(1,v0)] -> v1 [(1,v0),(2,x)] = one insert
    ch2 = mk.table_changes(t, from_version=0, to_version=1)
    got = {(r.id, r.v, r._change_type) for r in ch2.collect()}
    assert got == {(2, "x", "insert")}


def test_partitioned_pruned_merge_respects_retention(spark, tmp_path):
    """The partition-pruned merge path routes through the same retention
    planner: the replaced snapshot stays readable, and its hard-linked
    untouched partitions are intact in both versions."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "A", "s1"), (2, "B", "s2")], "pkey int, attr string, seg string"
    )
    t = ManagedTable.create(
        spark, str(tmp_path / "pr"), df, partition_by=["seg"],
        properties={"mack.retain_snapshots": "2"},
    )
    post = t.toDF().withColumn(
        "attr", F.when(F.col("seg") == "s1", F.lit("A2")).otherwise(F.col("attr"))
    )
    t.merge_overwrite(post, operation="MERGE", touched_partitions=[{"seg": "s1"}])
    assert {(r.pkey, r.attr) for r in t.toDF().collect()} == {(1, "A2"), (2, "B")}
    assert {(r.pkey, r.attr) for r in t.toDF(version=0).collect()} == {
        (1, "A"), (2, "B"),
    }
