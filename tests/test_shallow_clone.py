"""SHALLOW CLONE (round 12): delta-spark's zero-copy clone — a new log
whose adds reference the source's data files by ABSOLUTE path (the spec
allows absolute add.path). O(metadata) at any size; mutations stay
local to the clone; VACUUM walks only the clone root so source files
are never reclaimed from the clone side."""

import glob
import os

import pytest

from mack_spark.sources.delta_log import DeltaProtocolTable


def _mk_src(spark, tmp_path, n=20, **kw):
    df = spark.createDataFrame(
        [(i, f"k{i}", "even" if i % 2 == 0 else "odd") for i in range(n)],
        "pk int, name string, par string",
    ).repartition(2)
    return DeltaProtocolTable.create(
        spark, str(tmp_path / "src"), df, **kw
    )


def _parquet_under(root):
    return [
        p for p in glob.glob(os.path.join(root, "**", "*.parquet"),
                             recursive=True)
        if "_delta_log" not in p
    ]


class TestShallowClone:
    def test_zero_copy_same_data(self, spark, tmp_path):
        src = _mk_src(spark, tmp_path)
        c = DeltaProtocolTable.shallow_clone(
            spark, src.path, str(tmp_path / "clone"))
        assert sorted(r["pk"] for r in c.to_df().collect()) == list(range(20))
        # zero copy: no data files under the clone root
        assert _parquet_under(c.path) == []
        # every add is an absolute reference into the source
        for p in c.snapshot().files:
            assert os.path.isabs(p)
            assert p.startswith(os.path.abspath(src.path))

    def test_mutations_stay_local(self, spark, tmp_path):
        src = _mk_src(spark, tmp_path)
        src_inodes = {
            p: os.stat(p).st_ino for p in _parquet_under(src.path)
        }
        c = DeltaProtocolTable.shallow_clone(
            spark, src.path, str(tmp_path / "clone"))
        c.delete_where("pk < 5")
        c.append(spark.createDataFrame(
            [(100, "x", "even")], "pk int, name string, par string"))
        # clone sees its own state
        got = sorted(r["pk"] for r in c.to_df().collect())
        assert got == list(range(5, 20)) + [100]
        # the source is untouched — same files, same data
        assert {
            p: os.stat(p).st_ino for p in _parquet_under(src.path)
        } == src_inodes
        assert DeltaProtocolTable(spark, src.path).to_df().count() == 20
        # the append landed under the clone root
        assert len(_parquet_under(c.path)) >= 1

    def test_source_writes_do_not_leak_into_clone(self, spark, tmp_path):
        src = _mk_src(spark, tmp_path)
        c = DeltaProtocolTable.shallow_clone(
            spark, src.path, str(tmp_path / "clone"))
        src.append(spark.createDataFrame(
            [(999, "z", "odd")], "pk int, name string, par string"))
        assert c.to_df().count() == 20  # the clone is a snapshot

    def test_vacuum_never_reclaims_source_files(self, spark, tmp_path):
        src = _mk_src(spark, tmp_path)
        c = DeltaProtocolTable.shallow_clone(
            spark, src.path, str(tmp_path / "clone"))
        # make every source reference dead in the clone, then vacuum
        c.overwrite(spark.createDataFrame(
            [(1, "a", "odd")], "pk int, name string, par string"))
        reclaimed = c.vacuum(retention_hours=0.0)
        assert all(not os.path.isabs(r) for r in reclaimed)
        assert DeltaProtocolTable(spark, src.path).to_df().count() == 20

    def test_clone_dv_table(self, spark, tmp_path):
        src = _mk_src(
            spark, tmp_path,
            properties={"delta.enableDeletionVectors": "true"},
        )
        src.delete_where("pk % 4 = 0")
        c = DeltaProtocolTable.shallow_clone(
            spark, src.path, str(tmp_path / "clone"))
        assert sorted(r["pk"] for r in c.to_df().collect()) == [
            i for i in range(20) if i % 4 != 0]
        # descriptors rewritten to absolute 'p' storage
        dvs = [a["deletionVector"] for a in c.snapshot().files.values()
               if a.get("deletionVector")]
        assert dvs and all(
            d["storageType"] == "p" and os.path.isabs(d["pathOrInlineDv"])
            for d in dvs
        )

    def test_partitioned_clone(self, spark, tmp_path):
        src = _mk_src(spark, tmp_path, partition_by=["par"])
        c = DeltaProtocolTable.shallow_clone(
            spark, src.path, str(tmp_path / "clone"))
        rows = c.to_df().collect()
        assert len(rows) == 20
        assert {r["par"] for r in rows} == {"even", "odd"}

    def test_domains_carry_over_txns_do_not(self, spark, tmp_path):
        src = _mk_src(spark, tmp_path, cluster_by=["pk"])
        src.append(
            spark.createDataFrame(
                [(50, "t", "even")], "pk int, name string, par string"),
            txn_app_id="app-1", txn_version=9,
        )
        c = DeltaProtocolTable.shallow_clone(
            spark, src.path, str(tmp_path / "clone"))
        assert c.clustering_columns() == ["pk"]
        assert c.latest_txn_version("app-1") is None

    def test_clone_existing_destination_refused(self, spark, tmp_path):
        src = _mk_src(spark, tmp_path)
        DeltaProtocolTable.shallow_clone(
            spark, src.path, str(tmp_path / "clone"))
        with pytest.raises(FileExistsError):
            DeltaProtocolTable.shallow_clone(
                spark, src.path, str(tmp_path / "clone"))

    def test_stream_and_cdf_from_clone(self, spark, tmp_path):
        # the streaming source resolves absolute add paths, and a
        # clone's version-0 CLONE commit derives exactly as inserts
        # under CDF (same as CTAS)
        from mack_spark.streaming.delta_source import register

        register(spark)
        src = _mk_src(
            spark, tmp_path, n=6,
            properties={"delta.enableChangeDataFeed": "true"},
        )
        c = DeltaProtocolTable.shallow_clone(
            spark, src.path, str(tmp_path / "clone"))
        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        q = (
            spark.readStream.format("delta_protocol")
            .option("path", c.path).load()
            .writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        assert spark.read.parquet(out).count() == 6
        ch = c.table_changes(0, 0)
        assert ch.count() == 6
        assert {r["_change_type"] for r in ch.collect()} == {"insert"}

    def test_restore_and_time_travel_in_clone(self, spark, tmp_path):
        src = _mk_src(spark, tmp_path)
        c = DeltaProtocolTable.shallow_clone(
            spark, src.path, str(tmp_path / "clone"))
        c.delete_where("pk >= 10")
        assert c.to_df().count() == 10
        c.restore(0)
        assert c.to_df().count() == 20
