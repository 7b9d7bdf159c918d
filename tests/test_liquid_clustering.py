"""Liquid clustering (round 12): Delta writer feature ``clustering``
(delta PROTOCOL.md §Clustered Table; delta-spark's ``clusterBy``).
Clustering columns live in the ``delta.clustering`` domain metadata;
``optimize()`` on a clustered table re-clusters on them (Morton key —
the same machinery as ZORDER BY); ``set_cluster_by`` is the metadata-
only ALTER. The reference inherits this from delta-spark 3.x."""

import json
import os

import pytest

from pyspark.sql import functions as F

from mack_spark.sources.delta_log import (
    DeltaProtocolError,
    DeltaProtocolTable,
)


def _mk(spark, tmp_path, n=400, cluster=("k",)):
    df = spark.range(n).select(
        (F.col("id") * 37 % n).alias("k"),
        (F.col("id") % 13).alias("j"),
        F.col("id").alias("v"),
    ).repartition(4)
    return DeltaProtocolTable.create(
        spark, str(tmp_path / "t"), df, cluster_by=list(cluster)
    )


class TestClusteredCreate:
    def test_protocol_and_domain(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        snap = t.snapshot()
        feats = set(snap.protocol["writerFeatures"])
        assert {"clustering", "domainMetadata"} <= feats
        assert t.clustering_columns() == ["k"]
        cfg = json.loads(
            snap.domains["delta.clustering"]["configuration"]
        )
        assert cfg["clusteringColumns"] == [["k"]]

    def test_cluster_and_partition_exclusive(self, spark, tmp_path):
        df = spark.createDataFrame([(1, "a")], "k int, p string")
        with pytest.raises(DeltaProtocolError, match="mutually exclusive"):
            DeltaProtocolTable.create(
                spark, str(tmp_path / "x"), df,
                partition_by=["p"], cluster_by=["k"],
            )

    def test_unknown_clustering_column_refused(self, spark, tmp_path):
        df = spark.createDataFrame([(1,)], "k int")
        with pytest.raises(DeltaProtocolError, match="nope"):
            DeltaProtocolTable.create(
                spark, str(tmp_path / "y"), df, cluster_by=["nope"]
            )

    def test_domain_survives_checkpoint(self, spark, tmp_path):
        t = _mk(spark, tmp_path, n=50)
        t.append(spark.createDataFrame([(1, 1, 1)], "k long, j long, v long"))
        v = t.checkpoint()
        for i in range(v + 1):
            f = os.path.join(t.path, "_delta_log", "%020d.json" % i)
            if os.path.exists(f):
                os.unlink(f)
        assert DeltaProtocolTable(spark, t.path).clustering_columns() == ["k"]


class TestClusteredOptimize:
    def test_optimize_clusters_on_declared_columns(self, spark, tmp_path):
        t = _mk(spark, tmp_path, n=400)
        before = t.to_df().count()
        res = t.optimize(target_file_bytes=4 * 1024)
        assert res["rewritten"] > 0
        assert t.to_df().count() == before
        snap = t.snapshot()
        # single-column clustering = range layout: per-file [min, max]
        # key ranges must be pairwise disjoint, so a key predicate
        # prunes to one file
        ranges = []
        for p in snap.files:
            st = snap.file_stats(p)
            ranges.append((st["minValues"]["k"], st["maxValues"]["k"]))
        ranges.sort()
        assert len(ranges) > 1, "expected a multi-file re-cluster"
        for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
            assert hi1 <= lo2, f"overlapping ranges {hi1} vs {lo2}"
        # dataChange: false on every action (streams skip the commit)
        acts = t._commit_actions(snap.version)
        for a in acts:
            for kind in ("add", "remove"):
                if kind in a:
                    assert a[kind].get("dataChange") is False

    def test_incremental_recluster_skips_clustered_files(
        self, spark, tmp_path
    ):
        # liquid OPTIMIZE is INCREMENTAL: files a clustering pass wrote
        # (tagged clusteringProvider=liquid) and right-sized stay
        # untouched — inode-pinned; only the appended tail is rewritten
        t = _mk(spark, tmp_path, n=400)
        t.optimize(target_file_bytes=16 * 1024, min_file_bytes=1)
        snap1 = t.snapshot()
        clustered = {
            p: os.stat(os.path.join(t.path, p)).st_ino
            for p in snap1.files
        }
        assert all(
            (a.get("tags") or {}).get("clusteringProvider") == "liquid"
            for a in snap1.files.values()
        )
        t.append(spark.createDataFrame(
            [(1, 1, 1), (2, 2, 2)], "k long, j long, v long"
        ))
        n_untagged = sum(
            1 for a in t.snapshot().files.values()
            if (a.get("tags") or {}).get("clusteringProvider") != "liquid"
        )
        assert n_untagged >= 1
        res = t.optimize(target_file_bytes=16 * 1024, min_file_bytes=1)
        assert res["rewritten"] == n_untagged  # only the appended tail
        snap2 = t.snapshot()
        for p, ino in clustered.items():
            assert p in snap2.files, f"clustered file {p} was rewritten"
            assert os.stat(os.path.join(t.path, p)).st_ino == ino
        # third pass: nothing new → no-op
        res3 = t.optimize(target_file_bytes=16 * 1024, min_file_bytes=1)
        assert res3["rewritten"] == 0
        assert res3["version"] == snap2.version

    def test_tags_survive_checkpoint(self, spark, tmp_path):
        t = _mk(spark, tmp_path, n=100)
        t.optimize(target_file_bytes=16 * 1024, min_file_bytes=1)
        v = t.checkpoint()
        for i in range(v + 1):
            f = os.path.join(t.path, "_delta_log", "%020d.json" % i)
            if os.path.exists(f):
                os.unlink(f)
        t2 = DeltaProtocolTable(spark, t.path)
        # provenance survived the replay: a fresh optimize is a no-op
        res = t2.optimize(target_file_bytes=16 * 1024, min_file_bytes=1)
        assert res["rewritten"] == 0

    def test_explicit_zorder_overrides_clustering(self, spark, tmp_path):
        t = _mk(spark, tmp_path, n=100)
        res = t.optimize(target_file_bytes=4 * 1024, zorder_by=["j"])
        assert res["rewritten"] > 0
        snap = t.snapshot()
        ranges = []
        for p in snap.files:
            st = snap.file_stats(p)
            ranges.append((st["minValues"]["j"], st["maxValues"]["j"]))
        ranges.sort()
        for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
            assert hi1 <= lo2


class TestClusterByAlter:
    def test_set_cluster_by_on_plain_table(self, spark, tmp_path):
        df = spark.range(20).select(
            F.col("id").alias("k"), (F.col("id") % 3).alias("v")
        )
        t = DeltaProtocolTable.create(spark, str(tmp_path / "t"), df)
        assert t.clustering_columns() == []
        t.set_cluster_by(["k"])
        assert t.clustering_columns() == ["k"]
        feats = set(t.snapshot().protocol["writerFeatures"])
        assert {"clustering", "domainMetadata"} <= feats

    def test_cluster_by_none(self, spark, tmp_path):
        t = _mk(spark, tmp_path, n=30)
        t.set_cluster_by([])
        assert t.clustering_columns() == []

    def test_partitioned_table_refuses_cluster_by(self, spark, tmp_path):
        df = spark.createDataFrame([(1, "a")], "k int, p string")
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / "p"), df, partition_by=["p"]
        )
        with pytest.raises(DeltaProtocolError, match="partitioned"):
            t.set_cluster_by(["k"])

    def test_unknown_column_refused(self, spark, tmp_path):
        t = _mk(spark, tmp_path, n=10)
        with pytest.raises(DeltaProtocolError, match="zzz"):
            t.set_cluster_by(["zzz"])

    def test_foreign_clustered_table_writable(self, spark, tmp_path):
        t = _mk(spark, tmp_path, n=10)
        t2 = DeltaProtocolTable(spark, t.path)
        t2.append(spark.createDataFrame(
            [(5, 5, 5)], "k long, j long, v long"
        ))
        assert t2.to_df().count() == 11
