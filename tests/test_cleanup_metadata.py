"""Metadata cleanup (round 12): Delta's delta.logRetentionDuration —
log entries below the latest checkpoint AND past retention are
deleted; the checkpoint alone reconstructs surviving versions; time
travel to cleaned versions fails loudly (Delta's documented
contract)."""

import os

import pytest

from mack_spark.sources.delta_log import (
    CHECKPOINT_INTERVAL,
    DeltaProtocolError,
    DeltaProtocolTable,
    _parse_interval_hours,
)


def _mk(spark, tmp_path, n_commits, **props):
    df = spark.createDataFrame([(0, "seed")], "pk int, attr string")
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "t"), df,
        properties=props or None,
    )
    for i in range(1, n_commits):
        t.append(spark.createDataFrame(
            [(i, f"v{i}")], "pk int, attr string"
        ))
    return t


def _log_files(t):
    return sorted(os.listdir(os.path.join(t.path, "_delta_log")))


class TestParseInterval:
    def test_units(self):
        assert _parse_interval_hours("interval 30 days") == 720.0
        assert _parse_interval_hours("interval 12 hours") == 12.0
        assert _parse_interval_hours("INTERVAL 1 week") == 168.0
        assert _parse_interval_hours("interval 90 minutes") == 1.5

    def test_bad_literal_refused(self):
        with pytest.raises(DeltaProtocolError, match="interval"):
            _parse_interval_hours("30d")


class TestCleanupMetadata:
    def test_expired_json_below_checkpoint_deleted(self, spark, tmp_path):
        t = _mk(spark, tmp_path, CHECKPOINT_INTERVAL + 3)
        v = t.snapshot().version
        assert v > CHECKPOINT_INTERVAL
        gone = t.cleanup_metadata(retention_hours=0.0)
        # r13: version checksum sidecars expire alongside their commits
        assert [f for f in gone if f.endswith(".json")] == [
            "%020d.json" % i for i in range(CHECKPOINT_INTERVAL)
        ]
        assert [f for f in gone if f.endswith(".crc")] == [
            "%020d.crc" % i for i in range(CHECKPOINT_INTERVAL)
        ]
        # state fully reconstructs from the checkpoint + JSON tail
        t2 = DeltaProtocolTable(spark, t.path)
        assert t2.to_df().count() == CHECKPOINT_INTERVAL + 3
        # and the table keeps working
        t2.append(spark.createDataFrame([(99, "z")], "pk int, attr string"))
        assert t2.to_df().count() == CHECKPOINT_INTERVAL + 4

    def test_time_travel_to_cleaned_version_fails(self, spark, tmp_path):
        t = _mk(spark, tmp_path, CHECKPOINT_INTERVAL + 1)
        t.cleanup_metadata(retention_hours=0.0)
        with pytest.raises(DeltaProtocolError):
            DeltaProtocolTable(spark, t.path).to_df(version_as_of=2).collect()

    def test_retention_keeps_recent(self, spark, tmp_path):
        t = _mk(spark, tmp_path, CHECKPOINT_INTERVAL + 1)
        before = _log_files(t)
        assert t.cleanup_metadata(retention_hours=1.0) == []
        assert _log_files(t) == before

    def test_no_checkpoint_is_noop(self, spark, tmp_path):
        t = _mk(spark, tmp_path, 3)
        assert t.cleanup_metadata(retention_hours=0.0) == []

    def test_dry_run(self, spark, tmp_path):
        t = _mk(spark, tmp_path, CHECKPOINT_INTERVAL + 1)
        before = _log_files(t)
        would = t.cleanup_metadata(retention_hours=0.0, dry_run=True)
        assert would and _log_files(t) == before

    def test_v2_sidecars_referenced_kept_orphans_reclaimed(
        self, spark, tmp_path
    ):
        t = _mk(spark, tmp_path, 3,
                **{"delta.checkpointPolicy": "v2"})
        t.checkpoint()           # sidecar A (superseded below)
        t.append(spark.createDataFrame([(50, "x")], "pk int, attr string"))
        t.checkpoint()           # sidecar B (live)
        sidecars = os.listdir(os.path.join(t.path, "_delta_log", "_sidecars"))
        assert len(sidecars) == 2
        gone = t.cleanup_metadata(retention_hours=0.0)
        assert any(g.startswith("_sidecars/") for g in gone)
        left = os.listdir(os.path.join(t.path, "_delta_log", "_sidecars"))
        assert len(left) == 1
        # the surviving checkpoint still replays
        for f in _log_files(t):
            if f.endswith(".json"):
                os.unlink(os.path.join(t.path, "_delta_log", f))
        assert DeltaProtocolTable(spark, t.path).to_df().count() == 4

    def test_config_driven_retention(self, spark, tmp_path):
        # with a 0-hour retention config the checkpoint at v10 already
        # auto-expired the old JSONs (enableExpiredLogCleanup defaults
        # true); the explicit call then has nothing left to do
        t = _mk(spark, tmp_path, CHECKPOINT_INTERVAL + 1,
                **{"delta.logRetentionDuration": "interval 0 hours"})
        jsons = [f for f in _log_files(t) if f.endswith(".json")]
        assert jsons == ["%020d.json" % CHECKPOINT_INTERVAL]
        assert t.cleanup_metadata() == []


class TestCheckpointInterval:
    def test_table_property_overrides_default(self, spark, tmp_path):
        df = spark.createDataFrame([(0, "s")], "pk int, attr string")
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / "ci"), df,
            properties={"delta.checkpointInterval": "3"},
        )
        for i in range(1, 4):
            t.append(spark.createDataFrame(
                [(i, f"v{i}")], "pk int, attr string"
            ))
        logdir = os.path.join(t.path, "_delta_log")
        assert os.path.exists(
            os.path.join(logdir, "%020d.checkpoint.parquet" % 3)
        ), "delta.checkpointInterval=3 did not checkpoint at v3"

    def test_detail_surfaces_protocol_and_clustering(self, spark, tmp_path):
        df = spark.createDataFrame([(0, "s")], "pk int, attr string")
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / "d"), df, cluster_by=["pk"]
        )
        d = t.detail()
        assert d["clusteringColumns"] == ["pk"]
        assert d["minWriterVersion"] == 7
        assert "clustering" in d["tableFeatures"]

    def test_auto_cleanup_on_checkpoint(self, spark, tmp_path):
        # delta.enableExpiredLogCleanup (delta-spark default true):
        # each checkpoint also expires log entries past retention
        df = spark.createDataFrame([(0, "s")], "pk int, attr string")
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / "ac"), df,
            properties={
                "delta.checkpointInterval": "3",
                "delta.logRetentionDuration": "interval 0 hours",
            },
        )
        for i in range(1, 4):
            t.append(spark.createDataFrame(
                [(i, f"v{i}")], "pk int, attr string"
            ))
        logdir = os.path.join(t.path, "_delta_log")
        jsons = sorted(f for f in os.listdir(logdir) if f.endswith(".json"))
        assert jsons == ["%020d.json" % 3]  # 0-2 auto-expired at v3
        assert DeltaProtocolTable(spark, t.path).to_df().count() == 4

    def test_auto_cleanup_off_keeps_log(self, spark, tmp_path):
        df = spark.createDataFrame([(0, "s")], "pk int, attr string")
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / "na"), df,
            properties={
                "delta.checkpointInterval": "3",
                "delta.logRetentionDuration": "interval 0 hours",
                "delta.enableExpiredLogCleanup": "false",
            },
        )
        for i in range(1, 4):
            t.append(spark.createDataFrame(
                [(i, f"v{i}")], "pk int, attr string"
            ))
        logdir = os.path.join(t.path, "_delta_log")
        jsons = [f for f in os.listdir(logdir) if f.endswith(".json")]
        assert len(jsons) == 4  # nothing expired

    def test_vacuum_retention_from_config(self, spark, tmp_path):
        # delta.deletedFileRetentionDuration drives the default vacuum
        # horizon, exactly delta-spark's behavior
        df = spark.createDataFrame([(0, "s")], "pk int, attr string")
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / "vr"), df,
            properties={
                "delta.deletedFileRetentionDuration": "interval 0 hours"
            },
        )
        t.overwrite(spark.createDataFrame([(1, "n")], "pk int, attr string"))
        gone = t.vacuum()  # config's 0-hour horizon reclaims at once
        assert len(gone) == 1
        # default (1 week) keeps tombstones: fresh table, nothing gone
        t2 = DeltaProtocolTable.create(
            spark, str(tmp_path / "vd"),
            spark.createDataFrame([(0, "s")], "pk int, attr string"),
        )
        t2.overwrite(spark.createDataFrame([(1, "n")], "pk int, attr string"))
        assert t2.vacuum() == []
