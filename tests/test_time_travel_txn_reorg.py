"""Round-11 extras: TIMESTAMP AS OF time travel (+ streaming
startingTimestamp), REORG TABLE APPLY (PURGE), and SetTransaction
idempotent appends (Delta's txnAppId/txnVersion) — the remaining
delta-spark substrate APIs a reference user reaches for.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from mack_spark.sources.delta_log import (
    DeltaProtocolError,
    DeltaProtocolTable,
)


def _mk(spark, tmp_path, **kw):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "pkey int, attr string")
    return DeltaProtocolTable.create(spark, str(tmp_path / "t"), df, **kw)


def _commit_ts(t, v):
    line = open(
        os.path.join(t.path, "_delta_log", "%020d.json" % v)
    ).readline()
    ci = json.loads(line)["commitInfo"]
    return int(ci.get("inCommitTimestamp") or ci["timestamp"])


class TestTimestampTimeTravel:
    def test_timestamp_as_of_resolves_latest_leq(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        t.append(spark.createDataFrame([(3, "c")], "pkey int, attr string"))
        ts0, ts1 = _commit_ts(t, 0), _commit_ts(t, 1)
        assert t.version_at_timestamp(ts0) == 0
        assert t.version_at_timestamp(ts1) == 1
        assert t.version_at_timestamp(ts1 + 10_000) == 1
        if ts1 > ts0:  # same-millisecond commits resolve to the later
            assert t.to_df(timestamp_as_of=ts0).count() == 2
        assert t.to_df(timestamp_as_of=ts1 + 1).count() == 3

    def test_timestamp_before_first_commit_raises(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        with pytest.raises(DeltaProtocolError, match="earliest"):
            t.to_df(timestamp_as_of=_commit_ts(t, 0) - 1)

    def test_accepts_datetime_and_iso_string(self, spark, tmp_path):
        import datetime

        t = _mk(spark, tmp_path)
        ts = _commit_ts(t, 0)
        dt = datetime.datetime.fromtimestamp(
            ts / 1000.0, tz=datetime.timezone.utc
        )
        assert t.to_df(timestamp_as_of=dt).count() == 2
        assert t.to_df(timestamp_as_of=dt.isoformat()).count() == 2
        with pytest.raises(ValueError, match="not both"):
            t.to_df(version_as_of=0, timestamp_as_of=ts)

    def test_ict_tables_resolve_by_ict(self, spark, tmp_path):
        """With in-commit timestamps, resolution uses the ICT clock
        even when the advisory timestamp diverges."""
        t = _mk(
            spark, tmp_path,
            properties={"delta.enableInCommitTimestamps": "true"},
        )
        t.append(spark.createDataFrame([(3, "c")], "pkey int, attr string"))
        # forge a wildly-wrong advisory timestamp on v1
        vf = os.path.join(t.path, "_delta_log", "%020d.json" % 1)
        lines = open(vf).read().splitlines()
        a = json.loads(lines[0])
        ict1 = a["commitInfo"]["inCommitTimestamp"]
        a["commitInfo"]["timestamp"] = 1  # bogus
        lines[0] = json.dumps(a, separators=(",", ":"))
        open(vf, "w").write("\n".join(lines) + "\n")
        assert t.version_at_timestamp(ict1) == 1
        assert t.version_at_timestamp(ict1 - 1) == 0

    def test_restore_to_timestamp(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        t.append(spark.createDataFrame([(3, "c")], "pkey int, attr string"))
        t.restore_to_timestamp(_commit_ts(t, 0))
        assert t.to_df().count() == 2

    def test_streaming_starting_timestamp(self, spark, tmp_path):
        from mack_spark.streaming.delta_source import register

        register(spark)
        t = _mk(spark, tmp_path)                                   # v0
        t.append(spark.createDataFrame([(3, "c")], "pkey int, attr string"))
        ts1 = _commit_ts(t, 1)
        # first commit at-or-after ts1 is v1 → only its rows stream
        assert t.first_version_at_or_after(ts1) == 1
        out, ckpt = str(tmp_path / "o"), str(tmp_path / "c")
        q = (
            spark.readStream.format("delta_protocol")
            .option("path", t.path)
            .option("startingTimestamp", str(ts1))
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = sorted(r["pkey"] for r in spark.read.parquet(out).collect())
        # ts0 may equal ts1 at millisecond resolution; v0 rows appear
        # only then
        assert got[-1] == 3 and 3 in got
        if _commit_ts(t, 0) < ts1:
            assert got == [3]

    def test_streaming_future_timestamp_streams_nothing_yet(
        self, spark, tmp_path
    ):
        t = _mk(spark, tmp_path)
        head = t.snapshot().version
        assert t.first_version_at_or_after(2**60) == head + 1


class TestReorgPurge:
    def test_purge_drops_dvs_and_keeps_rows(self, spark, tmp_path):
        df = spark.range(20).selectExpr("cast(id as int) pkey").coalesce(1)
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / "t"), df,
            properties={"delta.enableDeletionVectors": "true"},
        )
        t.delete_where("pkey < 5")
        assert any(
            a.get("deletionVector") for a in t.snapshot().files.values()
        )
        res = t.reorg_purge()
        assert res["purged_files"] == 1
        snap = t.snapshot()
        assert not any(a.get("deletionVector") for a in snap.files.values())
        assert sorted(r["pkey"] for r in t.to_df().collect()) == list(
            range(5, 20)
        )
        # dataChange=false → streaming readers skip the REORG commit
        vf = os.path.join(t.path, "_delta_log", "%020d.json" % res["version"])
        acts = [json.loads(l) for l in open(vf) if l.strip()]
        assert all(
            not a["add"].get("dataChange", True)
            for a in acts if "add" in a
        )
        # the replaced DV file becomes vacuum-able
        reclaimed = t.vacuum(retention_hours=0.0)
        assert any("deletion_vector" in p for p in reclaimed)
        assert t.to_df().count() == 15

    def test_purge_fraction_threshold(self, spark, tmp_path):
        df = spark.range(40).selectExpr("cast(id as int) pkey").repartition(2)
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / "t"), df,
            properties={"delta.enableDeletionVectors": "true"},
        )
        t.delete_where("pkey = 0")  # tiny fraction in one file
        res = t.reorg_purge(min_deleted_fraction=0.5)
        assert res["purged_files"] == 0  # below threshold: untouched
        res = t.reorg_purge(min_deleted_fraction=0.0)
        assert res["purged_files"] == 1


class TestSetTransaction:
    def test_idempotent_append(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        batch = spark.createDataFrame([(9, "z")], "pkey int, attr string")
        t.append(batch, txn_app_id="job-1", txn_version=1)
        t.append(batch, txn_app_id="job-1", txn_version=1)  # retry: no-op
        t.append(batch, txn_app_id="job-1", txn_version=0)  # older: no-op
        assert t.to_df().count() == 3
        assert t.latest_txn_version("job-1") == 1
        t.append(batch, txn_app_id="job-1", txn_version=2)  # new batch
        assert t.to_df().count() == 4
        # a DIFFERENT app's version 1 is independent
        t.append(batch, txn_app_id="job-2", txn_version=1)
        assert t.to_df().count() == 5
        assert t.latest_txn_version("missing") is None

    def test_txn_args_must_pair(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        with pytest.raises(ValueError, match="together"):
            t.append(
                spark.createDataFrame([(9, "z")], "pkey int, attr string"),
                txn_app_id="job-1",
            )

    def test_txn_survives_checkpoint(self, spark, tmp_path):
        from mack_spark.sources.delta_log import CHECKPOINT_INTERVAL

        t = _mk(spark, tmp_path)
        batch = spark.createDataFrame([(9, "z")], "pkey int, attr string")
        t.append(batch, txn_app_id="job-1", txn_version=7)
        for _ in range(CHECKPOINT_INTERVAL):
            t.append(batch)
        # force replay through the checkpoint alone
        v = t.snapshot().version
        cp_base = (v // CHECKPOINT_INTERVAL) * CHECKPOINT_INTERVAL
        for i in range(cp_base):
            f = os.path.join(t.path, "_delta_log", "%020d.json" % i)
            if os.path.exists(f):
                os.unlink(f)
        t2 = DeltaProtocolTable(spark, t.path)
        assert t2.latest_txn_version("job-1") == 7
        # the idempotent skip still holds after the checkpoint
        t2.append(batch, txn_app_id="job-1", txn_version=7)
        assert t2.to_df().count() == t.to_df().count()
