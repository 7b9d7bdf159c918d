"""Streaming reads from an open-protocol Delta table: the
delta_protocol Python data source must follow Delta's streaming-source
contract — version offsets, dataChange-true adds only, change-commit
rejection, exactly-once across restarts."""

import os

import pytest

from mack_spark.sources.delta_log import DeltaProtocolTable
from mack_spark.streaming.delta_source import register


def _mk(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, "pkey int, attr string")
    return DeltaProtocolTable.create(spark, str(tmp_path / "t"), df)


def _drain(spark, path, workdir, **opts):
    """One availableNow pass into a parquet sink (fault-tolerant, so
    checkpointed restarts are supported); returns ALL rows accumulated
    in the sink across every drain that shared this workdir."""
    out, ckpt = f"{workdir}/out", f"{workdir}/ckpt"
    reader = spark.readStream.format("delta_protocol").option("path", path)
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not any(f.endswith(".parquet") for f in os.listdir(out)):
        return []
    return sorted(map(tuple, spark.read.parquet(out).collect()))


class TestDeltaProtocolStream:
    def test_initial_snapshot_then_appends(self, spark, tmp_path):
        register(spark)
        t = _mk(spark, tmp_path, [(1, "a"), (2, "b")])
        t.append(spark.createDataFrame([(3, "c")], "pkey int, attr string"))
        got = _drain(spark, t.path, str(tmp_path / "w1"))
        assert got == [(1, "a"), (2, "b"), (3, "c")]

    def test_exactly_once_across_restarts(self, spark, tmp_path):
        register(spark)
        t = _mk(spark, tmp_path, [(1, "a")])
        w = str(tmp_path / "w2")
        assert _drain(spark, t.path, w) == [(1, "a")]
        t.append(spark.createDataFrame([(2, "b")], "pkey int, attr string"))
        t.append(spark.createDataFrame([(3, "c")], "pkey int, attr string"))
        # resumed from the checkpointed version offset: the sink gains
        # exactly the two new commits — no row replayed, none missed
        got = _drain(spark, t.path, w)
        assert got == [(1, "a"), (2, "b"), (3, "c")]
        # a third drain with nothing new adds nothing
        assert _drain(spark, t.path, w) == [(1, "a"), (2, "b"), (3, "c")]

    def test_optimize_commit_is_invisible(self, spark, tmp_path):
        register(spark)
        t = _mk(spark, tmp_path, [(0, "r0")])
        w = str(tmp_path / "w3")
        assert _drain(spark, t.path, w) == [(0, "r0")]
        for i in range(1, 5):
            t.append(
                spark.createDataFrame([(i, f"r{i}")], "pkey int, attr string")
            )
        res = t.optimize()
        assert res["rewritten"] >= 2
        t.append(spark.createDataFrame([(9, "r9")], "pkey int, attr string"))
        # dataChange:false rewrite never re-emits rows: exactly the
        # appends land, each once
        got = _drain(spark, t.path, w)
        assert got == [(0, "r0"), (1, "r1"), (2, "r2"), (3, "r3"),
                       (4, "r4"), (9, "r9")]

    def test_change_commit_raises_unless_opted_out(self, spark, tmp_path):
        register(spark)
        t = _mk(spark, tmp_path, [(1, "a"), (2, "b")])
        w = str(tmp_path / "w4")
        assert len(_drain(spark, t.path, w)) == 2
        t.delete_where("pkey = 1")
        t.append(spark.createDataFrame([(3, "c")], "pkey int, attr string"))
        with pytest.raises(Exception, match="(?i)updates or deletes"):
            _drain(spark, t.path, w)
        # skipChangeCommits drops the DELETE commit and keeps streaming
        got = _drain(
            spark, t.path, str(tmp_path / "w4b"), skipChangeCommits="true"
        )
        assert (3, "c") in got

    def test_starting_version_latest(self, spark, tmp_path):
        register(spark)
        t = _mk(spark, tmp_path, [(1, "old")])
        w = str(tmp_path / "w5")
        assert _drain(spark, t.path, w, startingVersion="latest") == []
        t.append(spark.createDataFrame([(2, "new")], "pkey int, attr string"))
        assert _drain(spark, t.path, w, startingVersion="latest") == [
            (2, "new")
        ]

    def test_partitioned_stream_recovers_partition_values(self, spark, tmp_path):
        register(spark)
        df = spark.createDataFrame(
            [(1, "x"), (2, "y")], "pkey int, part string"
        )
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / "p"), df, partition_by=["part"]
        )
        got = _drain(spark, t.path, str(tmp_path / "w6"))
        assert got == [(1, "x"), (2, "y")]

    def test_typed_columns_roundtrip_arrow_path(self, spark, tmp_path):
        """timestamp/date/double/decimal-free typed columns survive the
        Arrow batch path bit-exactly."""
        import datetime

        register(spark)
        rows = [
            (1, 2.5, datetime.date(2024, 1, 2),
             datetime.datetime(2024, 1, 2, 3, 4, 5)),
            (2, -0.125, datetime.date(2020, 6, 1),
             datetime.datetime(2020, 6, 1, 12, 0, 0)),
        ]
        df = spark.createDataFrame(
            rows, "pkey int, val double, d date, ts timestamp"
        )
        t = DeltaProtocolTable.create(spark, str(tmp_path / "ty"), df)
        got = _drain(spark, t.path, str(tmp_path / "w7"))
        assert got == sorted(map(tuple, df.collect()))

    def test_batch_read_format(self, spark, tmp_path):
        """spark.read.format('delta_protocol') — batch interop surface
        with versionAsOf time travel."""
        register(spark)
        t = _mk(spark, tmp_path, [(1, "a"), (2, "b")])
        t.append(spark.createDataFrame([(3, "c")], "pkey int, attr string"))
        got = sorted(map(tuple, (
            spark.read.format("delta_protocol")
            .option("path", t.path).load().collect()
        )))
        assert got == [(1, "a"), (2, "b"), (3, "c")]
        old = sorted(map(tuple, (
            spark.read.format("delta_protocol")
            .option("path", t.path).option("versionAsOf", "0")
            .load().collect()
        )))
        assert old == [(1, "a"), (2, "b")]

    def test_batch_read_partitioned(self, spark, tmp_path):
        register(spark)
        df = spark.createDataFrame(
            [(1, "x"), (2, "y"), (3, "x")], "pkey int, part string"
        )
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / "bp"), df, partition_by=["part"]
        )
        got = sorted(map(tuple, (
            spark.read.format("delta_protocol")
            .option("path", t.path).load().collect()
        )))
        assert got == [(1, "x"), (2, "y"), (3, "x")] or got == sorted(
            map(tuple, df.collect())
        )
