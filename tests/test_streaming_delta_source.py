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


class TestRateLimiting:
    """maxFilesPerTrigger / maxBytesPerTrigger admission control. The
    Python DataSource API has no admission-control hook, so the reader
    tracks its own cursor: the limit applies per processingTime
    trigger; Trigger.AvailableNow captures one target offset up front
    (whole backlog, one batch) — both paths must stay exactly-once."""

    def _mk_files(self, spark, tmp_path, versions=3, files_per=4, rows=5):
        n = rows * files_per
        base = spark.range(n).selectExpr("cast(id as int) pkey").repartition(
            files_per
        )
        t = DeltaProtocolTable.create(spark, str(tmp_path / "rl"), base)
        for v in range(1, versions):
            t.append(
                spark.range(v * n, (v + 1) * n)
                .selectExpr("cast(id as int) pkey")
                .repartition(files_per)
            )
        return t, versions * n

    def test_offset_walk_bounds_files(self, spark, tmp_path):
        from mack_spark.streaming.delta_source import (
            DeltaProtocolStreamReader,
        )

        t, total = self._mk_files(spark, tmp_path, versions=2)
        r = DeltaProtocolStreamReader(
            None, {"path": t.path, "maxfilespertrigger": "3"}
        )
        off = r.initialOffset()
        assert off == {"version": -1}
        seen = 0
        for _ in range(10):
            nxt = r.latestOffset()
            parts = r.partitions(off, nxt)
            assert len(parts) <= 3
            seen += len(parts)
            if nxt == off or len(parts) == 0:
                break
            off = nxt
        assert seen == 8  # every committed file admitted exactly once
        assert r.latestOffset() == off  # converged: no phantom batches

    def test_offset_walk_byte_limit_progress(self, spark, tmp_path):
        from mack_spark.streaming.delta_source import (
            DeltaProtocolStreamReader,
        )

        t, _ = self._mk_files(spark, tmp_path, versions=1)
        # 1 byte: smaller than any file — progress guarantee admits
        # exactly one file per trigger
        r = DeltaProtocolStreamReader(
            None, {"path": t.path, "maxbytespertrigger": "1"}
        )
        off = r.initialOffset()
        steps = 0
        while True:
            nxt = r.latestOffset()
            parts = r.partitions(off, nxt)
            if not parts:
                break
            assert len(parts) == 1
            steps += 1
            off = nxt
        assert steps == 4

    def test_parse_bytes_suffixes(self):
        from mack_spark.streaming.delta_source import _parse_bytes

        assert _parse_bytes("1024") == 1024
        assert _parse_bytes("64k") == 64 * 1024
        assert _parse_bytes("10m") == 10 << 20
        assert _parse_bytes("2g") == 2 << 30
        assert _parse_bytes("2gb") == 2 << 30

    def test_processing_time_trigger_batches_are_bounded(
        self, spark, tmp_path
    ):
        import time

        register(spark)
        t, total = self._mk_files(spark, tmp_path, versions=3, files_per=4)
        out, ckpt = str(tmp_path / "o"), str(tmp_path / "c")
        q = (
            spark.readStream.format("delta_protocol")
            .option("path", t.path)
            .option("maxFilesPerTrigger", "3")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="300 milliseconds")
            .start()
        )
        try:
            deadline = time.time() + 90
            while time.time() < deadline:
                try:
                    if spark.read.parquet(out).count() >= total:
                        break
                except Exception:
                    pass  # sink not initialized yet
                time.sleep(0.5)
        finally:
            q.stop()
        got = sorted(r[0] for r in spark.read.parquet(out).collect())
        assert got == list(range(total))  # exactly once, nothing dropped
        # 12 files / 3 per trigger -> at least 4 completed batches
        offdir = os.path.join(ckpt, "offsets")
        batches = [int(f) for f in os.listdir(offdir) if f.isdigit()]
        assert len(batches) >= 4, sorted(batches)

    # slow (~15 s): rate-limit scale run; exactly-once-across-restarts stays default
    @pytest.mark.slow
    def test_available_now_with_limit_stays_exactly_once(
        self, spark, tmp_path
    ):
        """A rate-limited availableNow RUN processes one bounded chunk
        (the Python DataSource API captures a single target offset);
        repeated runs drain the backlog with no row lost or repeated."""
        register(spark)
        t, total = self._mk_files(spark, tmp_path, versions=2)  # 8 files
        out, ckpt = str(tmp_path / "oa"), str(tmp_path / "ca")

        def drain():
            q = (
                spark.readStream.format("delta_protocol")
                .option("path", t.path)
                .option("maxFilesPerTrigger", "2")
                .load()
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            try:
                return sorted(r[0] for r in spark.read.parquet(out).collect())
            except Exception:
                return []

        counts = []
        got = []
        for _ in range(6):
            got = drain()
            counts.append(len(got))
            if len(got) >= total:
                break
        # bounded per run (2 of the 8 files — repartition spreads rows
        # only roughly evenly, so assert by shape: the first run is a
        # strict subset and progress is monotone), exactly once overall
        assert 0 < counts[0] < total, counts
        assert counts == sorted(counts), counts
        assert got == list(range(total)), counts
        t.append(
            spark.range(total, total + 7).selectExpr("cast(id as int) pkey")
        )
        for _ in range(3):
            got = drain()
            if len(got) >= total + 7:
                break
        assert got == list(range(total + 7))

    def test_unlimited_offsets_stay_version_only(self, spark, tmp_path):
        register(spark)
        t, _ = self._mk_files(spark, tmp_path, versions=1)
        out, ckpt = str(tmp_path / "ou"), str(tmp_path / "cu")
        q = (
            spark.readStream.format("delta_protocol")
            .option("path", t.path)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        offdir = os.path.join(ckpt, "offsets")
        last = max(int(f) for f in os.listdir(offdir) if f.isdigit())
        body = open(os.path.join(offdir, str(last))).read().splitlines()[-1]
        assert "index" not in body, body  # old checkpoint shape preserved


class TestChangeFeedSource:
    """readChangeFeed=true — Delta's CDF read through the
    delta_protocol format, batch and streaming."""

    SCHEMA = "pkey int, attr string, val int"

    def _mk_cdf(self, spark, tmp_path):
        from mack_spark.tables import KeyedMerge

        t = DeltaProtocolTable.create(
            spark, str(tmp_path / "cdf"),
            spark.createDataFrame([(1, "a", 10), (2, "b", 20)], self.SCHEMA),
            properties={"delta.enableChangeDataFeed": "true"},
        )
        t.merge(KeyedMerge(
            source=spark.createDataFrame([(2, "B", 22), (5, "e", 50)],
                                         self.SCHEMA),
            condition="t.pkey = s.pkey",
            matched_update={"attr": "s.attr", "val": "s.val"},
            not_matched_insert="*",
            target_key_col="pkey", source_key_col="pkey",
        ))
        t.delete_where("pkey = 1")
        return t

    EXPECT_V1_ON = [
        (1, "insert", 5, 50),
        (1, "update_postimage", 2, 22),
        (1, "update_preimage", 2, 20),
        (2, "delete", 1, 10),
    ]

    def test_batch_cdf_read(self, spark, tmp_path):
        register(spark)
        t = self._mk_cdf(spark, tmp_path)
        df = (
            spark.read.format("delta_protocol").option("path", t.path)
            .option("readChangeFeed", "true")
            .option("startingVersion", "1").load()
        )
        rows = sorted(
            (r["_commit_version"], r["_change_type"], r["pkey"], r["val"])
            for r in df.collect()
        )
        assert rows == self.EXPECT_V1_ON
        assert all(r["_commit_timestamp"] is not None for r in df.collect())
        # endingVersion bounds the range
        only_v1 = (
            spark.read.format("delta_protocol").option("path", t.path)
            .option("readChangeFeed", "true")
            .option("startingVersion", "1")
            .option("endingVersion", "1").load()
        )
        assert only_v1.count() == 3

    # slow (~20 s): multi-rewrite scale run; cdf stream basics stay default
    @pytest.mark.slow
    def test_streaming_cdf_follows_rewrites(self, spark, tmp_path):
        register(spark)
        t = self._mk_cdf(spark, tmp_path)
        out, ckpt = str(tmp_path / "o"), str(tmp_path / "c")

        def drain():
            q = (
                spark.readStream.format("delta_protocol")
                .option("path", t.path)
                .option("readChangeFeed", "true").load()
                .writeStream.format("parquet").option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True).start()
            )
            q.awaitTermination()
            return sorted(
                (r["_commit_version"], r["_change_type"], r["pkey"],
                 r["val"])
                for r in spark.read.parquet(out).collect()
            )

        got = drain()
        # startingVersion defaults to 0: the initial CTAS streams as
        # inserts, then the merge pre/post pairs and the delete
        assert got == [
            (0, "insert", 1, 10), (0, "insert", 2, 20),
        ] + self.EXPECT_V1_ON
        # a further UPDATE is a feed batch, not a stream-killing
        # change commit — exactly-once across the restart
        t.update_where("pkey = 5", {"val": "51"})
        got = drain()
        assert got[-2:] == [
            (3, "update_postimage", 5, 51),
            (3, "update_preimage", 5, 50),
        ]
        assert len(got) == 8

    def test_cdf_requires_enablement(self, spark, tmp_path):
        register(spark)
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / "plain"),
            spark.createDataFrame([(1, "a", 1)], self.SCHEMA),
        )
        with pytest.raises(Exception, match="enableChangeDataFeed"):
            (
                spark.read.format("delta_protocol").option("path", t.path)
                .option("readChangeFeed", "true").load().collect()
            )

    def test_cdf_stream_rate_limited(self, spark, tmp_path):
        from mack_spark.streaming.delta_source import (
            DeltaProtocolStreamReader,
        )

        t = self._mk_cdf(spark, tmp_path)
        r = DeltaProtocolStreamReader(
            None,
            {"path": t.path, "readchangefeed": "true",
             "maxfilespertrigger": "1"},
        )
        off = r.initialOffset()
        total = 0
        for _ in range(20):
            nxt = r.latestOffset()
            parts = r.partitions(off, nxt)
            assert len(parts) <= 1
            if nxt == off:
                break
            total += len(parts)
            off = nxt
        # v0: >=1 data file; v1: cdc file(s); v2: cdc file(s) — every
        # change file admitted exactly once, one per trigger
        assert total >= 3


class TestColumnMappedSource:
    """r14: the format readers resolve file columns through the
    column mapping — physicalName (name mode) / parquet field id (id
    mode) — and translate physical-keyed partitionValues back to
    logical, so mapped tables stream and batch-read like plain ones."""

    def _mk_mapped(self, spark, tmp_path, name="mt"):
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / name),
            spark.createDataFrame(
                [(1, "a"), (2, "b")], "pkey0 int, attr string"
            ),
        )
        t.enable_column_mapping()
        t.rename_column("pkey0", "pkey")  # logical != physical
        return t

    def test_batch_read_mapped_name_mode(self, spark, tmp_path):
        register(spark)
        t = self._mk_mapped(spark, tmp_path)
        t.append(spark.createDataFrame(
            [(3, "c")], "pkey int, attr string"
        ))
        df = (spark.read.format("delta_protocol")
              .option("path", t.path).load())
        assert df.columns == ["pkey", "attr"]
        assert sorted(map(tuple, df.collect())) == [
            (1, "a"), (2, "b"), (3, "c"),
        ]

    def test_batch_read_mapped_id_mode(self, spark, tmp_path):
        import sys
        from pathlib import Path
        sys.path.insert(0, str(Path(__file__).parent))
        from test_column_mapping_rw import _mk_id_mode

        register(spark)
        t = _mk_id_mode(spark, tmp_path)
        df = (spark.read.format("delta_protocol")
              .option("path", t.path).load())
        assert sorted(map(tuple, df.collect())) == [(1, "x"), (2, "y")]

    def test_stream_mapped_source(self, spark, tmp_path):
        register(spark)
        t = self._mk_mapped(spark, tmp_path)
        got = _drain(spark, t.path, str(tmp_path / "w"))
        assert got == [(1, "a"), (2, "b")]
        t.append(spark.createDataFrame(
            [(3, "c")], "pkey int, attr string"
        ))
        got = _drain(spark, t.path, str(tmp_path / "w"))
        assert got == [(1, "a"), (2, "b"), (3, "c")]

    def test_mapped_partitioned_values_logical(self, spark, tmp_path):
        register(spark)
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / "mp"),
            spark.createDataFrame(
                [(1, "a", "e"), (2, "b", "w")],
                "pkey int, attr string, par string",
            ),
            partition_by=["par"],
        )
        t.enable_column_mapping()
        t.rename_column("par", "region")
        t.append(spark.createDataFrame(
            [(3, "c", "e")], "pkey int, attr string, region string"
        ))
        df = (spark.read.format("delta_protocol")
              .option("path", t.path).load())
        assert df.columns == ["pkey", "attr", "region"]
        rows = sorted(map(tuple, df.collect()))
        assert rows == [(1, "a", "e"), (2, "b", "w"), (3, "c", "e")]

    def test_mapped_cdf_batch(self, spark, tmp_path):
        register(spark)
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / "mc"),
            spark.createDataFrame(
                [(1, "a")], "pkey int, attr string"
            ),
            properties={"delta.enableChangeDataFeed": "true"},
        )
        t.enable_column_mapping()
        t.rename_column("pkey", "k")
        t.append(spark.createDataFrame(
            [(2, "b")], "k int, attr string"
        ))
        df = (spark.read.format("delta_protocol")
              .option("path", t.path)
              .option("readChangeFeed", "true")
              .option("startingVersion", "2").load())
        rows = {(r["k"], r["_change_type"]) for r in df.collect()}
        assert rows == {(2, "insert")}
