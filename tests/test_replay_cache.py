"""Round-13: driver-side log-replay cache (the r12 verdict's one
flagged scale-weak item). ``snapshot()`` used to re-read the checkpoint
parquet + every JSON tail file into fresh Python dicts on EVERY call —
at 100-TB file counts (~10⁶ adds) seconds of driver CPU per query.
Now :class:`_ReplayState` keeps the replayed state per table path:

* warm ``snapshot()`` at an already-seen version returns the cached
  snapshot object in O(1) (no file reads, no dict rebuild);
* a call after new commits applies only the NEW JSON tail;
* checkpoint parquets decode COLUMNAR (per-action-kind columns, not
  full-width row dicts);
* identity anchors on the stat signature of the highest applied commit
  file, so recreated tables and hand-rewritten logs invalidate instead
  of serving stale state.
"""

import json
import os
import shutil
import time
import uuid

import pytest

from mack_spark.sources import delta_log as dl
from mack_spark.sources.delta_log import (
    DeltaProtocolError,
    DeltaProtocolTable,
    clear_replay_cache,
)


def _mk(spark, tmp_path, name="t", n=6, props=None):
    df = spark.createDataFrame(
        [(i, f"r{i}") for i in range(n)], "pkey int, attr string"
    )
    return DeltaProtocolTable.create(
        spark, str(tmp_path / name), df, properties=props or {}
    )


class TestWarmHits:
    def test_warm_snapshot_is_same_object(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        s1 = t.snapshot()
        s2 = t.snapshot()
        assert s1 is s2
        # a second HANDLE to the same path shares the cache too
        # (delta-spark's driver snapshot cache is per-path as well)
        assert DeltaProtocolTable(spark, t.path).snapshot() is s1

    def test_commit_advances_incrementally(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        s1 = t.snapshot()
        t.append(spark.createDataFrame(
            [(50, "x")], "pkey int, attr string"
        ))
        s2 = t.snapshot()
        assert s2 is not s1 and s2.version == s1.version + 1
        assert len(s2.files) == len(s1.files) + 1
        # the OLD version snapshot is still served (and cached)
        assert t.snapshot(version_as_of=s1.version) is s1

    def test_cached_snapshot_state_is_isolated(self, spark, tmp_path):
        """Advancing the accumulator must not mutate snapshots already
        handed out (shallow copies share entries, not containers)."""
        t = _mk(spark, tmp_path)
        s1 = t.snapshot()
        files_before = dict(s1.files)
        hist_before = len(s1.history)
        t.append(spark.createDataFrame(
            [(51, "y")], "pkey int, attr string"
        ))
        t.snapshot()
        assert s1.files == files_before
        assert len(s1.history) == hist_before

    def test_time_travel_reads_cached_or_replays(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        for i in range(3):
            t.append(spark.createDataFrame(
                [(50 + i, "x")], "pkey int, attr string"
            ))
        head = t.snapshot()
        s0 = t.snapshot(version_as_of=0)
        assert s0.version == 0 and len(s0.files) < len(head.files)
        assert t.snapshot(version_as_of=0) is s0  # cached now
        assert t.snapshot() is head               # head unaffected


class TestInvalidation:
    def test_recreated_table_invalidates(self, spark, tmp_path):
        t = _mk(spark, tmp_path, n=4)
        t.snapshot()
        shutil.rmtree(t.path)
        t2 = _mk(spark, tmp_path, n=9)
        assert t2.to_df().count() == 9

    def test_deleted_tail_invalidates(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        t.append(spark.createDataFrame(
            [(50, "x")], "pkey int, attr string"
        ))
        t.checkpoint()
        head = t.snapshot()
        assert head.version == 1
        # delete the head JSON — the cache's anchor — and the cache
        # must fall back to a full replay from the checkpoint, not
        # serve the stale accumulator
        os.unlink(os.path.join(t.path, "_delta_log", "%020d.json" % 1))
        snap = DeltaProtocolTable(spark, t.path).snapshot()
        assert snap is not head
        assert snap.version == 1  # checkpoint carries version 1 state
        assert len(snap.files) == len(head.files)

    def test_clear_replay_cache_scoped(self, spark, tmp_path):
        ta = _mk(spark, tmp_path, name="a")
        tb = _mk(spark, tmp_path, name="b")
        sa, sb = ta.snapshot(), tb.snapshot()
        clear_replay_cache(ta.path)
        assert ta.snapshot() is not sa
        assert tb.snapshot() is sb


class TestScaleReplay:
    """The verdict's 'Done' bar: a synthetic log with ≥100k add actions
    replays cold in a few seconds and warm in O(1)."""

    N_ADDS = 120_000

    def _fabricate(self, spark, tmp_path):
        """Hand-write a checkpointed log with N_ADDS adds — pyarrow
        direct, no Spark jobs (this is a driver-side metadata test)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        t = _mk(spark, tmp_path, name="big", n=2)
        snap = t.snapshot()
        proto_add = next(iter(snap.files.values()))
        logdir = os.path.join(t.path, "_delta_log")
        n = self.N_ADDS
        stats = json.dumps({
            "numRecords": 10,
            "minValues": {"pkey": 0}, "maxValues": {"pkey": 9},
            "nullCount": {"pkey": 0},
        })
        add_t = pa.struct([
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
            ("stats", pa.string()),
        ])
        adds = pa.array(
            [
                {
                    "path": f"part-{i:07d}-{uuid.uuid4().hex[:8]}.parquet",
                    "partitionValues": [],
                    "size": 1000,
                    "modificationTime": 1,
                    "dataChange": True,
                    "stats": stats,
                }
                for i in range(n)
            ],
            type=add_t,
        )
        meta_t = pa.struct([
            ("id", pa.string()),
            ("format", pa.struct([("provider", pa.string())])),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", pa.map_(pa.string(), pa.string())),
            ("createdTime", pa.int64()),
        ])
        proto_t = pa.struct([
            ("minReaderVersion", pa.int32()),
            ("minWriterVersion", pa.int32()),
        ])
        m = snap.metadata
        top = pa.table({
            "protocol": pa.array(
                [snap.protocol] + [None] * n, type=proto_t
            ),
            "metaData": pa.array(
                [{
                    "id": m["id"],
                    "format": {"provider": "parquet"},
                    "schemaString": m["schemaString"],
                    "partitionColumns": [],
                    "configuration": list(
                        (m.get("configuration") or {}).items()
                    ),
                    "createdTime": m.get("createdTime"),
                }] + [None] * n,
                type=meta_t,
            ),
            "add": pa.concat_arrays([
                pa.array([None], type=add_t), adds
            ]),
        })
        cp_version = 1
        with open(os.path.join(logdir, "%020d.json" % cp_version), "w") as fh:
            fh.write(json.dumps({"commitInfo": {
                "timestamp": 1, "operation": "WRITE",
            }}) + "\n")
        pq.write_table(top, os.path.join(
            logdir, "%020d.checkpoint.parquet" % cp_version
        ))
        with open(os.path.join(logdir, "_last_checkpoint"), "w") as fh:
            json.dump({"version": cp_version, "size": n + 2}, fh)
        clear_replay_cache(t.path)
        return DeltaProtocolTable(spark, t.path)

    def test_cold_fast_warm_o1(self, spark, tmp_path):
        t = self._fabricate(spark, tmp_path)
        t0 = time.monotonic()
        snap = t.snapshot()
        cold = time.monotonic() - t0
        assert len(snap.files) == self.N_ADDS
        assert cold < 10.0, f"cold replay of 120k adds took {cold:.1f}s"
        t0 = time.monotonic()
        for _ in range(20):
            assert t.snapshot() is snap
        warm = (time.monotonic() - t0) / 20
        assert warm < 0.01, f"warm snapshot() took {warm * 1000:.1f}ms"

    # slow (~6 s): big-checkpoint scale shape
    @pytest.mark.slow
    def test_commit_after_big_checkpoint_is_incremental(
        self, spark, tmp_path
    ):
        t = self._fabricate(spark, tmp_path)
        snap = t.snapshot()
        # a tail commit must NOT re-replay the 120k-add checkpoint:
        # bound the advance by time (full replay costs ~seconds)
        with open(os.path.join(
            t.path, "_delta_log", "%020d.json" % (snap.version + 1)
        ), "w") as fh:
            fh.write(json.dumps({"commitInfo": {
                "timestamp": 2, "operation": "WRITE",
            }}) + "\n")
            fh.write(json.dumps({"add": {
                "path": "tail-file.parquet", "partitionValues": {},
                "size": 10, "modificationTime": 2, "dataChange": True,
                "stats": json.dumps({"numRecords": 1}),
            }}) + "\n")
        t0 = time.monotonic()
        s2 = t.snapshot()
        dt = time.monotonic() - t0
        assert s2.version == snap.version + 1
        assert len(s2.files) == self.N_ADDS + 1
        assert dt < 0.5, f"tail advance took {dt:.2f}s (re-replayed?)"
