"""V2 (UUID-named) checkpoint READS (round 11, VERDICT-r10 #8): a
2025-era foreign table checkpoints as ``<v>.checkpoint.<uuid>.parquet``
with a ``checkpointMetadata`` action and file actions either inline or
in sidecar parquet files under ``_delta_log/_sidecars/`` (delta
PROTOCOL.md §V2 Spec Checkpoints). Reader feature ``v2Checkpoint`` is
accepted; replay goes through the checkpoint + JSON tail like classic.
"""

import json
import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mack_spark.sources.delta_log import (
    DeltaProtocolError,
    DeltaProtocolTable,
)


def _mk(spark, tmp_path, n_extra=2):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "pkey int, attr string"
    )
    t = DeltaProtocolTable.create(spark, str(tmp_path / "t"), df)
    for i in range(n_extra):
        t.append(spark.createDataFrame(
            [(10 + i, f"x{i}")], "pkey int, attr string"
        ))
    return t


_PROTO_T = pa.struct([("minReaderVersion", pa.int32()),
                      ("minWriterVersion", pa.int32()),
                      ("readerFeatures", pa.list_(pa.string())),
                      ("writerFeatures", pa.list_(pa.string()))])
_META_T = pa.struct([
    ("id", pa.string()),
    ("format", pa.struct([("provider", pa.string())])),
    ("schemaString", pa.string()),
    ("partitionColumns", pa.list_(pa.string())),
    ("configuration", pa.map_(pa.string(), pa.string())),
    ("createdTime", pa.int64()),
])
_ADD_T = pa.struct([
    ("path", pa.string()),
    ("partitionValues", pa.map_(pa.string(), pa.string())),
    ("size", pa.int64()),
    ("modificationTime", pa.int64()),
    ("dataChange", pa.bool_()),
    ("stats", pa.string()),
])
_CPM_T = pa.struct([("version", pa.int64())])
_SIDE_T = pa.struct([("path", pa.string()), ("sizeInBytes", pa.int64()),
                     ("modificationTime", pa.int64())])


def _v2_rows(snap, sidecar_path=None):
    """(top-level rows, sidecar rows or None) for a v2 checkpoint of
    the snapshot."""
    meta = snap.metadata
    shaped_meta = {
        "id": meta.get("id"),
        "format": {"provider": "parquet"},
        "schemaString": meta.get("schemaString"),
        "partitionColumns": list(meta.get("partitionColumns") or []),
        "configuration": list((meta.get("configuration") or {}).items()),
        "createdTime": meta.get("createdTime"),
    }
    proto = {
        "minReaderVersion": 3, "minWriterVersion": 7,
        "readerFeatures": ["v2Checkpoint"],
        "writerFeatures": ["v2Checkpoint"],
    }
    adds = [
        {"path": a["path"],
         "partitionValues": list((a.get("partitionValues") or {}).items()),
         "size": a.get("size"), "modificationTime": 0,
         "dataChange": True, "stats": a.get("stats")}
        for a in snap.files.values()
    ]
    blank = {"protocol": None, "metaData": None, "add": None,
             "checkpointMetadata": None, "sidecar": None}
    top = [
        dict(blank, protocol=proto),
        dict(blank, metaData=shaped_meta),
        dict(blank, checkpointMetadata={"version": snap.version}),
    ]
    if sidecar_path is None:
        top += [dict(blank, add=a) for a in adds]
        return top, None
    top.append(dict(blank, sidecar={
        "path": sidecar_path, "sizeInBytes": 1, "modificationTime": 0,
    }))
    return top, [dict(blank, add=a) for a in adds]


def _write_rows(path, rows):
    cols = {
        "protocol": pa.array([r["protocol"] for r in rows], _PROTO_T),
        "metaData": pa.array([r["metaData"] for r in rows], _META_T),
        "add": pa.array([r["add"] for r in rows], _ADD_T),
        "checkpointMetadata": pa.array(
            [r["checkpointMetadata"] for r in rows], _CPM_T
        ),
        "sidecar": pa.array([r["sidecar"] for r in rows], _SIDE_T),
    }
    pq.write_table(pa.table(cols), path)


def _install_v2_checkpoint(t, sidecar=False):
    """Write a v2 checkpoint for the table head and delete the JSON
    tail, so replay MUST go through it."""
    snap = t.snapshot()
    logdir = os.path.join(t.path, "_delta_log")
    sc_name = f"{uuid.uuid4()}.parquet" if sidecar else None
    top, side = _v2_rows(snap, sc_name)
    if side is not None:
        os.makedirs(os.path.join(logdir, "_sidecars"), exist_ok=True)
        _write_rows(os.path.join(logdir, "_sidecars", sc_name), side)
    cp_name = "%020d.checkpoint.%s.parquet" % (snap.version, uuid.uuid4())
    _write_rows(os.path.join(logdir, cp_name), top)
    with open(os.path.join(logdir, "_last_checkpoint"), "w") as fh:
        json.dump({"version": snap.version, "size": len(top)}, fh)
    for v in range(snap.version + 1):
        f = os.path.join(logdir, "%020d.json" % v)
        if os.path.exists(f):
            os.unlink(f)
    return snap


class TestV2CheckpointRead:
    def test_uuid_named_inline_actions(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        snap = _install_v2_checkpoint(t, sidecar=False)
        t2 = DeltaProtocolTable(spark, t.path)
        assert t2.snapshot().version == snap.version
        got = sorted(r["pkey"] for r in t2.to_df().collect())
        assert got == [1, 2, 10, 11]

    def test_sidecar_actions(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        _install_v2_checkpoint(t, sidecar=True)
        t2 = DeltaProtocolTable(spark, t.path)
        got = sorted(r["pkey"] for r in t2.to_df().collect())
        assert got == [1, 2, 10, 11]

    def test_json_tail_after_v2_checkpoint(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        _install_v2_checkpoint(t, sidecar=True)
        t2 = DeltaProtocolTable(spark, t.path)
        t2.append(spark.createDataFrame([(99, "t")], "pkey int, attr string"))
        got = sorted(r["pkey"] for r in t2.to_df().collect())
        assert got == [1, 2, 10, 11, 99]

    def test_missing_sidecar_fails_loudly(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        _install_v2_checkpoint(t, sidecar=True)
        logdir = os.path.join(t.path, "_delta_log", "_sidecars")
        for f in os.listdir(logdir):
            os.unlink(os.path.join(logdir, f))
        with pytest.raises(DeltaProtocolError, match="sidecar"):
            DeltaProtocolTable(spark, t.path).snapshot()

    def test_v2_reader_feature_accepted(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        _install_v2_checkpoint(t, sidecar=False)
        proto = DeltaProtocolTable(spark, t.path).snapshot().protocol
        assert "v2Checkpoint" in proto["readerFeatures"]


def _drop_json_tail(t):
    """Delete every JSON commit ≤ the checkpointed version so replay
    MUST go through the checkpoint."""
    logdir = os.path.join(t.path, "_delta_log")
    with open(os.path.join(logdir, "_last_checkpoint")) as fh:
        v = json.load(fh)["version"]
    for i in range(v + 1):
        f = os.path.join(logdir, "%020d.json" % i)
        if os.path.exists(f):
            os.unlink(f)


class TestV2CheckpointWrite:
    """delta.checkpointPolicy=v2 (round 12): this writer's OWN
    checkpoints come out in the uuid-named + sidecar layout."""

    def _mk_v2(self, spark, tmp_path, n_extra=2):
        df = spark.createDataFrame(
            [(1, "a"), (2, "b")], "pkey int, attr string"
        )
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / "tv2"), df,
            properties={"delta.checkpointPolicy": "v2"},
        )
        for i in range(n_extra):
            t.append(spark.createDataFrame(
                [(10 + i, f"x{i}")], "pkey int, attr string"
            ))
        return t

    def test_create_declares_v2_feature_both_sides(self, spark, tmp_path):
        t = self._mk_v2(spark, tmp_path, n_extra=0)
        proto = t.snapshot().protocol
        assert proto["minReaderVersion"] == 3
        assert proto["minWriterVersion"] == 7
        assert "v2Checkpoint" in proto["readerFeatures"]
        assert "v2Checkpoint" in proto["writerFeatures"]

    def test_checkpoint_writes_uuid_plus_sidecar(self, spark, tmp_path):
        import glob as _glob
        t = self._mk_v2(spark, tmp_path)
        v = t.checkpoint()
        logdir = os.path.join(t.path, "_delta_log")
        assert not os.path.exists(
            os.path.join(logdir, "%020d.checkpoint.parquet" % v)
        ), "v2 policy must not write a classic checkpoint"
        tops = _glob.glob(
            os.path.join(logdir, "%020d.checkpoint.*.parquet" % v)
        )
        assert len(tops) == 1
        sidecars = os.listdir(os.path.join(logdir, "_sidecars"))
        assert len(sidecars) == 1
        # top file has no inline add actions; sidecar holds them all
        top = pq.read_table(tops[0]).to_pylist()
        assert "add" not in pq.read_table(tops[0]).schema.names
        assert any(r.get("checkpointMetadata") for r in top)
        refs = [r["sidecar"]["path"] for r in top
                if r.get("sidecar") and r["sidecar"].get("path")]
        assert refs == sidecars

    def test_replay_through_own_v2_checkpoint(self, spark, tmp_path):
        t = self._mk_v2(spark, tmp_path)
        t.checkpoint()
        _drop_json_tail(t)
        t2 = DeltaProtocolTable(spark, t.path)
        got = sorted(r["pkey"] for r in t2.to_df().collect())
        assert got == [1, 2, 10, 11]
        # and the log continues: a post-checkpoint commit still works
        t2.append(spark.createDataFrame([(99, "t")], "pkey int, attr string"))
        assert sorted(
            r["pkey"] for r in
            DeltaProtocolTable(spark, t.path).to_df().collect()
        ) == [1, 2, 10, 11, 99]

    def test_auto_checkpoint_at_interval_is_v2(self, spark, tmp_path):
        import glob as _glob
        from mack_spark.sources import delta_log as dl
        t = self._mk_v2(spark, tmp_path, n_extra=dl.CHECKPOINT_INTERVAL)
        tops = _glob.glob(os.path.join(
            t.path, "_delta_log",
            "%020d.checkpoint.*.parquet" % dl.CHECKPOINT_INTERVAL,
        ))
        assert len(tops) == 1

    def test_txn_domain_dv_survive_v2_replay(self, spark, tmp_path):
        t = self._mk_v2(spark, tmp_path)
        t.set_properties({"delta.enableDeletionVectors": "true"})
        t.append(
            spark.createDataFrame([(50, "d"), (51, "e")],
                                  "pkey int, attr string"),
            txn_app_id="writer-a", txn_version=7,
        )
        t.delete_where("pkey = 50")  # DV'd add
        t.set_domain_metadata("myapp.domain", {"k": "v"})
        t.checkpoint()
        _drop_json_tail(t)
        t2 = DeltaProtocolTable(spark, t.path)
        assert sorted(r["pkey"] for r in t2.to_df().collect()) == [
            1, 2, 10, 11, 51]
        assert t2.latest_txn_version("writer-a") == 7
        assert json.loads(
            t2.domain_metadata()["myapp.domain"]) == {"k": "v"}

    def test_multi_sidecar_split(self, spark, tmp_path, monkeypatch):
        from mack_spark.sources import delta_log as dl
        monkeypatch.setattr(dl, "CHECKPOINT_PART_ACTIONS", 2)
        t = self._mk_v2(spark, tmp_path, n_extra=4)
        t.checkpoint()
        sidecars = os.listdir(
            os.path.join(t.path, "_delta_log", "_sidecars"))
        assert len(sidecars) >= 2
        _drop_json_tail(t)
        got = sorted(
            r["pkey"] for r in
            DeltaProtocolTable(spark, t.path).to_df().collect())
        assert got == [1, 2, 10, 11, 12, 13]

    def test_upgrade_existing_table_to_v2(self, spark, tmp_path):
        import glob as _glob
        t = _mk(spark, tmp_path)
        t.set_properties({"delta.checkpointPolicy": "v2"})
        proto = t.snapshot().protocol
        assert "v2Checkpoint" in (proto.get("readerFeatures") or [])
        assert "v2Checkpoint" in (proto.get("writerFeatures") or [])
        v = t.checkpoint()
        assert _glob.glob(os.path.join(
            t.path, "_delta_log", "%020d.checkpoint.*.parquet" % v))

    def test_invalid_policy_refused(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        with pytest.raises(DeltaProtocolError, match="checkpointPolicy"):
            t.set_properties({"delta.checkpointPolicy": "v3"})
        df = spark.createDataFrame([(1, "a")], "pkey int, attr string")
        with pytest.raises(DeltaProtocolError, match="checkpointPolicy"):
            DeltaProtocolTable.create(
                spark, str(tmp_path / "bad"), df,
                properties={"delta.checkpointPolicy": "bogus"},
            )
