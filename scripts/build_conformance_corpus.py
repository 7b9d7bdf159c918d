#!/usr/bin/env python
"""Build the FOREIGN-ARTIFACT conformance corpus under
tests/fixtures/conformance/.

Every `_delta_log` here is byte-assembled per the public Delta
PROTOCOL.md spec sections using ONLY stdlib + pyarrow — this script
never imports mack_spark, so the corpus is an independent artifact the
engine's reader must conform to (the closest delta-spark-interop proxy
an offline sandbox allows; VERDICT r13 "Next round" #2). Generation is
DETERMINISTIC (fixed uuids, fixed timestamps) so the committed corpus
is reproducible byte-for-byte from this script.

Variants (one directory each, with `table/` + `expected.json`):

  classic_checkpoint    %020d.checkpoint.parquet + _last_checkpoint,
                        JSON below the checkpoint deleted (metadata-
                        cleanup shape) so replay MUST use the parquet
  multipart_checkpoint  %020d.checkpoint.%010d.%010d.parquet, parts=2
  v2_checkpoint         uuid-named checkpoint + checkpointMetadata +
                        sidecar file actions under _sidecars/
  dv_inline             add with storageType 'i' z85-inline deletion
                        vector (spec §Deletion Vector Format)
  dv_file               'u'-storage DV .bin (version byte, offset
                        framing, big-endian size + crc32)
  column_mapping_name   mode=name, col-<uuid> physical parquet names
  column_mapping_id     mode=id, parquet field ids, foreign physical
                        names that match NEITHER logical nor delta
                        physicalName
  identity              delta.identity.* schema metadata + high-water
                        mark, values present in data files
  ict                   inCommitTimestamps feature: monotonic
                        commitInfo.inCommitTimestamp + enablement keys
  row_tracking          baseRowId/defaultRowCommitVersion on adds,
                        rowTracking domainMetadata high-water mark
  partitioned           partitionValues-only layout (files exclude the
                        partition column; no col=val directories)

Run:  python scripts/build_conformance_corpus.py
"""

from __future__ import annotations

import json
import os
import shutil
import struct
import sys
import zlib

import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "conformance",
)

TS = 1700000000000  # fixed commitInfo timestamp for determinism


# ------------------------------------------------------------ low level


def _log_write(table: str, version: int, actions) -> None:
    logdir = os.path.join(table, "_delta_log")
    os.makedirs(logdir, exist_ok=True)
    with open(os.path.join(logdir, "%020d.json" % version), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")


def _data_file(table: str, name: str, cols: dict, field_ids=None) -> dict:
    """Write a parquet data file with pyarrow; returns the add action
    skeleton (path/size/modificationTime/dataChange)."""
    fields = []
    arrays = []
    for cname, values in cols.items():
        if isinstance(values, pa.Array):
            arr = values
        elif values and isinstance(values[0], bool):
            arr = pa.array(values, pa.bool_())
        elif values and isinstance(values[0], int):
            # schemaString 'integer' is int32 — parquet must match
            arr = pa.array(values, pa.int32())
        else:
            arr = pa.array(values)
        meta = None
        if field_ids and cname in field_ids:
            meta = {b"PARQUET:field_id": str(field_ids[cname]).encode()}
        fields.append(pa.field(cname, arr.type, True, metadata=meta))
        arrays.append(arr)
    tbl = pa.table(arrays, schema=pa.schema(fields))
    dest = os.path.join(table, name)
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    pq.write_table(tbl, dest, compression="snappy")
    return {
        "path": name,
        "partitionValues": {},
        "size": os.path.getsize(dest),
        "modificationTime": TS,
        "dataChange": True,
    }


def _schema_str(fields) -> str:
    return json.dumps({"type": "struct", "fields": fields})


def _meta(schema_fields, *, mid: str, partition=None, config=None) -> dict:
    return {
        "id": mid,
        "format": {"provider": "parquet", "options": {}},
        "schemaString": _schema_str(schema_fields),
        "partitionColumns": partition or [],
        "configuration": config or {},
        "createdTime": TS,
    }


def _field(name, typ, metadata=None):
    return {"name": name, "type": typ, "nullable": True,
            "metadata": metadata or {}}


def _commit_info(op: str, **extra) -> dict:
    return {"commitInfo": dict({"timestamp": TS, "operation": op}, **extra)}


# ------------------------------------------------ roaring DV assembling


def _roaring32(values) -> bytes:
    """One 32-bit roaring bitmap, RoaringFormatSpec NO_RUN cookie with
    array containers only (all fixture cardinalities ≤ 4096)."""
    by_key = {}
    for v in sorted(values):
        by_key.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(by_key)
    n = len(keys)
    out = bytearray()
    out += struct.pack("<I", 12346)  # SERIAL_COOKIE_NO_RUNCONTAINER
    out += struct.pack("<I", n)
    for k in keys:
        out += struct.pack("<HH", k, len(by_key[k]) - 1)
    # offset header: byte offset of each container's data from the
    # start of this bitmap (cookie position)
    header = 8 + 4 * n + 4 * n
    offsets = []
    pos = header
    for k in keys:
        offsets.append(pos)
        pos += 2 * len(by_key[k])
    for o in offsets:
        out += struct.pack("<I", o)
    for k in keys:
        for lo in by_key[k]:
            out += struct.pack("<H", lo)
    return bytes(out)


def _dv_bitmap(positions) -> bytes:
    """Serialized 64-bit RoaringBitmapArray ("portable"): magic,
    number of 32-bit maps, then (key32, roaring32) pairs."""
    by_hi = {}
    for p in sorted(positions):
        by_hi.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    out = bytearray()
    out += struct.pack("<i", 1681511377)  # magic
    out += struct.pack("<q", len(by_hi))
    for hi in sorted(by_hi):
        out += struct.pack("<I", hi)
        out += _roaring32(by_hi[hi])
    return bytes(out)


_Z85 = (
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    ".-:+=^!/*?&<>()[]{}@%$#"
)


def _z85_encode(data: bytes) -> str:
    if len(data) % 4:
        data = data + b"\x00" * (4 - len(data) % 4)
    out = []
    for i in range(0, len(data), 4):
        v = struct.unpack(">I", data[i:i + 4])[0]
        chunk = []
        for _ in range(5):
            chunk.append(_Z85[v % 85])
            v //= 85
        out.extend(reversed(chunk))
    return "".join(out)


# ------------------------------------------------ checkpoint assembling

_PROTO_T = pa.struct(
    [("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32())]
)
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
_TXN_T = pa.struct([("appId", pa.string()), ("version", pa.int64())])
_CP_SCHEMA = pa.schema([
    ("protocol", _PROTO_T), ("metaData", _META_T),
    ("add", _ADD_T), ("txn", _TXN_T),
])


def _cp_rows(proto, meta, adds, txns=()):
    blank = {"protocol": None, "metaData": None, "add": None, "txn": None}
    rows = [dict(blank, protocol=proto), dict(blank, metaData=meta)]
    rows += [dict(blank, add=dict(
        {"stats": None}, **a
    )) for a in adds]
    rows += [dict(blank, txn=t) for t in txns]
    return rows


def _write_cp(path: str, rows, schema=_CP_SCHEMA) -> None:
    pq.write_table(
        pa.Table.from_pylist(rows, schema=schema), path,
        compression="snappy",
    )


# ------------------------------------------------------------- variants


def _base_actions(mid: str):
    proto = {"minReaderVersion": 1, "minWriterVersion": 2}
    fields = [_field("k", "integer"), _field("v", "string")]
    return proto, fields, _meta(fields, mid=mid)


def build_classic_checkpoint(d: str):
    t = os.path.join(d, "table")
    proto, fields, meta = _base_actions("c0a5c1a5-0000-0000-0000-000000000001")
    adds = []
    for ver in range(5):
        add = _data_file(
            t, f"part-{ver:05d}-classic.snappy.parquet",
            {"k": [ver * 10 + j for j in range(3)],
             "v": [f"r{ver}{j}" for j in range(3)]},
        )
        adds.append(add)
        actions = [_commit_info("WRITE"), {"add": add}]
        if ver == 0:
            actions = [_commit_info("CREATE"), {"protocol": proto},
                       {"metaData": meta}, {"add": add}]
        _log_write(t, ver, actions)
    # classic checkpoint at v3 covering adds 0..3
    logdir = os.path.join(t, "_delta_log")
    _write_cp(
        os.path.join(logdir, "%020d.checkpoint.parquet" % 3),
        _cp_rows(proto, meta, adds[:4], txns=[{"appId": "app-x",
                                               "version": 7}]),
    )
    with open(os.path.join(logdir, "_last_checkpoint"), "w") as fh:
        json.dump({"version": 3, "size": 6}, fh)
    # metadata cleanup: JSON commits at/below the checkpoint are gone —
    # replay MUST come from the parquet
    for ver in range(4):
        os.unlink(os.path.join(logdir, "%020d.json" % ver))
    return {
        "rows": sorted(
            [ver * 10 + j, f"r{ver}{j}"]
            for ver in range(5) for j in range(3)
        ),
        "columns": ["k", "v"],
        "facts": {"version": 4, "txn_app_x": 7},
    }


def build_multipart_checkpoint(d: str):
    t = os.path.join(d, "table")
    proto, fields, meta = _base_actions("c0a5c1a5-0000-0000-0000-000000000002")
    adds = []
    for ver in range(3):
        add = _data_file(
            t, f"part-{ver:05d}-mp.snappy.parquet",
            {"k": [ver * 10 + j for j in range(2)],
             "v": [f"m{ver}{j}" for j in range(2)]},
        )
        adds.append(add)
        actions = [_commit_info("WRITE"), {"add": add}]
        if ver == 0:
            actions = [_commit_info("CREATE"), {"protocol": proto},
                       {"metaData": meta}, {"add": add}]
        _log_write(t, ver, actions)
    logdir = os.path.join(t, "_delta_log")
    # two parts: protocol/metaData + first add in part 1, rest in part 2
    _write_cp(
        os.path.join(logdir, "%020d.checkpoint.%010d.%010d.parquet"
                     % (2, 1, 2)),
        _cp_rows(proto, meta, adds[:1]),
    )
    _write_cp(
        os.path.join(logdir, "%020d.checkpoint.%010d.%010d.parquet"
                     % (2, 2, 2)),
        [{"protocol": None, "metaData": None, "txn": None,
          "add": dict({"stats": None}, **a)} for a in adds[1:]],
    )
    with open(os.path.join(logdir, "_last_checkpoint"), "w") as fh:
        json.dump({"version": 2, "size": 5, "parts": 2}, fh)
    for ver in range(3):
        os.unlink(os.path.join(logdir, "%020d.json" % ver))
    return {
        "rows": sorted(
            [ver * 10 + j, f"m{ver}{j}"]
            for ver in range(3) for j in range(2)
        ),
        "columns": ["k", "v"],
        "facts": {"version": 2},
    }


def build_v2_checkpoint(d: str):
    t = os.path.join(d, "table")
    proto = {
        "minReaderVersion": 3, "minWriterVersion": 7,
        "readerFeatures": ["v2Checkpoint"],
        "writerFeatures": ["v2Checkpoint"],
    }
    fields = [_field("k", "integer"), _field("v", "string")]
    meta = _meta(fields, mid="c0a5c1a5-0000-0000-0000-000000000003")
    adds = []
    for ver in range(3):
        add = _data_file(
            t, f"part-{ver:05d}-v2.snappy.parquet",
            {"k": [ver * 10 + j for j in range(2)],
             "v": [f"w{ver}{j}" for j in range(2)]},
        )
        adds.append(add)
        actions = [_commit_info("WRITE"), {"add": add}]
        if ver == 0:
            actions = [_commit_info("CREATE"), {"protocol": proto},
                       {"metaData": meta}, {"add": add}]
        _log_write(t, ver, actions)
    logdir = os.path.join(t, "_delta_log")
    sidecar_dir = os.path.join(logdir, "_sidecars")
    os.makedirs(sidecar_dir, exist_ok=True)
    sc_name = "00000000-0000-0000-0000-00000000aa01.parquet"
    sc_schema = pa.schema([("add", _ADD_T)])
    pq.write_table(
        pa.Table.from_pylist(
            [{"add": dict({"stats": None}, **a)} for a in adds],
            schema=sc_schema,
        ),
        os.path.join(sidecar_dir, sc_name), compression="snappy",
    )
    cpmeta_t = pa.struct([("version", pa.int64()),
                          ("flavor", pa.string())])
    sidecar_t = pa.struct([("path", pa.string()),
                           ("sizeInBytes", pa.int64())])
    v2_schema = pa.schema([
        ("protocol", _PROTO_T), ("metaData", _META_T),
        ("checkpointMetadata", cpmeta_t), ("sidecar", sidecar_t),
    ])
    blank = {"protocol": None, "metaData": None,
             "checkpointMetadata": None, "sidecar": None}
    rows = [
        dict(blank, checkpointMetadata={"version": 2, "flavor": "flat"}),
        dict(blank, protocol=proto),
        dict(blank, metaData=meta),
        dict(blank, sidecar={
            "path": sc_name,
            "sizeInBytes": os.path.getsize(
                os.path.join(sidecar_dir, sc_name)
            ),
        }),
    ]
    pq.write_table(
        pa.Table.from_pylist(rows, schema=v2_schema),
        os.path.join(
            logdir,
            "%020d.checkpoint.00000000-0000-0000-0000-00000000bb01"
            ".parquet" % 2,
        ),
        compression="snappy",
    )
    with open(os.path.join(logdir, "_last_checkpoint"), "w") as fh:
        json.dump({"version": 2, "size": 4}, fh)
    for ver in range(3):
        os.unlink(os.path.join(logdir, "%020d.json" % ver))
    return {
        "rows": sorted(
            [ver * 10 + j, f"w{ver}{j}"]
            for ver in range(3) for j in range(2)
        ),
        "columns": ["k", "v"],
        "facts": {"version": 2},
    }


def _dv_proto():
    return {
        "minReaderVersion": 3, "minWriterVersion": 7,
        "readerFeatures": ["deletionVectors"],
        "writerFeatures": ["deletionVectors"],
    }


def build_dv_inline(d: str):
    t = os.path.join(d, "table")
    fields = [_field("k", "integer"), _field("v", "string")]
    meta = _meta(fields, mid="c0a5c1a5-0000-0000-0000-000000000004")
    add = _data_file(
        t, "part-00000-dvi.snappy.parquet",
        {"k": list(range(10)), "v": [f"d{j}" for j in range(10)]},
    )
    _log_write(t, 0, [
        _commit_info("CREATE"), {"protocol": _dv_proto()},
        {"metaData": meta}, {"add": add},
    ])
    # delete rows 2, 3, 7 via an INLINE deletion vector
    bitmap = _dv_bitmap([2, 3, 7])
    add2 = dict(add, dataChange=False, deletionVector={
        "storageType": "i",
        "pathOrInlineDv": _z85_encode(bitmap),
        "offset": None,
        "sizeInBytes": len(bitmap),
        "cardinality": 3,
    })
    _log_write(t, 1, [
        _commit_info("DELETE"),
        {"remove": {"path": add["path"], "deletionTimestamp": TS,
                    "dataChange": True}},
        {"add": add2},
    ])
    return {
        "rows": sorted(
            [j, f"d{j}"] for j in range(10) if j not in (2, 3, 7)
        ),
        "columns": ["k", "v"],
        "facts": {"version": 1},
    }


def build_dv_file(d: str):
    t = os.path.join(d, "table")
    fields = [_field("k", "integer"), _field("v", "string")]
    meta = _meta(fields, mid="c0a5c1a5-0000-0000-0000-000000000005")
    add = _data_file(
        t, "part-00000-dvf.snappy.parquet",
        {"k": list(range(8)), "v": [f"f{j}" for j in range(8)]},
    )
    _log_write(t, 0, [
        _commit_info("CREATE"), {"protocol": _dv_proto()},
        {"metaData": meta}, {"add": add},
    ])
    # 'u'-storage DV file: version byte, then [size BE][bitmap][crc BE]
    import uuid as _uuid

    dv_uuid = _uuid.UUID("00000000-0000-0000-0000-00000000dd01")
    bitmap = _dv_bitmap([0, 5])
    blob = bytearray(b"\x01")
    offset = len(blob)
    blob += struct.pack(">i", len(bitmap))
    blob += bitmap
    blob += struct.pack(">I", zlib.crc32(bitmap) & 0xFFFFFFFF)
    with open(os.path.join(
        t, f"deletion_vector_{dv_uuid}.bin"
    ), "wb") as fh:
        fh.write(bytes(blob))
    add2 = dict(add, dataChange=False, deletionVector={
        "storageType": "u",
        "pathOrInlineDv": _z85_encode(dv_uuid.bytes),
        "offset": offset,
        "sizeInBytes": len(bitmap),
        "cardinality": 2,
    })
    _log_write(t, 1, [
        _commit_info("DELETE"),
        {"remove": {"path": add["path"], "deletionTimestamp": TS,
                    "dataChange": True}},
        {"add": add2},
    ])
    return {
        "rows": sorted([j, f"f{j}"] for j in range(8) if j not in (0, 5)),
        "columns": ["k", "v"],
        "facts": {"version": 1},
    }


def build_column_mapping_name(d: str):
    t = os.path.join(d, "table")
    phys = {"k": "col-aaaa0001", "v": "col-aaaa0002"}
    fields = [
        _field("k", "integer", {
            "delta.columnMapping.id": 1,
            "delta.columnMapping.physicalName": phys["k"],
        }),
        _field("v", "string", {
            "delta.columnMapping.id": 2,
            "delta.columnMapping.physicalName": phys["v"],
        }),
    ]
    meta = _meta(
        fields, mid="c0a5c1a5-0000-0000-0000-000000000006",
        config={"delta.columnMapping.mode": "name",
                "delta.columnMapping.maxColumnId": "2"},
    )
    add = _data_file(
        t, "part-00000-cmn.snappy.parquet",
        {phys["k"]: [1, 2, 3], phys["v"]: ["a", "b", "c"]},
        field_ids={phys["k"]: 1, phys["v"]: 2},
    )
    _log_write(t, 0, [
        _commit_info("CREATE"),
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": meta}, {"add": add},
    ])
    return {
        "rows": [[1, "a"], [2, "b"], [3, "c"]],
        "columns": ["k", "v"],
        "facts": {"version": 0},
    }


def build_column_mapping_id(d: str):
    t = os.path.join(d, "table")
    fields = [
        _field("k", "integer", {
            "delta.columnMapping.id": 1,
            "delta.columnMapping.physicalName": "col-bbbb0001",
        }),
        _field("v", "string", {
            "delta.columnMapping.id": 2,
            "delta.columnMapping.physicalName": "col-bbbb0002",
        }),
    ]
    meta = _meta(
        fields, mid="c0a5c1a5-0000-0000-0000-000000000007",
        config={"delta.columnMapping.mode": "id",
                "delta.columnMapping.maxColumnId": "2"},
    )
    # id-mode resolves by parquet FIELD ID: physical column names in
    # the file match neither the logical nor the delta physicalName
    add = _data_file(
        t, "part-00000-cmi.snappy.parquet",
        {"iceberg_a": [7, 8], "iceberg_b": ["x", "y"]},
        field_ids={"iceberg_a": 1, "iceberg_b": 2},
    )
    _log_write(t, 0, [
        _commit_info("CREATE"),
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": meta}, {"add": add},
    ])
    return {
        "rows": [[7, "x"], [8, "y"]],
        "columns": ["k", "v"],
        "facts": {"version": 0},
    }


def build_identity(d: str):
    t = os.path.join(d, "table")
    fields = [
        _field("rid", "long", {
            "delta.identity.start": 1,
            "delta.identity.step": 1,
            "delta.identity.highWaterMark": 4,
            "delta.identity.allowExplicitInsert": False,
        }),
        _field("v", "string"),
    ]
    meta = _meta(fields, mid="c0a5c1a5-0000-0000-0000-000000000008")
    add = _data_file(
        t, "part-00000-id.snappy.parquet",
        {"rid": pa.array([1, 2, 3, 4], pa.int64()),
         "v": ["a", "b", "c", "d"]},
    )
    _log_write(t, 0, [
        _commit_info("CREATE"),
        {"protocol": {
            "minReaderVersion": 1, "minWriterVersion": 7,
            "writerFeatures": ["identityColumns"],
        }},
        {"metaData": meta}, {"add": add},
    ])
    return {
        "rows": [[1, "a"], [2, "b"], [3, "c"], [4, "d"]],
        "columns": ["rid", "v"],
        "facts": {"version": 0, "identity_hwm": 4},
    }


def build_ict(d: str):
    t = os.path.join(d, "table")
    fields = [_field("k", "integer"), _field("v", "string")]
    meta = _meta(
        fields, mid="c0a5c1a5-0000-0000-0000-000000000009",
        config={
            "delta.enableInCommitTimestamps": "true",
            "delta.inCommitTimestampEnablementVersion": "0",
            "delta.inCommitTimestampEnablementTimestamp": str(TS),
        },
    )
    icts = [TS, TS + 5000, TS + 9000]
    for ver in range(3):
        add = _data_file(
            t, f"part-{ver:05d}-ict.snappy.parquet",
            {"k": [ver], "v": [f"t{ver}"]},
        )
        ci = {"commitInfo": {
            "timestamp": TS, "operation": "WRITE",
            "inCommitTimestamp": icts[ver],
        }}
        actions = [ci, {"add": add}]
        if ver == 0:
            actions = [ci, {"protocol": {
                "minReaderVersion": 1, "minWriterVersion": 7,
                "writerFeatures": ["inCommitTimestamp"],
            }}, {"metaData": meta}, {"add": add}]
        _log_write(t, ver, actions)
    return {
        "rows": [[0, "t0"], [1, "t1"], [2, "t2"]],
        "columns": ["k", "v"],
        "facts": {"version": 2, "icts": icts},
    }


def build_row_tracking(d: str):
    t = os.path.join(d, "table")
    fields = [_field("k", "integer"), _field("v", "string")]
    meta = _meta(
        fields, mid="c0a5c1a5-0000-0000-0000-00000000000a",
        config={"delta.enableRowTracking": "true"},
    )
    add0 = _data_file(
        t, "part-00000-rt.snappy.parquet",
        {"k": [0, 1, 2], "v": ["a", "b", "c"]},
    )
    add0["baseRowId"] = 0
    add0["defaultRowCommitVersion"] = 0
    _log_write(t, 0, [
        _commit_info("CREATE"),
        # rowTracking is a WRITER feature (spec §Row Tracking): readers
        # that ignore it still read the data correctly
        {"protocol": {
            "minReaderVersion": 1, "minWriterVersion": 7,
            "writerFeatures": ["rowTracking", "domainMetadata"],
        }},
        {"metaData": meta},
        {"domainMetadata": {
            "domain": "delta.rowTracking",
            "configuration": json.dumps({"rowIdHighWaterMark": 2}),
            "removed": False,
        }},
        {"add": add0},
    ])
    add1 = _data_file(
        t, "part-00001-rt.snappy.parquet",
        {"k": [3, 4], "v": ["d", "e"]},
    )
    add1["baseRowId"] = 3
    add1["defaultRowCommitVersion"] = 1
    _log_write(t, 1, [
        _commit_info("WRITE"),
        {"domainMetadata": {
            "domain": "delta.rowTracking",
            "configuration": json.dumps({"rowIdHighWaterMark": 4}),
            "removed": False,
        }},
        {"add": add1},
    ])
    return {
        "rows": [[0, "a"], [1, "b"], [2, "c"], [3, "d"], [4, "e"]],
        "columns": ["k", "v"],
        "facts": {"version": 1,
                  "row_ids": {"0": 0, "1": 1, "2": 2, "3": 3, "4": 4}},
    }


def build_partitioned(d: str):
    t = os.path.join(d, "table")
    fields = [_field("k", "integer"), _field("v", "string"),
              _field("p", "string")]
    meta = _meta(fields, mid="c0a5c1a5-0000-0000-0000-00000000000b",
                 partition=["p"])
    # files exclude the partition column and DON'T use col=val dirs —
    # partitionValues in the log is the only authority (spec allows
    # any layout)
    a1 = _data_file(t, "part-00000-pa.snappy.parquet",
                    {"k": [1, 2], "v": ["a", "b"]})
    a1["partitionValues"] = {"p": "east"}
    a2 = _data_file(t, "part-00001-pa.snappy.parquet",
                    {"k": [3], "v": ["c"]})
    a2["partitionValues"] = {"p": "west"}
    _log_write(t, 0, [
        _commit_info("CREATE"),
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": meta}, {"add": a1}, {"add": a2},
    ])
    return {
        "rows": [[1, "a", "east"], [2, "b", "east"], [3, "c", "west"]],
        "columns": ["k", "v", "p"],
        "facts": {"version": 0},
    }


def build_log_compaction(d: str):
    """Foreign ``<start>.<end>.compacted.json`` (spec §Log Compaction
    Files): versions 1-3's reconciled actions in one file — including
    the commitInfo lines foreign writers keep — with the covered raw
    JSONs DELETED, so replay MUST substitute the compaction."""
    t = os.path.join(d, "table")
    proto, fields, meta = _base_actions(
        "c0a5c1a5-0000-0000-0000-00000000000c"
    )
    adds = []
    for ver in range(5):
        add = _data_file(
            t, f"part-{ver:05d}-lc.snappy.parquet",
            {"k": [ver * 10 + j for j in range(2)],
             "v": [f"c{ver}{j}" for j in range(2)]},
        )
        adds.append(add)
        actions = [_commit_info("WRITE"), {"add": add}]
        if ver == 0:
            actions = [_commit_info("CREATE"), {"protocol": proto},
                       {"metaData": meta}, {"add": add}]
        _log_write(t, ver, actions)
    logdir = os.path.join(t, "_delta_log")
    # versions 1-3 compact into one file; v2's add was REMOVED in v3's
    # span, so the compaction carries the remove reconciliation —
    # rewrite v3 first to be a delete of v2's file
    os.unlink(os.path.join(logdir, "%020d.json" % 3))
    _log_write(t, 3, [
        _commit_info("DELETE"),
        {"remove": {"path": adds[2]["path"], "deletionTimestamp": TS,
                    "dataChange": True}},
    ])
    compacted = [
        _commit_info("COMPACTION"),
        {"add": adds[1]},
        # net effect of v2 add + v3 remove: a REMOVE tombstone (a
        # pre-span add of the same path must still erase)
        {"remove": {"path": adds[2]["path"], "deletionTimestamp": TS,
                    "dataChange": True}},
    ]
    with open(os.path.join(
        logdir, "%020d.%020d.compacted.json" % (1, 3)
    ), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in compacted) + "\n")
    for ver in (1, 2, 3):
        os.unlink(os.path.join(logdir, "%020d.json" % ver))
    live = [0, 1, 4]  # v2's file removed by v3; v3 itself adds nothing
    return {
        "rows": sorted(
            [ver * 10 + j, f"c{ver}{j}"]
            for ver in live for j in range(2)
        ),
        "columns": ["k", "v"],
        "facts": {"version": 4},
    }


def build_type_widening(d: str):
    """A FOREIGN widened table (spec §Type Widening): v0 writes k as
    integer / amt as float, v1 is a delta-spark-style CHANGE COLUMN
    commit (schema widened to long/double, delta.typeChanges recorded,
    reader+writer feature declared), v2 appends a file whose PHYSICAL
    types are already wide. The reader must upcast the v0 file and read
    the v2 file natively, under one snapshot schema."""
    t = os.path.join(d, "table")
    narrow = [_field("k", "integer"), _field("amt", "float")]
    meta0 = _meta(narrow, mid="c0a5c1a5-0000-0000-0000-00000000000d")
    add0 = _data_file(
        t, "part-00000-narrow.snappy.parquet",
        {"k": pa.array([1, 2], pa.int32()),
         "amt": pa.array([1.5, 2.5], pa.float32())},
    )
    _log_write(t, 0, [
        _commit_info("CREATE"),
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": meta0}, {"add": add0},
    ])
    wide = [
        _field("k", "long", {"delta.typeChanges": [
            {"fromType": "integer", "toType": "long", "tableVersion": 1},
        ]}),
        _field("amt", "double", {"delta.typeChanges": [
            {"fromType": "float", "toType": "double", "tableVersion": 1},
        ]}),
    ]
    meta1 = _meta(wide, mid="c0a5c1a5-0000-0000-0000-00000000000d")
    _log_write(t, 1, [
        _commit_info("CHANGE COLUMN"),
        {"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["typeWidening"],
            "writerFeatures": ["appendOnly", "invariants",
                               "typeWidening"],
        }},
        {"metaData": meta1},
    ])
    add2 = _data_file(
        t, "part-00002-wide.snappy.parquet",
        {"k": pa.array([2**40], pa.int64()),
         "amt": pa.array([3.25], pa.float64())},
    )
    _log_write(t, 2, [_commit_info("WRITE"), {"add": add2}])
    return {
        "rows": [[1, 1.5], [2, 2.5], [2**40, 3.25]],
        "columns": ["k", "amt"],
        "facts": {"version": 2, "widened": ["k", "amt"]},
    }


def build_stats_parsed_checkpoint(d: str):
    """A Databricks-style checkpoint written under
    ``delta.checkpoint.writeStatsAsJson=false``: add rows carry ONLY
    the ``stats_parsed`` STRUCT (no ``stats`` JSON string). The reader
    must re-encode the struct so footer-based file skipping keeps
    working on the foreign table."""
    t = os.path.join(d, "table")
    proto, fields, meta = _base_actions(
        "c0a5c1a5-0000-0000-0000-00000000000e"
    )
    adds = []
    for ver in range(3):
        add = _data_file(
            t, f"part-{ver:05d}-sp.snappy.parquet",
            {"k": [ver * 10 + j for j in range(3)],
             "v": [f"s{ver}{j}" for j in range(3)]},
        )
        adds.append(add)
        actions = [_commit_info("WRITE"), {"add": add}]
        if ver == 0:
            actions = [_commit_info("CREATE"), {"protocol": proto},
                       {"metaData": meta}, {"add": add}]
        _log_write(t, ver, actions)
    stats_t = pa.struct([
        ("numRecords", pa.int64()),
        ("minValues", pa.struct([("k", pa.int64()),
                                 ("v", pa.string())])),
        ("maxValues", pa.struct([("k", pa.int64()),
                                 ("v", pa.string())])),
        ("nullCount", pa.struct([("k", pa.int64()),
                                 ("v", pa.int64())])),
    ])
    add_t = pa.struct([
        ("path", pa.string()),
        ("partitionValues", pa.map_(pa.string(), pa.string())),
        ("size", pa.int64()),
        ("modificationTime", pa.int64()),
        ("dataChange", pa.bool_()),
        ("stats_parsed", stats_t),
    ])
    schema = pa.schema([
        ("protocol", _PROTO_T), ("metaData", _META_T), ("add", add_t),
    ])
    blank = {"protocol": None, "metaData": None, "add": None}
    rows = [dict(blank, protocol=proto), dict(blank, metaData=meta)]
    for ver, a in enumerate(adds):
        sp = {
            "numRecords": 3,
            "minValues": {"k": ver * 10, "v": f"s{ver}0"},
            "maxValues": {"k": ver * 10 + 2, "v": f"s{ver}2"},
            "nullCount": {"k": 0, "v": 0},
        }
        rows.append(dict(blank, add=dict(
            {k: v for k, v in a.items() if k != "stats"},
            stats_parsed=sp,
        )))
    logdir = os.path.join(t, "_delta_log")
    pq.write_table(
        pa.Table.from_pylist(rows, schema=schema),
        os.path.join(logdir, "%020d.checkpoint.parquet" % 2),
        compression="snappy",
    )
    with open(os.path.join(logdir, "_last_checkpoint"), "w") as fh:
        json.dump({"version": 2, "size": len(rows)}, fh)
    for ver in range(3):
        os.unlink(os.path.join(logdir, "%020d.json" % ver))
    return {
        "rows": sorted(
            [ver * 10 + j, f"s{ver}{j}"]
            for ver in range(3) for j in range(3)
        ),
        "columns": ["k", "v"],
        "facts": {
            "version": 2,
            "stats_from_struct": {
                f"part-{ver:05d}-sp.snappy.parquet": [ver * 10,
                                                      ver * 10 + 2]
                for ver in range(3)
            },
        },
    }


def build_stats_parsed_dv_checkpoint(d: str):
    """Round 15: struct-only stats AND a deletion vector in the SAME
    foreign checkpoint — the reader must both re-encode stats_parsed
    for skipping and honor the DV descriptor (dropping either
    resurrects rows or loses bounds)."""
    t = os.path.join(d, "table")
    fields = [_field("k", "integer"), _field("v", "string")]
    meta = _meta(fields, mid="c0a5c1a5-0000-0000-0000-00000000000f")
    proto = _dv_proto()
    add0 = _data_file(
        t, "part-00000-spdv.snappy.parquet",
        {"k": list(range(10)), "v": [f"a{j}" for j in range(10)]},
    )
    add1 = _data_file(
        t, "part-00001-spdv.snappy.parquet",
        {"k": [100 + j for j in range(5)],
         "v": [f"b{j}" for j in range(5)]},
    )
    _log_write(t, 0, [
        _commit_info("CREATE"), {"protocol": proto},
        {"metaData": meta}, {"add": add0}, {"add": add1},
    ])
    bitmap = _dv_bitmap([1, 4])  # delete k=1, k=4 from file 0
    dv = {
        "storageType": "i",
        "pathOrInlineDv": _z85_encode(bitmap),
        "offset": None,
        "sizeInBytes": len(bitmap),
        "cardinality": 2,
    }
    add0_dv = dict(add0, dataChange=False, deletionVector=dv)
    _log_write(t, 1, [
        _commit_info("DELETE"),
        {"remove": {"path": add0["path"], "deletionTimestamp": TS,
                    "dataChange": True}},
        {"add": add0_dv},
    ])
    # checkpoint at v1: struct-only stats + the DV descriptor
    stats_t = pa.struct([
        ("numRecords", pa.int64()),
        ("minValues", pa.struct([("k", pa.int64()), ("v", pa.string())])),
        ("maxValues", pa.struct([("k", pa.int64()), ("v", pa.string())])),
        ("nullCount", pa.struct([("k", pa.int64()), ("v", pa.int64())])),
    ])
    dv_t = pa.struct([
        ("storageType", pa.string()), ("pathOrInlineDv", pa.string()),
        ("offset", pa.int32()), ("sizeInBytes", pa.int32()),
        ("cardinality", pa.int64()),
    ])
    add_t = pa.struct([
        ("path", pa.string()),
        ("partitionValues", pa.map_(pa.string(), pa.string())),
        ("size", pa.int64()),
        ("modificationTime", pa.int64()),
        ("dataChange", pa.bool_()),
        ("deletionVector", dv_t),
        ("stats_parsed", stats_t),
    ])
    proto_t = pa.struct([
        ("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32()),
        ("readerFeatures", pa.list_(pa.string())),
        ("writerFeatures", pa.list_(pa.string())),
    ])
    schema = pa.schema([
        ("protocol", proto_t), ("metaData", _META_T), ("add", add_t),
    ])
    blank = {"protocol": None, "metaData": None, "add": None}
    rows = [dict(blank, protocol=proto), dict(blank, metaData=meta)]
    rows.append(dict(blank, add={
        "path": add0["path"], "partitionValues": {},
        "size": add0["size"], "modificationTime": TS,
        "dataChange": False, "deletionVector": dv,
        "stats_parsed": {
            "numRecords": 10,
            "minValues": {"k": 0, "v": "a0"},
            "maxValues": {"k": 9, "v": "a9"},
            "nullCount": {"k": 0, "v": 0},
        },
    }))
    rows.append(dict(blank, add={
        "path": add1["path"], "partitionValues": {},
        "size": add1["size"], "modificationTime": TS,
        "dataChange": True, "deletionVector": None,
        "stats_parsed": {
            "numRecords": 5,
            "minValues": {"k": 100, "v": "b0"},
            "maxValues": {"k": 104, "v": "b4"},
            "nullCount": {"k": 0, "v": 0},
        },
    }))
    logdir = os.path.join(t, "_delta_log")
    pq.write_table(
        pa.Table.from_pylist(rows, schema=schema),
        os.path.join(logdir, "%020d.checkpoint.parquet" % 1),
        compression="snappy",
    )
    with open(os.path.join(logdir, "_last_checkpoint"), "w") as fh:
        json.dump({"version": 1, "size": len(rows)}, fh)
    for ver in range(2):
        os.unlink(os.path.join(logdir, "%020d.json" % ver))
    return {
        "rows": sorted(
            [[j, f"a{j}"] for j in range(10) if j not in (1, 4)]
            + [[100 + j, f"b{j}"] for j in range(5)]
        ),
        "columns": ["k", "v"],
        "facts": {
            "version": 1,
            "stats_from_struct": {
                "part-00001-spdv.snappy.parquet": [100, 104],
            },
        },
    }


def build_liquid_clustered(d: str):
    """Round 15: a FOREIGN liquid-clustered table — clustering columns
    in the ``delta.clustering`` domain, cluster-written files tagged
    ``clusteringProvider: liquid``. The reader must surface the
    clustering columns and an incremental OPTIMIZE must leave
    right-sized liquid files untouched while re-clustering the
    untagged tail."""
    t = os.path.join(d, "table")
    fields = [_field("k", "integer"), _field("v", "string")]
    meta = _meta(fields, mid="c0a5c1a5-0000-0000-0000-000000000010")
    proto = {
        "minReaderVersion": 3, "minWriterVersion": 7,
        "readerFeatures": ["v2Checkpoint"],
        "writerFeatures": ["clustering", "domainMetadata",
                           "v2Checkpoint"],
    }
    add0 = _data_file(
        t, "part-00000-liq.snappy.parquet",
        {"k": list(range(5)), "v": [f"c{j}" for j in range(5)]},
    )
    add0 = dict(add0, tags={"clusteringProvider": "liquid"})
    _log_write(t, 0, [
        _commit_info("CLUSTER BY"), {"protocol": proto},
        {"metaData": meta},
        {"domainMetadata": {
            "domain": "delta.clustering",
            "configuration": json.dumps(
                {"clusteringColumns": [["k"]]}
            ),
            "removed": False,
        }},
        {"add": add0},
    ])
    add1 = _data_file(
        t, "part-00001-tail.snappy.parquet",
        {"k": [10 + j for j in range(3)],
         "v": [f"t{j}" for j in range(3)]},
    )
    _log_write(t, 1, [_commit_info("WRITE"), {"add": add1}])
    return {
        "rows": sorted(
            [[j, f"c{j}"] for j in range(5)]
            + [[10 + j, f"t{j}"] for j in range(3)]
        ),
        "columns": ["k", "v"],
        "facts": {
            "version": 1,
            "clustering_columns": ["k"],
            "liquid_files": ["part-00000-liq.snappy.parquet"],
            "tail_files": ["part-00001-tail.snappy.parquet"],
        },
    }


def build_type_widening_preview_mapped(d: str):
    """Round 15: type widening under the PREVIEW feature naming
    (delta-spark 3.x wrote ``typeWidening-preview``) on a COLUMN-MAPPED
    table — narrow and wide physical files coexist under physical
    names; the reader must resolve mapping AND upcast per file."""
    t = os.path.join(d, "table")
    phys_k, phys_amt = "col-7f001", "col-7f002"
    narrow = [
        _field("k", "integer", {
            "delta.columnMapping.id": 1,
            "delta.columnMapping.physicalName": phys_k,
        }),
        _field("amt", "float", {
            "delta.columnMapping.id": 2,
            "delta.columnMapping.physicalName": phys_amt,
        }),
    ]
    cfg = {
        "delta.columnMapping.mode": "name",
        "delta.columnMapping.maxColumnId": "2",
    }
    meta0 = _meta(
        narrow, mid="c0a5c1a5-0000-0000-0000-000000000011", config=cfg
    )
    proto0 = {
        "minReaderVersion": 2, "minWriterVersion": 5,
    }
    add0 = _data_file(
        t, "part-00000-nrw.snappy.parquet",
        {phys_k: pa.array([1, 2], pa.int32()),
         phys_amt: pa.array([1.5, 2.5], pa.float32())},
    )
    _log_write(t, 0, [
        _commit_info("CREATE"), {"protocol": proto0},
        {"metaData": meta0}, {"add": add0},
    ])
    wide = [
        _field("k", "long", {
            "delta.columnMapping.id": 1,
            "delta.columnMapping.physicalName": phys_k,
            "delta.typeChanges": [
                {"fromType": "integer", "toType": "long",
                 "tableVersion": 1},
            ],
        }),
        _field("amt", "double", {
            "delta.columnMapping.id": 2,
            "delta.columnMapping.physicalName": phys_amt,
            "delta.typeChanges": [
                {"fromType": "float", "toType": "double",
                 "tableVersion": 1},
            ],
        }),
    ]
    meta1 = _meta(
        wide, mid="c0a5c1a5-0000-0000-0000-000000000011", config=cfg
    )
    _log_write(t, 1, [
        _commit_info("CHANGE COLUMN"),
        {"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["columnMapping", "typeWidening-preview"],
            "writerFeatures": ["columnMapping", "typeWidening-preview"],
        }},
        {"metaData": meta1},
    ])
    add2 = _data_file(
        t, "part-00002-wde.snappy.parquet",
        {phys_k: pa.array([2**41], pa.int64()),
         phys_amt: pa.array([4.75], pa.float64())},
    )
    _log_write(t, 2, [_commit_info("WRITE"), {"add": add2}])
    return {
        "rows": [[1, 1.5], [2, 2.5], [2**41, 4.75]],
        "columns": ["k", "amt"],
        "facts": {
            "version": 2,
            "widened": ["k", "amt"],
            "physical": {"k": phys_k, "amt": phys_amt},
        },
    }


BUILDERS = {
    "log_compaction": build_log_compaction,
    "classic_checkpoint": build_classic_checkpoint,
    "multipart_checkpoint": build_multipart_checkpoint,
    "v2_checkpoint": build_v2_checkpoint,
    "dv_inline": build_dv_inline,
    "dv_file": build_dv_file,
    "column_mapping_name": build_column_mapping_name,
    "column_mapping_id": build_column_mapping_id,
    "identity": build_identity,
    "ict": build_ict,
    "row_tracking": build_row_tracking,
    "partitioned": build_partitioned,
    "type_widening": build_type_widening,
    "stats_parsed_checkpoint": build_stats_parsed_checkpoint,
    "stats_parsed_dv_checkpoint": build_stats_parsed_dv_checkpoint,
    "liquid_clustered": build_liquid_clustered,
    "type_widening_preview_mapped": build_type_widening_preview_mapped,
}


def main() -> None:
    shutil.rmtree(ROOT, ignore_errors=True)
    for name, fn in sorted(BUILDERS.items()):
        d = os.path.join(ROOT, name)
        os.makedirs(d, exist_ok=True)
        expected = fn(d)
        with open(os.path.join(d, "expected.json"), "w") as fh:
            json.dump(expected, fh, indent=1, sort_keys=True)
        print(f"built {name}: {len(expected['rows'])} rows")
    print(f"corpus at {ROOT}")


if __name__ == "__main__":
    sys.exit(main())
