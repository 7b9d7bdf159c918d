"""Open-protocol Delta Lake tables: reader, transactional writer, and
keyed-MERGE executor built directly on the PUBLIC spec
(github.com/delta-io/delta PROTOCOL.md) — no delta-spark on the
classpath required.

The reference (mack) executes everything through ``DeltaTable``
(reference mack/__init__.py:125-139, :190-192, :253-255, :410-412);
this sandbox cannot install delta-spark, and prior rounds verified the
compiled :class:`~mack_spark.tables.KeyedMerge` descriptors only
against a recording fake. This module closes that gap honestly: a
Delta table IS an open format — a ``_delta_log`` of JSON commits over
plain parquet data files — so the protocol itself is implemented here
and every commit this module writes is a REAL Delta transaction:

* **commits** are put-if-absent creations of
  ``_delta_log/%020d.json`` (``open(..., "x")`` = O_EXCL), the exact
  optimistic-concurrency rule the spec mandates for filesystem stores;
  a lost race surfaces as
  :class:`~mack_spark.tables.ConcurrentModificationError`;
* **actions** follow the spec: ``protocol`` (reader 1 / writer 2),
  ``metaData`` (Spark-JSON ``schemaString``, ``partitionColumns``,
  ``configuration``), ``add`` (relative path, ``partitionValues``,
  ``size``, JSON ``stats`` with numRecords/minValues/maxValues/
  nullCount), ``remove``, ``commitInfo``;
* **checkpoints**: every ``CHECKPOINT_INTERVAL`` commits the snapshot
  is compacted to ``%020d.checkpoint.parquet`` + ``_last_checkpoint``,
  so replay cost is bounded by the interval, not the table's age —
  the same log-compaction story that keeps million-commit tables
  readable at 100 TB. Foreign checkpoints are read tolerantly (only
  spec field names are assumed);
* **reads** resolve a snapshot (latest or ``version_as_of`` — time
  travel) and hand Spark ONLY the active files, with
  ``basePath``-anchored partition-directory recovery and stats-based
  file skipping for key-range predicates;
* **merge** executes a :class:`~mack_spark.tables.KeyedMerge`
  two-phase, the way Delta's own MERGE does: phase 1 prunes to the
  files whose stats overlap the source key range (everything else is
  untouched — not rewritten, not even read); phase 2 rewrites just
  those files through the clause interpreter and commits
  ``remove`` + ``add`` atomically in one version.

SCALE: the log is driver-side metadata (KBs per commit); all sample
data moves through Spark jobs. File skipping turns a keyed merge of a
small batch into O(touched files), not O(table). What is intentionally
NOT here: vacuum (removed files stay on disk until a retention pass),
deletion vectors / column mapping (reader/writer features above
protocol 1/2 raise loudly instead of misreading data).
"""

from __future__ import annotations

import datetime
import json
import os
import time
import uuid
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

CHECKPOINT_INTERVAL = 10
# stats are collected for the first N schema columns, the spec's
# dataSkippingNumIndexedCols shape
STATS_COLS = 32


class DeltaProtocolError(RuntimeError):
    """The table's log demands protocol features this reader/writer
    does not implement (we never guess at data we can't interpret)."""


def _log_dir(path: str) -> str:
    return os.path.join(path, "_delta_log")


def _version_file(path: str, version: int) -> str:
    return os.path.join(_log_dir(path), "%020d.json" % version)


def _checkpoint_file(path: str, version: int) -> str:
    return os.path.join(_log_dir(path), "%020d.checkpoint.parquet" % version)


def _now_ms() -> int:
    return int(time.time() * 1000)


def _json_stat_value(v):
    """A parquet footer min/max as the JSON value Delta stats carry."""
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (int, float, str, bool)) or v is None:
        return v
    return None


def _collect_file_stats(abs_path: str, stat_cols: List[str]) -> str:
    """Per-file Delta ``stats`` JSON from the parquet footer (pyarrow —
    no Spark job): numRecords + min/max/nullCount for the indexed
    columns. Columns whose physical stats are absent or non-JSON-able
    are simply omitted (allowed by the spec; skipping falls back to
    'cannot prune')."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(abs_path).metadata
    mins: Dict[str, object] = {}
    maxs: Dict[str, object] = {}
    nulls: Dict[str, int] = {}
    name_to_idx = {md.schema.column(i).path: i for i in range(md.num_columns)}
    for col in stat_cols:
        i = name_to_idx.get(col)
        if i is None:
            continue
        lo = hi = None
        nn = 0
        have = True
        for rg in range(md.num_row_groups):
            cs = md.row_group(rg).column(i).statistics
            if cs is None or not cs.has_min_max:
                have = False
                break
            nn += cs.null_count if cs.null_count is not None else 0
            lo = cs.min if lo is None or cs.min < lo else lo
            hi = cs.max if hi is None or cs.max > hi else hi
        if not have:
            continue
        jlo, jhi = _json_stat_value(lo), _json_stat_value(hi)
        if jlo is None or jhi is None:
            continue
        mins[col] = jlo
        maxs[col] = jhi
        nulls[col] = nn
    return json.dumps(
        {
            "numRecords": md.num_rows,
            "minValues": mins,
            "maxValues": maxs,
            "nullCount": nulls,
        }
    )


def _decode_partition_value(raw: Optional[str], dtype):
    """A ``partitionValues`` string as the typed value Spark should see
    (spec: values are stored as strings; NULL is a missing/null
    entry)."""
    if raw is None or raw == "__HIVE_DEFAULT_PARTITION__":
        return None
    t = dtype.simpleString()
    if t in ("int", "bigint", "smallint", "tinyint"):
        return int(raw)
    if t in ("double", "float"):
        return float(raw)
    if t == "boolean":
        return raw == "true"
    if t == "date":
        return datetime.date.fromisoformat(raw)
    if t == "timestamp":
        return datetime.datetime.fromisoformat(raw)
    return raw


class DeltaSnapshot:
    """An immutable view of the table at one log version."""

    def __init__(self, version: int, metadata: dict, protocol: dict,
                 files: Dict[str, dict], history: List[dict]):
        self.version = version
        self.metadata = metadata
        self.protocol = protocol
        self.files = files  # path -> add action
        self.history = history

    @property
    def schema(self) -> StructType:
        return StructType.fromJson(json.loads(self.metadata["schemaString"]))

    @property
    def partition_columns(self) -> List[str]:
        return list(self.metadata.get("partitionColumns") or [])

    def file_stats(self, path: str) -> Optional[dict]:
        raw = self.files[path].get("stats")
        return json.loads(raw) if raw else None


class DeltaProtocolTable:
    """Handle to a Delta-protocol table on a local/shared filesystem."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = os.path.abspath(path)

    # ------------------------------------------------------------------
    # log replay
    # ------------------------------------------------------------------

    @staticmethod
    def is_delta(path: str) -> bool:
        d = _log_dir(os.path.abspath(path))
        if not os.path.isdir(d):
            return False
        return any(
            f.endswith(".json") or f.endswith(".checkpoint.parquet")
            for f in os.listdir(d)
        )

    def _log_versions(self) -> List[int]:
        d = _log_dir(self.path)
        if not os.path.isdir(d):
            return []
        out = []
        for f in os.listdir(d):
            if f.endswith(".json") and f[:-5].isdigit():
                out.append(int(f[:-5]))
        return sorted(out)

    def _read_last_checkpoint(self) -> Optional[int]:
        p = os.path.join(_log_dir(self.path), "_last_checkpoint")
        if not os.path.exists(p):
            return None
        try:
            with open(p) as fh:
                return int(json.load(fh)["version"])
        except (ValueError, KeyError, OSError):
            return None

    def _checkpoint_actions(self, version: int) -> List[dict]:
        """Actions from a checkpoint parquet, tolerant of extra fields
        (a foreign writer's checkpoint schema is wider than ours)."""
        import pyarrow.parquet as pq

        rows = pq.read_table(_checkpoint_file(self.path, version)).to_pylist()
        actions = []
        for row in rows:
            for kind in ("protocol", "metaData", "add", "remove"):
                val = row.get(kind)
                if val is not None and any(v is not None for v in val.values()):
                    if kind == "add" and isinstance(val.get("partitionValues"), list):
                        # pyarrow map type round-trips as [(k, v), ...]
                        val = dict(val, partitionValues=dict(val["partitionValues"]))
                    actions.append({kind: val})
        return actions

    def snapshot(self, version_as_of: Optional[int] = None) -> DeltaSnapshot:
        """Replay the log (checkpoint + JSON tail) to a snapshot.
        ``version_as_of`` reads the table as of that commit — Delta
        time travel."""
        versions = self._log_versions()
        if not versions and self._read_last_checkpoint() is None:
            raise FileNotFoundError(f"no Delta log at {self.path}")
        files: Dict[str, dict] = {}
        metadata: Optional[dict] = None
        protocol: Optional[dict] = None
        history: List[dict] = []

        start, last = 0, -1
        cp = self._read_last_checkpoint()
        if cp is not None and (version_as_of is None or cp <= version_as_of):
            for action in self._checkpoint_actions(cp):
                self._apply(action, files, history)
                metadata = action.get("metaData") or metadata
                protocol = action.get("protocol") or protocol
            start, last = cp + 1, cp
        for v in versions:
            if v < start:
                continue
            if version_as_of is not None and v > version_as_of:
                break
            with open(_version_file(self.path, v)) as fh:
                for line in fh:
                    line = line.strip()
                    if not line:
                        continue
                    action = json.loads(line)
                    self._apply(action, files, history, version=v)
                    metadata = action.get("metaData") or metadata
                    protocol = action.get("protocol") or protocol
            last = v
        if metadata is None or protocol is None:
            raise DeltaProtocolError(
                f"log at {self.path} has no metaData/protocol action"
            )
        if protocol.get("minReaderVersion", 1) > 2:
            raise DeltaProtocolError(
                f"table requires reader version {protocol['minReaderVersion']}"
                " (deletion vectors / column mapping are not implemented)"
            )
        return DeltaSnapshot(last, metadata, protocol, files, history)

    @staticmethod
    def _apply(action: dict, files: Dict[str, dict], history: List[dict],
               version: Optional[int] = None) -> None:
        if "add" in action:
            files[action["add"]["path"]] = action["add"]
        elif "remove" in action:
            files.pop(action["remove"]["path"], None)
        elif "commitInfo" in action and version is not None:
            history.append(dict(action["commitInfo"], version=version))

    # ------------------------------------------------------------------
    # reads
    # ------------------------------------------------------------------

    def to_df(self, version_as_of: Optional[int] = None) -> DataFrame:
        snap = self.snapshot(version_as_of)
        return self._read_files(snap, list(snap.files))

    def _read_files(self, snap: DeltaSnapshot, paths: List[str]) -> DataFrame:
        schema = snap.schema
        if not paths:
            return self.spark.createDataFrame([], schema)
        abs_paths = [os.path.join(self.path, p) for p in paths]
        if snap.partition_columns:
            # partition values live in the directory names, not the
            # files; basePath makes Spark re-derive them, and the cast
            # pins the declared types (directory strings infer loosely)
            df = (
                self.spark.read.option("basePath", self.path)
                .parquet(*abs_paths)
            )
            return df.select(
                *[F.col(f.name).cast(f.dataType) for f in schema.fields]
            )
        df = self.spark.read.parquet(*abs_paths)
        return df.select(*[f.name for f in schema.fields])

    def history(self) -> List[dict]:
        """commitInfo rows, newest first (DESCRIBE HISTORY shape)."""
        return list(reversed(self.snapshot().history))

    def detail(self) -> dict:
        snap = self.snapshot()
        return {
            "format": "delta",
            "location": self.path,
            "numFiles": len(snap.files),
            "sizeInBytes": sum(a.get("size", 0) for a in snap.files.values()),
            "partitionColumns": snap.partition_columns,
            "properties": dict(snap.metadata.get("configuration") or {}),
            "version": snap.version,
        }

    # ------------------------------------------------------------------
    # writes
    # ------------------------------------------------------------------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        df: DataFrame,
        partition_by: Optional[List[str]] = None,
        properties: Optional[Dict[str, str]] = None,
    ) -> "DeltaProtocolTable":
        """CREATE TABLE AS SELECT: data files + version-0 commit with
        protocol/metaData/add actions."""
        t = cls(spark, path)
        if cls.is_delta(path):
            raise FileExistsError(f"Delta table already exists at {path}")
        os.makedirs(_log_dir(t.path), exist_ok=True)
        partition_by = list(partition_by or [])
        adds = t._write_data_files(df, partition_by)
        meta = {
            "id": str(uuid.uuid4()),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": df.schema.json(),
            "partitionColumns": partition_by,
            "configuration": dict(properties or {}),
            "createdTime": _now_ms(),
        }
        actions = (
            [
                {"commitInfo": {"timestamp": _now_ms(),
                                "operation": "CREATE TABLE AS SELECT",
                                "operationParameters": {}}},
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
                {"metaData": meta},
            ]
            + [{"add": a} for a in adds]
        )
        t._commit(0, actions)
        return t

    def _write_data_files(
        self, df: DataFrame, partition_by: List[str]
    ) -> List[dict]:
        """Write ``df`` as parquet through a staging dir, move the part
        files into the table root (same filesystem — atomic renames),
        and return their ``add`` actions with footer stats. Partitioned
        writes keep their ``col=value`` directory layout and record the
        values in ``partitionValues`` (the files themselves do not
        contain partition columns, per the spec)."""
        staging = os.path.join(self.path, f"_staging_{uuid.uuid4().hex}")
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(staging)
        data_cols = [c for c in df.columns if c not in partition_by]
        adds: List[dict] = []
        for root, _dirs, fnames in os.walk(staging):
            for fn in fnames:
                if not fn.endswith(".parquet"):
                    continue
                src = os.path.join(root, fn)
                rel_dir = os.path.relpath(root, staging)
                part_values: Dict[str, Optional[str]] = {}
                if rel_dir != ".":
                    for seg in rel_dir.split(os.sep):
                        k, _, v = seg.partition("=")
                        part_values[k] = (
                            None if v == "__HIVE_DEFAULT_PARTITION__" else v
                        )
                    dest_dir = os.path.join(self.path, rel_dir)
                    os.makedirs(dest_dir, exist_ok=True)
                    rel_path = os.path.join(rel_dir, fn)
                else:
                    rel_path = fn
                stats = _collect_file_stats(src, data_cols[:STATS_COLS])
                if json.loads(stats)["numRecords"] == 0:
                    continue  # Spark's empty-partition placeholder files
                dest = os.path.join(self.path, rel_path)
                os.rename(src, dest)
                adds.append(
                    {
                        "path": rel_path.replace(os.sep, "/"),
                        "partitionValues": part_values,
                        "size": os.path.getsize(dest),
                        "modificationTime": _now_ms(),
                        "dataChange": True,
                        "stats": stats,
                    }
                )
        import shutil

        shutil.rmtree(staging, ignore_errors=True)
        return adds

    def _commit(self, version: int, actions: List[dict]) -> None:
        """Put-if-absent commit of one log version — the spec's
        filesystem concurrency rule. Losing the race raises
        ConcurrentModificationError (the caller's snapshot is stale)."""
        from mack_spark.tables import ConcurrentModificationError

        payload = "\n".join(json.dumps(a, separators=(",", ":")) for a in actions)
        try:
            with open(_version_file(self.path, version), "x") as fh:
                fh.write(payload + "\n")
        except FileExistsError:
            raise ConcurrentModificationError(
                f"version {version} of {self.path} was committed by another "
                "writer after this operation's snapshot read — re-read and "
                "retry the operation"
            )
        if version > 0 and version % CHECKPOINT_INTERVAL == 0:
            self._write_checkpoint(version)

    def _write_checkpoint(self, version: int) -> None:
        """Compact the snapshot at ``version`` into a checkpoint parquet
        + ``_last_checkpoint`` pointer (spec §Checkpoints). Replay after
        this reads one parquet + the JSON tail."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        snap = self.snapshot(version_as_of=version)
        rows = (
            [{"protocol": snap.protocol, "metaData": snap.metadata,
              "add": None}]
            + [{"protocol": None, "metaData": None, "add": a}
               for a in snap.files.values()]
        )
        proto_t = pa.struct(
            [("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32())]
        )
        meta_t = pa.struct(
            [
                ("id", pa.string()),
                ("format", pa.struct([("provider", pa.string())])),
                ("schemaString", pa.string()),
                ("partitionColumns", pa.list_(pa.string())),
                ("configuration", pa.map_(pa.string(), pa.string())),
                ("createdTime", pa.int64()),
            ]
        )
        add_t = pa.struct(
            [
                ("path", pa.string()),
                ("partitionValues", pa.map_(pa.string(), pa.string())),
                ("size", pa.int64()),
                ("modificationTime", pa.int64()),
                ("dataChange", pa.bool_()),
                ("stats", pa.string()),
            ]
        )

        def shape_meta(m):
            if m is None:
                return None
            return {
                "id": m.get("id"),
                "format": {"provider": (m.get("format") or {}).get("provider", "parquet")},
                "schemaString": m.get("schemaString"),
                "partitionColumns": list(m.get("partitionColumns") or []),
                "configuration": list((m.get("configuration") or {}).items()),
                "createdTime": m.get("createdTime"),
            }

        def shape_add(a):
            if a is None:
                return None
            return {
                "path": a["path"],
                "partitionValues": list((a.get("partitionValues") or {}).items()),
                "size": a.get("size"),
                "modificationTime": a.get("modificationTime"),
                "dataChange": bool(a.get("dataChange", True)),
                "stats": a.get("stats"),
            }

        table = pa.table(
            {
                "protocol": pa.array([r["protocol"] for r in rows], type=proto_t),
                "metaData": pa.array(
                    [shape_meta(r["metaData"]) for r in rows], type=meta_t
                ),
                "add": pa.array([shape_add(r["add"]) for r in rows], type=add_t),
            }
        )
        pq.write_table(table, _checkpoint_file(self.path, version))
        with open(os.path.join(_log_dir(self.path), "_last_checkpoint"), "w") as fh:
            json.dump({"version": version, "size": len(rows)}, fh)

    def append(self, df: DataFrame, max_retries: int = 3) -> None:
        """Transactional append. Appends commute, so a lost commit race
        is retried against the new head (Delta's blind-append rule)."""
        adds = self._write_data_files(df, self.snapshot().partition_columns)
        from mack_spark.tables import ConcurrentModificationError

        actions = [
            {"commitInfo": {"timestamp": _now_ms(), "operation": "WRITE",
                            "operationParameters": {"mode": "Append"}}}
        ] + [{"add": a} for a in adds]
        for _ in range(max_retries + 1):
            v = self.snapshot().version
            try:
                self._commit(v + 1, actions)
                return
            except ConcurrentModificationError:
                continue
        raise ConcurrentModificationError(
            f"append to {self.path} lost {max_retries + 1} commit races"
        )

    def overwrite(self, df: DataFrame) -> None:
        """Transactional overwrite: remove every live file, add the new
        ones, one commit."""
        snap = self.snapshot()
        adds = self._write_data_files(df, snap.partition_columns)
        actions = (
            [
                {"commitInfo": {"timestamp": _now_ms(), "operation": "WRITE",
                                "operationParameters": {"mode": "Overwrite"}}}
            ]
            + [
                {"remove": {"path": p, "deletionTimestamp": _now_ms(),
                            "dataChange": True}}
                for p in snap.files
            ]
            + [{"add": a} for a in adds]
        )
        self._commit(snap.version + 1, actions)

    # ------------------------------------------------------------------
    # keyed MERGE — the two-phase, file-pruned execution
    # ------------------------------------------------------------------

    def _prunable_range(self, snap: DeltaSnapshot, path: str, col: str):
        st = snap.file_stats(path)
        if not st:
            return None
        lo = (st.get("minValues") or {}).get(col)
        hi = (st.get("maxValues") or {}).get(col)
        if lo is None or hi is None:
            return None
        return lo, hi

    def merge(self, km) -> dict:
        """Execute a :class:`~mack_spark.tables.KeyedMerge` as one Delta
        commit. Requires the descriptor's file-skipping contract
        (``target_key_col``/``source_key_col``): the condition implies
        key equality, so a file whose ``[min, max]`` key range contains
        no source key cannot hold a matched row and is left untouched
        (not read, not rewritten) — Delta MERGE's phase-1 skip.

        Returns ``{touched_files, total_files, version}`` so callers
        can observe the pruning.
        """
        from mack_spark.merge_exec import interpret_keyed_merge

        if not km.target_key_col or not km.source_key_col:
            raise ValueError(
                "DeltaProtocolTable.merge needs the KeyedMerge file-"
                "skipping contract (target_key_col/source_key_col)"
            )
        snap = self.snapshot()
        # the exact source key set (bounded collect: merge batches are
        # small relative to the table by contract; past the cap the
        # skip degrades to the min/max envelope, never to wrong rows)
        key_cap = 1_000_000
        keys = [
            r[0]
            for r in km.source.select(km.source_key_col)
            .where(F.col(km.source_key_col).isNotNull())
            .distinct()
            .limit(key_cap + 1)
            .collect()
        ]
        exact = len(keys) <= key_cap
        if keys and isinstance(keys[0], (datetime.date, datetime.datetime)):
            # footer stats were JSON-ized to ISO strings; ISO order ==
            # chronological order, so bisect still works
            keys = [k.isoformat() for k in keys]
        keys.sort()
        import bisect

        touched: List[str] = []
        for p in snap.files:
            rng = self._prunable_range(snap, p, km.target_key_col)
            if rng is None or not keys:
                touched.append(p)  # no stats / all-NULL source keys
                continue
            flo, fhi = rng
            try:
                if exact:
                    i = bisect.bisect_left(keys, flo)
                    hit = i < len(keys) and keys[i] <= fhi
                else:
                    hit = not (fhi < keys[0] or flo > keys[-1])
            except TypeError:
                hit = True  # incomparable stats: don't prune
            if hit:
                touched.append(p)
        base = self._read_files(snap, touched)
        merged = interpret_keyed_merge(base, km)
        adds = self._write_data_files(merged, snap.partition_columns)
        actions = (
            [
                {"commitInfo": {
                    "timestamp": _now_ms(), "operation": "MERGE",
                    "operationParameters": {"predicate": km.condition},
                    "operationMetrics": {
                        "numTargetFilesRemoved": len(touched),
                        "numTargetFilesAdded": len(adds),
                    },
                }}
            ]
            + [
                {"remove": {"path": p, "deletionTimestamp": _now_ms(),
                            "dataChange": True}}
                for p in touched
            ]
            + [{"add": a} for a in adds]
        )
        self._commit(snap.version + 1, actions)
        return {
            "touched_files": len(touched),
            "total_files": len(snap.files),
            "version": snap.version + 1,
        }
