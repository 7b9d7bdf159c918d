"""Structured-Streaming source for open-protocol Delta tables.

``spark.readStream.format("delta_protocol").option("path", ...)`` over
a :class:`~mack_spark.sources.delta_log.DeltaProtocolTable`, built on
PySpark 4's Python DataSource API. Semantics follow Delta's streaming
source (the reference's substrate exposes the same contract through
delta-spark):

* an OFFSET is a log version; each microbatch is exactly the ``add``
  actions with ``dataChange: true`` committed in ``(start, end]`` —
  so OPTIMIZE/compaction commits (``dataChange: false``,
  delta_log.py ``optimize``) are invisible to the stream by
  construction, no duplicates;
* ``startingVersion`` option: ``0`` (default) streams the existing
  table as the first batch then increments; ``"latest"`` streams only
  commits after stream start; any integer starts at that version;
* ``maxFilesPerTrigger`` / ``maxBytesPerTrigger`` (Delta's admission
  control): each microbatch admits at most N data files / ~N bytes
  (always at least one file, so progress is guaranteed). The offset
  gains a file index within the version (``{"version": v, "index":
  i}``), so a 100 TB initial snapshot drains as a sequence of bounded
  microbatches instead of one giant batch. Without these options the
  offsets stay version-only — byte-compatible with checkpoints written
  before rate limiting existed. One caveat imposed by the Python
  DataSource API (no admission-control hook, so the reader tracks its
  own driver-side cursor): ``Trigger.AvailableNow`` captures ONE
  latest offset up front, so a rate-limited availableNow RUN processes
  a single bounded chunk and terminates (repeated runs make progress;
  use a ``processingTime`` trigger — the continuous-ingestion case —
  to drain a backlog in bounded batches, or drop the limit for a
  one-shot full drain). Restarts are exact: the engine re-plans the
  checkpointed batch before asking for a new offset, which re-seeds
  the cursor;
* a commit that REMOVES data (DELETE/UPDATE/MERGE rewrite) is not
  streamable — the source raises Delta's "data update detected" error
  unless ``skipChangeCommits=true`` (ignore the whole commit) or
  ``ignoreChanges=true`` (emit its adds anyway — documented to produce
  re-processed rows, same as Delta);
* exactly-once across restarts comes from the engine checkpointing the
  version offsets; ``partitions()`` re-derives the same files for the
  same (start, end] replay.

SCALE: offsets and planning are driver-side log metadata (KBs);
``read()`` executes per FILE on the executors (one InputPartition per
add action), so a microbatch of N files fans out N-wide — the same
shape as Delta's own file-based streaming source.
"""

from __future__ import annotations

import datetime
import json
import os
from typing import Iterator, List, Optional, Sequence, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

FORMAT_NAME = "delta_protocol"


class DeltaStreamChangeError(RuntimeError):
    """A commit in the offset range rewrites or removes existing data;
    append-only streaming cannot represent it (Delta raises the same
    way — pass skipChangeCommits/ignoreChanges to opt out)."""


def _parse_bytes(v) -> int:
    """'10g' / '512m' / '64k' / plain int → bytes (Delta's
    maxBytesPerTrigger accepts byte-size strings)."""
    s = str(v).strip().lower()
    if s.endswith("b"):
        s = s[:-1]
    mult = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}
    if s and s[-1] in mult:
        return int(float(s[:-1]) * mult[s[-1]])
    return int(s)


def _decode_partition_value(raw, dtype_simple: str):
    """A ``partitionValues`` string as the Python value Spark should
    ingest for the declared type (spec: stored as strings)."""
    if raw is None or raw == "__HIVE_DEFAULT_PARTITION__":
        return None
    if dtype_simple in ("int", "bigint", "smallint", "tinyint"):
        return int(raw)
    if dtype_simple in ("double", "float"):
        return float(raw)
    if dtype_simple.startswith("decimal"):
        import decimal

        return decimal.Decimal(raw)
    if dtype_simple == "boolean":
        return raw == "true"
    if dtype_simple == "date":
        return datetime.date.fromisoformat(raw)
    if dtype_simple in ("timestamp", "timestamp_ntz"):
        return datetime.datetime.fromisoformat(raw)
    return raw


class _AddFilePartition(InputPartition):
    """One committed data file: everything an executor needs to turn it
    into rows, picklable."""

    def __init__(self, abs_path: str, field_names: List[str],
                 part_values: dict, part_types: dict, schema_json: str):
        self.abs_path = abs_path
        self.field_names = field_names  # full output order
        self.part_values = part_values  # col -> raw string (or None)
        self.part_types = part_types    # col -> simpleString type
        self.schema_json = schema_json  # full StructType json


class DeltaProtocolStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self._schema = schema
        self._path = options.get("path")
        if not self._path:
            raise ValueError("delta_protocol requires .option('path', ...)")
        self._path = os.path.abspath(self._path)
        self._skip_change = (
            str(options.get("skipchangecommits", "false")).lower() == "true"
        )
        self._ignore_changes = (
            str(options.get("ignorechanges", "false")).lower() == "true"
        )
        self._starting = str(options.get("startingversion", "0"))
        mf = options.get("maxfilespertrigger")
        self._max_files = int(mf) if mf is not None else None
        mb = options.get("maxbytespertrigger")
        self._max_bytes = _parse_bytes(mb) if mb is not None else None
        self._limited = (
            self._max_files is not None or self._max_bytes is not None
        )
        # driver-side admission cursor: the last offset this reader
        # returned/planned. Lives for the stream's run; after a process
        # restart it re-seeds from initialOffset or the first
        # partitions()/commit() call (whichever the engine issues).
        self._cursor: Optional[dict] = None
        self._table = _table(self._path)

    # -- offsets --------------------------------------------------------

    @staticmethod
    def _off_key(off: dict):
        """Total order over offsets; a missing index means the whole
        version is consumed (version-only offsets sort after any
        indexed offset of the same version)."""
        i = off.get("index")
        return (int(off["version"]), float("inf") if i is None else int(i))

    def _advance_cursor(self, off: dict) -> None:
        if self._cursor is None or self._off_key(off) > self._off_key(
            self._cursor
        ):
            self._cursor = dict(off)

    def initialOffset(self) -> dict:
        if self._starting == "latest":
            off = {"version": self._table.snapshot().version}
        else:
            # first batch covers versions >= startingVersion, i.e.
            # (startingVersion - 1, head]
            off = {"version": int(self._starting) - 1}
        self._advance_cursor(off)
        return off

    def latestOffset(self) -> dict:
        head = self._table.snapshot().version
        if not self._limited:
            return {"version": head}
        base = self._cursor
        if base is None:
            # A fresh stream: the engine calls latestOffset BEFORE
            # initialOffset on first start, while a RESTART always
            # re-plans the checkpointed batch first (partitions() seeds
            # the cursor) — both observed engine behaviors are pinned in
            # tests. So an unseeded cursor means no history: walk from
            # startingVersion, which bounds the very first microbatch
            # over an existing table (the 100 TB initial-snapshot case).
            # Defensive invariant if an engine ever calls latestOffset
            # first after a restart: a stale-low offset only yields
            # empty batches (partitions plans strictly (start, end] and
            # returns nothing when end <= start) until the cursor
            # catches up — rows are never replayed.
            if self._starting == "latest":
                base = {"version": head}
            else:
                base = {"version": int(self._starting) - 1}
        v = int(base["version"])
        i = base.get("index")
        if i is None:
            v, i = v + 1, 0
        files = bytes_ = 0
        end_v, end_i = v - 1, None  # nothing admitted yet
        while v <= head:
            adds = self._version_adds(v)
            while i < len(adds):
                a = adds[i]
                nf, nb = files + 1, bytes_ + int(a.get("size", 0))
                if files > 0 and (
                    (self._max_files is not None and nf > self._max_files)
                    or (self._max_bytes is not None and nb > self._max_bytes)
                ):
                    off = {"version": v, "index": i}
                    self._advance_cursor(off)
                    return off
                files, bytes_ = nf, nb
                i += 1
            end_v, end_i = v, len(adds)
            if (
                self._max_files is not None and files >= self._max_files
            ) or (
                self._max_bytes is not None and bytes_ >= self._max_bytes
            ):
                break
            v, i = v + 1, 0
        if end_i is None:
            off = dict(base)
        else:
            off = {"version": end_v, "index": end_i}
        self._advance_cursor(off)
        return off

    def commit(self, end: dict) -> None:
        # the engine's checkpoint is the source of truth; track it so
        # the admission cursor survives whatever call order the engine
        # uses around restarts
        self._advance_cursor(end)

    # -- planning (driver) ---------------------------------------------

    def _version_adds(self, v: int) -> List[dict]:
        """The dataChange add actions a streaming batch emits for
        commit ``v``, after change-commit handling: a commit that
        removes data yields [] under skipChangeCommits, its adds under
        ignoreChanges, and raises otherwise. Used by BOTH the admission
        walk and partition planning, so file indexes always agree."""
        vf = os.path.join(self._path, "_delta_log", "%020d.json" % v)
        if not os.path.exists(vf):
            raise DeltaStreamChangeError(
                f"log version {v} of {self._path} is gone (checkpoint-"
                "compacted or vacuumed); restart the stream with "
                ".option('startingVersion', 'latest')"
            )
        adds, has_change = [], False
        with open(vf) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "remove" in action and action["remove"].get(
                    "dataChange", True
                ):
                    has_change = True
                if "add" in action and action["add"].get(
                    "dataChange", True
                ):
                    adds.append(action["add"])
        if has_change:
            if self._skip_change:
                return []  # drop the whole commit, like Delta
            if not self._ignore_changes:
                raise DeltaStreamChangeError(
                    f"commit {v} of {self._path} updates or deletes "
                    "existing rows; streaming is append-only. Use "
                    ".option('skipChangeCommits', 'true') to drop such "
                    "commits or .option('ignoreChanges', 'true') to "
                    "emit their rewritten files (may re-process rows)."
                )
        return adds

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = int(start["version"]), int(end["version"])
        lo_i = start.get("index")  # None: version lo fully consumed
        hi_i = end.get("index")    # None: version hi fully included
        self._advance_cursor(end)
        snap = self._table.snapshot(version_as_of=hi)
        pcols = snap.partition_columns
        types = {
            f.name: f.dataType.simpleString() for f in snap.schema.fields
        }
        names = [f.name for f in snap.schema.fields]
        first_v = lo if lo_i is not None else lo + 1
        out: List[InputPartition] = []
        for v in range(first_v, hi + 1):
            adds = self._version_adds(v)
            a_lo = lo_i if (v == lo and lo_i is not None) else 0
            a_hi = hi_i if (v == hi and hi_i is not None) else len(adds)
            for a in adds[a_lo:a_hi]:
                out.append(
                    _AddFilePartition(
                        os.path.join(self._path, a["path"]),
                        names,
                        dict(a.get("partitionValues") or {}),
                        {c: types[c] for c in pcols},
                        snap.schema.json(),
                    )
                )
        return out

    # -- execution (executors) -----------------------------------------

    def read(self, partition: InputPartition) -> Iterator:
        return _read_add_file(partition)


def _read_add_file(p: _AddFilePartition) -> Iterator:
    """Executor-side: the file becomes Arrow RecordBatches cast to the
    schema Spark expects — zero per-row Python. The tuple path survives
    as a fallback for exotic types Arrow can't cast. Shared by the
    streaming and batch readers."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pq.read_table(p.abs_path)
    consts = {
        c: _decode_partition_value(v, p.part_types[c])
        for c, v in p.part_values.items()
        if c in p.part_types
    }
    try:
        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(StructType.fromJson(
            json.loads(p.schema_json)
        ))
        file_cols = set(table.column_names)
        cols = []
        for name in p.field_names:
            t = target.field(name).type
            if name in consts:
                cols.append(
                    pa.array([consts[name]] * table.num_rows, type=t)
                )
            elif name not in file_cols:
                # file committed before a mergeSchema evolution: the
                # column does not exist physically — NULL-fill, same as
                # to_df()'s explicit-schema parquet read
                cols.append(pa.nulls(table.num_rows, type=t))
            else:
                cols.append(table.column(name).cast(t).combine_chunks())
        yield from pa.Table.from_arrays(cols, schema=target).to_batches()
        return
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError, KeyError):
        pass  # fall back to row tuples below
    data = {name: col.to_pylist() for name, col in
            zip(table.column_names, table.columns)}
    for i in range(table.num_rows):
        yield tuple(
            consts[name] if name in consts
            else (data[name][i] if name in data else None)
            for name in p.field_names
        )


def _table(path: str):
    """A driver-side log walker. DeltaProtocolTable's replay is pure
    Python + pyarrow; the SparkSession member is only used by its
    read/write methods, which this source never calls."""
    from mack_spark.sources.delta_log import DeltaProtocolTable

    return DeltaProtocolTable(None, path)


class DeltaProtocolBatchReader(DataSourceReader):
    """``spark.read.format('delta_protocol')``: one InputPartition per
    live file of the snapshot (``versionAsOf`` time travel supported),
    planned from driver-side log metadata, read executor-side through
    the same Arrow path as the stream.

    Note: :meth:`DeltaProtocolTable.to_df` remains the primary batch
    path — it hands Spark's native parquet reader the live files, so
    predicate pushdown and column pruning reach the scan. This reader
    exists for format-string interop (catalogs, tooling, languages
    that only speak ``spark.read.format``)."""

    def __init__(self, options: dict):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("delta_protocol requires .option('path', ...)")
        self._path = os.path.abspath(self._path)
        v = options.get("versionasof")
        self._version = int(v) if v is not None else None

    def partitions(self) -> Sequence[InputPartition]:
        snap = _table(self._path).snapshot(version_as_of=self._version)
        pcols = snap.partition_columns
        types = {
            f.name: f.dataType.simpleString() for f in snap.schema.fields
        }
        names = [f.name for f in snap.schema.fields]
        schema_json = snap.schema.json()
        return [
            _AddFilePartition(
                os.path.join(self._path, p),
                names,
                dict(a.get("partitionValues") or {}),
                {c: types[c] for c in pcols},
                schema_json,
            )
            for p, a in snap.files.items()
        ]

    def read(self, partition: InputPartition) -> Iterator:
        return _read_add_file(partition)


class DeltaProtocolDataSource(DataSource):
    """``spark.dataSource.register(DeltaProtocolDataSource)`` then
    ``spark.read.format('delta_protocol').option('path', p)`` (batch,
    ``versionAsOf`` time travel) or
    ``spark.readStream.format('delta_protocol').option('path', p)``."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        path = self.options.get("path")
        if not path:
            raise ValueError("delta_protocol requires .option('path', ...)")
        v = self.options.get("versionasof")
        return _table(os.path.abspath(path)).snapshot(
            version_as_of=int(v) if v is not None else None
        ).schema

    def reader(self, schema) -> DeltaProtocolBatchReader:
        return DeltaProtocolBatchReader(dict(self.options))

    def streamReader(self, schema) -> DeltaProtocolStreamReader:
        return DeltaProtocolStreamReader(schema, dict(self.options))


def register(spark) -> None:
    """Idempotent registration of the delta_protocol streaming format."""
    spark.dataSource.register(DeltaProtocolDataSource)
