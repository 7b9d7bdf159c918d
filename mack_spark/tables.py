"""Versioned-parquet managed tables — the engine's transactional substrate.

The reference (MrPowers/mack) is a library of operations over Delta Lake
tables: ACID parquet + a ``_delta_log`` (reference mack/__init__.py:4 and
all ``DeltaTable`` call sites). This environment has no delta-spark, so
the engine supplies a minimal table layout with the same *observable*
metadata surface the reference consumes:

* a version counter + operation history  (→ ``latest_version``,
  reference mack/__init__.py:616-627)
* table properties incl. check constraints (→ ``constraint_append``,
  reference mack/__init__.py:658-661)
* declared column nullability              (→ NOT-NULL constraint harvest,
  reference mack/__init__.py:664-667)
* partition columns + file statistics      (→ ``copy_table`` /
  ``delta_file_sizes``, reference mack/__init__.py:310, :469)

Layout::

    <path>/_mack_meta.json      commit pointer + metadata (atomic rename)
    <path>/v=<K>/*.parquet      snapshot directory for commit K

Appends add parquet files to the current snapshot directory (no rewrite,
distributed write). Mutations (merge-like ops) materialize the post-state
into a fresh ``v=K`` directory then atomically swing the meta pointer —
readers never observe a half-written snapshot.

SCALE: this layer is a test-environment stand-in. At 100 TB the same
operator code paths run against Delta (``.write.format("delta")`` and
``DeltaTable.merge``) — every operator in this package expresses its
post-state / staged rows as a single lazy DataFrame plan, which is
exactly what Delta MERGE consumes, so swapping the commit layer does not
touch operator logic. The parquet backend's full-snapshot rewrite on
merge is the one place Delta is strictly better (file-pruned rewrite);
the plan shape (join → filter → union) is identical.
"""

from __future__ import annotations

import dataclasses
import datetime
import json
import os
import pathlib
import shutil
import time
import uuid
from typing import Dict, List, Optional, Union
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

META_FILE = "_mack_meta.json"
COMMITS_DIR = "_commits"
# A commit marker older than this whose version was never finalized is
# treated as the debris of a crashed writer and may be reclaimed by the
# next claimer (Delta-style stale-transaction cleanup). Large enough
# that no live writer sits between claim and finalize this long (both
# are driver-local metadata writes, microseconds apart).
STALE_COMMIT_TTL_SECONDS = 300.0


@dataclasses.dataclass
class KeyedMerge:
    """Declarative description of a keyed MERGE, for backends with a
    native MERGE executor (Delta Lake). Operators that can express
    their mutation as match/insert/delete clauses attach one of these
    alongside the post-state plan; the parquet ManagedTable ignores it
    (it commits the post-state), while DeltaBackedTable compiles it to
    ``DeltaTable.merge`` — Delta then rewrites only files with matching
    keys (reference mack/__init__.py:125-139), the file-pruned behavior
    the reference gets for free.

    ``condition`` and every expression string are SQL over
    ``target_alias`` / ``source_alias`` columns, exactly as
    ``DeltaTable.alias(...).merge(...)`` consumes them.
    ``not_matched_insert`` is either the string ``"*"``
    (``whenNotMatchedInsertAll``) or a column→expression map;
    ``matched_update`` likewise accepts ``"*"``
    (``whenMatchedUpdateAll`` — every target column takes the
    same-named source column when the source has one, else keeps its
    value). ``matched_delete`` is True or a condition string.
    """

    source: DataFrame
    condition: str
    target_alias: str = "t"
    source_alias: str = "s"
    matched_update: Union[str, Dict[str, str], None] = None
    matched_update_condition: Optional[str] = None
    matched_delete: Union[bool, str, None] = None
    not_matched_insert: Union[str, Dict[str, str], None] = None
    # Optional insert-clause condition (Delta's whenNotMatchedInsert
    # condition=): a source row matching no target row inserts only when
    # this SQL evaluates true (NULL = false).
    not_matched_condition: Optional[str] = None
    # Delta's whenNotMatchedBySource clauses (delta-spark 2.3+): act on
    # TARGET rows no source row matched — the SCD-style prune/flag
    # side of MERGE. Update first, then delete (same first-applicable
    # ordering as the matched clauses); expressions may reference the
    # target alias only (source columns are all-NULL on these rows).
    not_matched_by_source_update: Optional[Dict[str, str]] = None
    not_matched_by_source_update_condition: Optional[str] = None
    not_matched_by_source_delete: Union[bool, str, None] = None
    # Optional file-skipping contract: when set, the builder asserts
    # that ``condition`` IMPLIES ``t.target_key_col = s.source_key_col``
    # (``<=>`` when null_safe) — i.e. a target row can only match when
    # its key equals some source key. ManagedTable then executes the
    # descriptor natively with file-level pruning
    # (:meth:`ManagedTable._merge_keyed_files`): exactly the files
    # containing matched keys are rewritten, everything else is
    # hard-linked — Delta MERGE's two-phase shape on parquet.
    target_key_col: Optional[str] = None
    source_key_col: Optional[str] = None
    null_safe: bool = False


def apply_keyed_merge(dt, km: KeyedMerge) -> None:
    """Compile a :class:`KeyedMerge` onto a ``DeltaTable``-shaped merge
    builder (``alias → merge → whenMatched*/whenNotMatched* → execute``).
    Factored out of DeltaBackedTable so the clause construction is
    testable without delta-spark on the classpath
    (tests/test_backend_seam.py drives it with a recording fake)."""
    m = dt.alias(km.target_alias).merge(
        km.source.alias(km.source_alias), km.condition
    )
    if km.matched_update == "*":
        if km.matched_update_condition:
            m = m.whenMatchedUpdateAll(condition=km.matched_update_condition)
        else:
            m = m.whenMatchedUpdateAll()
    elif km.matched_update:
        if km.matched_update_condition:
            m = m.whenMatchedUpdate(
                condition=km.matched_update_condition, set=km.matched_update
            )
        else:
            m = m.whenMatchedUpdate(set=km.matched_update)
    if km.matched_delete:
        if isinstance(km.matched_delete, str):
            m = m.whenMatchedDelete(condition=km.matched_delete)
        else:
            m = m.whenMatchedDelete()
    if km.not_matched_insert == "*":
        if km.not_matched_condition:
            m = m.whenNotMatchedInsertAll(condition=km.not_matched_condition)
        else:
            m = m.whenNotMatchedInsertAll()
    elif isinstance(km.not_matched_insert, dict):
        if km.not_matched_condition:
            m = m.whenNotMatchedInsert(
                condition=km.not_matched_condition, values=km.not_matched_insert
            )
        else:
            m = m.whenNotMatchedInsert(values=km.not_matched_insert)
    if km.not_matched_by_source_update:
        if km.not_matched_by_source_update_condition:
            m = m.whenNotMatchedBySourceUpdate(
                condition=km.not_matched_by_source_update_condition,
                set=km.not_matched_by_source_update,
            )
        else:
            m = m.whenNotMatchedBySourceUpdate(
                set=km.not_matched_by_source_update
            )
    if km.not_matched_by_source_delete:
        if isinstance(km.not_matched_by_source_delete, str):
            m = m.whenNotMatchedBySourceDelete(
                condition=km.not_matched_by_source_delete
            )
        else:
            m = m.whenNotMatchedBySourceDelete()
    m.execute()


class ConcurrentModificationError(RuntimeError):
    """Another writer committed a version after this operation's snapshot
    read — the operation's post-state was computed against stale data,
    so committing it would silently drop the other writer's changes.

    Mirrors Delta Lake's optimistic-concurrency conflict surface
    (``ConcurrentAppendException`` etc., implied by every reference
    MERGE call site, reference mack/__init__.py:125-140): callers
    re-read the table and retry the whole operation.
    """


def _partition_value_str(value) -> str:
    """A partition value as Spark spells it in the directory name
    (``col=<this>``): lowercase booleans, ISO dates, Hive NULL marker.
    Supported partition-column types: str/int/bool/date/timestamp."""
    if value is None:
        return "__HIVE_DEFAULT_PARTITION__"
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, datetime.datetime):
        return value.isoformat(sep=" ")
    return str(value)


class ManagedTable:
    """Handle to a versioned-parquet table (mirrors ``delta.tables.DeltaTable``)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = os.path.abspath(path)
        if not os.path.exists(self._meta_path):
            raise ValueError(f"{self.path} is not a managed table (no {META_FILE})")

    # ------------------------------------------------------------------ meta
    @property
    def _meta_path(self) -> str:
        return os.path.join(self.path, META_FILE)

    def _read_meta(self) -> dict:
        with open(self._meta_path) as f:
            return json.load(f)

    def _write_meta(self, meta: dict) -> None:
        # Atomic pointer swing: write sidecar then rename over the meta file.
        tmp = self._meta_path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1)
        os.replace(tmp, self._meta_path)

    def _conflict(self, target: int, meta: dict) -> ConcurrentModificationError:
        return ConcurrentModificationError(
            f"concurrent write to {self.path}: version {target} was "
            f"committed by another writer after this operation read "
            f"version {meta['version']}; re-read the table and retry"
        )

    def _claim_version(
        self, meta: dict, operation: str, payload: Optional[dict] = None
    ) -> int:
        """Claim version N+1 by creating ``_commits/v<N+1>.commit`` with
        O_EXCL — the same put-if-absent protocol Delta's ``_delta_log``
        uses (one file per version; the filesystem arbitrates). Exactly
        one writer wins a given version; the loser raises
        ConcurrentModificationError with its staged work never made
        visible (the meta pointer still names the winner's snapshot).

        Crash recovery (Delta-style stale-transaction cleanup): a writer
        that dies between claim and finalize leaves an orphaned marker
        with meta never advancing — without recovery every later writer
        targets the same version and loses the CAS forever (a permanent
        write wedge). On FileExistsError the claimer re-reads meta: if
        the marker's version is already committed the conflict is
        genuine; if meta is still behind AND the marker is older than
        ``STALE_COMMIT_TTL_SECONDS``, the marker is reclaimed — undoing
        any half-applied append files it recorded — and the CAS
        re-raced. After winning, the claimer re-checks the on-disk
        version: ``vacuum()`` prunes markers only for durably committed
        versions, so a stale writer that slips through a pruned marker
        is deterministically caught here and never finalizes."""
        target = meta["version"] + 1
        commits = os.path.join(self.path, COMMITS_DIR)
        os.makedirs(commits, exist_ok=True)
        marker = os.path.join(commits, f"v{target:020d}.commit")
        fd = None
        for attempt in (0, 1):
            try:
                fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                break
            except FileExistsError:
                if attempt == 0 and self._reclaim_orphan_marker(marker, target):
                    continue
                raise self._conflict(target, meta) from None
        try:
            if self._read_meta()["version"] >= target:
                os.unlink(marker)
                raise self._conflict(target, meta)
            body = {"operation": operation, "timestamp": time.time()}
            if payload:
                body.update(payload)
            os.write(fd, json.dumps(body).encode())
        finally:
            os.close(fd)
        return target

    def _reclaim_orphan_marker(self, marker: str, target: int) -> bool:
        """True iff ``marker`` was orphaned by a crashed writer and has
        now been removed, so the caller should re-race the CAS. Reclaims
        only when (a) the on-disk committed version is still below the
        marker's — a finalized commit is never reclaimed — and (b) the
        marker is older than ``STALE_COMMIT_TTL_SECONDS``, so an
        in-flight writer between claim and finalize is never preempted.
        Any staged-file list a crashed ``append`` recorded in the marker
        is rolled back first, so a half-applied append can't be made
        durable by the next commit. Removal is race-safe: concurrent
        reclaimers both unlink (one wins, the other ignores ENOENT),
        then re-race the O_EXCL create, which again admits exactly one.
        """
        if self._read_meta()["version"] >= target:
            return False
        try:
            st = os.stat(marker)
        except FileNotFoundError:
            return True  # another reclaimer got it first; re-race
        if time.time() - st.st_mtime < STALE_COMMIT_TTL_SECONDS:
            return False
        self._undo_marker_files(marker)
        try:
            os.unlink(marker)
        except FileNotFoundError:
            pass
        return True

    def _undo_marker_files(self, marker: str) -> None:
        """Roll back the half-applied append a crashed writer recorded
        in its marker: unlink every staged file it listed from the live
        snapshot (files it never got to move are simply absent). Staged
        names are writer-unique (spark part-<task>-<uuid>), so this
        never touches another commit's files."""
        try:
            with open(marker) as f:
                body = json.load(f)
        except (OSError, ValueError):
            return
        snap = self._snapshot_dir()
        for rel in body.get("files") or []:
            if os.path.isabs(rel) or ".." in rel.split(os.sep):
                continue
            try:
                os.unlink(os.path.join(snap, rel))
            except OSError:
                pass

    def _finalize(self, meta: dict, operation: str, target: int,
                  new_snapshot: Optional[str] = None,
                  files_added: Optional[List[str]] = None) -> None:
        meta["version"] = target
        entry = {
            "version": target, "operation": operation, "timestamp": time.time()
        }
        if new_snapshot is not None:
            meta["current"] = new_snapshot
        else:
            # In-place commit (append / property change): record the
            # file manifest delta so earlier versions of the SAME
            # snapshot era stay reconstructable (current files minus
            # later additions) — the Delta-log idea applied to this
            # layout. Snapshot-replacing commits omit the key, marking
            # an era boundary.
            entry["files_added"] = list(files_added or [])
        meta["history"].append(entry)
        self._write_meta(meta)

    def _commit(self, meta: dict, operation: str, new_snapshot: Optional[str] = None) -> None:
        """Optimistic-concurrency commit = claim (CAS) then finalize."""
        target = self._claim_version(meta, operation)
        self._finalize(meta, operation, target, new_snapshot=new_snapshot)

    def _plan_retention(self, meta: dict, old_snapshot: str) -> List[str]:
        """Decide the outgoing snapshot's fate under the
        ``mack.retain_snapshots`` table property (default 0: delete
        immediately — the pre-time-travel behavior). With N > 0 the last
        N replaced snapshots stay on disk and readable
        (``toDF(version=...)`` / ``restore``), Delta-style time travel
        with an explicit retention knob instead of a VACUUM horizon.
        Mutates ``meta['retained']`` (so it rides the same commit) and
        returns the dirs to physically delete AFTER the commit succeeds.
        Hard-linked files shared with newer snapshots survive deletion
        of the dir that first wrote them (inode refcounting).
        """
        try:
            retain = int(meta.get("properties", {}).get("mack.retain_snapshots", 0))
        except (TypeError, ValueError):
            retain = 0
        retained = meta.setdefault("retained", [])
        to_delete = []
        if retain > 0:
            retained.append({"version": meta["version"], "dir": old_snapshot})
            while len(retained) > retain:
                to_delete.append(retained.pop(0)["dir"])
        else:
            to_delete.append(old_snapshot)
        return to_delete

    # ------------------------------------------------------------------ create
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        df: Optional[DataFrame] = None,
        schema: Optional[StructType] = None,
        partition_by: Optional[List[str]] = None,
        properties: Optional[Dict[str, str]] = None,
        constraints: Optional[Dict[str, str]] = None,
    ) -> "ManagedTable":
        """Create a managed table from a DataFrame (or empty, from a schema).

        ``constraints`` maps name → SQL check expression; stored as
        ``delta.constraints.<name>`` properties for parity with how the
        reference harvests them (reference mack/__init__.py:658-661).
        Column nullability is captured from the declared ``schema`` (or
        the DataFrame's schema) — parquet round-trips lose nullability,
        so it must be recorded at declaration time.
        """
        path = os.path.abspath(path)
        os.makedirs(path, exist_ok=True)
        if os.path.exists(os.path.join(path, META_FILE)):
            raise ValueError(f"managed table already exists at {path}")
        declared = schema if schema is not None else (df.schema if df is not None else None)
        if declared is None:
            raise ValueError("create() needs a df or a schema")
        props = dict(properties or {})
        for name, expr in (constraints or {}).items():
            props[f"delta.constraints.{name}"] = expr
        snapshot = "v=0"
        snap_dir = os.path.join(path, snapshot)
        if df is not None:
            from mack_spark.layout import optimize_write_partitions

            writer = optimize_write_partitions(df).write.mode("overwrite")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(snap_dir)
        else:
            spark.createDataFrame([], declared).write.mode("overwrite").parquet(snap_dir)
        meta = {
            "version": 0,
            "current": snapshot,
            "partition_columns": list(partition_by or []),
            "properties": props,
            "schema": declared.json(),
            "history": [{"version": 0, "operation": "CREATE", "timestamp": time.time()}],
        }
        table = cls.__new__(cls)
        table.spark = spark
        table.path = path
        table._write_meta(meta)
        return table

    @classmethod
    def for_path(cls, spark: SparkSession, path: str) -> "ManagedTable":
        return cls(spark, path)

    @staticmethod
    def is_managed(path: str) -> bool:
        return os.path.exists(os.path.join(os.path.abspath(path), META_FILE))

    # ------------------------------------------------------------------ read
    def _snapshot_dir(self, meta: Optional[dict] = None) -> str:
        meta = meta or self._read_meta()
        return os.path.join(self.path, meta["current"])

    def toDF(self, version: Optional[int] = None) -> DataFrame:
        """Current snapshot as a DataFrame (mirrors ``DeltaTable.toDF()``).

        ``version`` time-travels to a RETAINED snapshot (Delta's
        ``versionAsOf``): available for the last ``mack.retain_snapshots``
        replaced versions (table property, default 0 = no retention).
        Retained snapshots are read with the CURRENT declared schema —
        columns added since surface as NULLs, columns dropped since are
        absent — matching how Delta reads old files through the live
        table schema.

        Reads with the *declared* schema: files written before a
        merge-schema append lack the newer columns (surfaced as NULLs),
        and an explicit schema also skips file-footer schema inference.
        Filters/projections applied by the caller push down into the
        scan (Catalyst ``PushedFilters``).
        """
        meta = self._read_meta()
        snap_dir = self._snapshot_dir(meta)
        explicit_files: Optional[List[str]] = None
        if version is not None and version != meta["version"]:
            explicit_files = self._in_era_files(meta, version)
            if explicit_files is None:
                entry = next(
                    (s for s in meta.get("retained", []) if s["version"] == version),
                    None,
                )
                if entry is None:
                    avail = [s["version"] for s in meta.get("retained", [])]
                    raise ValueError(
                        f"version {version} is not retained (current="
                        f"{meta['version']}, retained={avail}); set the "
                        f"'mack.retain_snapshots' table property to keep "
                        f"replaced snapshots readable"
                    )
                snap_dir = os.path.join(self.path, entry["dir"])
        reader = self.spark.read.schema(
            StructType.fromJson(json.loads(meta["schema"]))
        )
        if meta["partition_columns"]:
            # Partition discovery needs basePath so partition cols survive.
            reader = reader.option("basePath", snap_dir)
        if explicit_files is not None:
            if not explicit_files:
                return self.spark.createDataFrame(
                    [], StructType.fromJson(json.loads(meta["schema"]))
                )
            return reader.parquet(*explicit_files)
        return reader.parquet(snap_dir)

    def _in_era_files(self, meta: dict, version: int) -> Optional[List[str]]:
        """File list for a version that lives in the CURRENT snapshot
        era: every commit after it was an in-place append/property
        change whose ``files_added`` manifest was recorded, so the old
        version is exactly the current files minus the later additions
        (data files are immutable — appends only ever add). Returns
        None when a snapshot-replacing commit (no manifest) intervenes —
        the caller then falls back to retained-snapshot resolution."""
        if version >= meta["version"] or version < 0:
            return None
        later = [
            h for h in meta.get("history", []) if h["version"] > version
        ]
        if len(later) != meta["version"] - version or any(
            "files_added" not in h for h in later
        ):
            return None
        snap = self._snapshot_dir(meta)
        added = {
            os.path.normpath(rel) for h in later for rel in h["files_added"]
        }
        return [
            f
            for f in self._data_files()
            if os.path.normpath(os.path.relpath(f, snap)) not in added
        ]

    def restore(self, version: int) -> None:
        """RESTORE TABLE ... TO VERSION AS OF: commit a NEW version whose
        content is the retained snapshot's content (history moves
        forward, as in Delta — a restore is an operation, not an undo).
        The restored files are hard-linked, so the restore itself is
        metadata-speed regardless of table size. Works for retained
        snapshots AND for in-era versions (append manifests make any
        version of the current snapshot era reconstructable)."""
        meta = self._read_meta()
        in_era = self._in_era_files(meta, version)
        if in_era is not None:
            snap = self._snapshot_dir(meta)
            link_files = [(f, os.path.relpath(f, snap)) for f in in_era]
        else:
            entry = next(
                (s for s in meta.get("retained", []) if s["version"] == version),
                None,
            )
            if entry is None:
                raise ValueError(f"version {version} is not retained")
            src = os.path.join(self.path, entry["dir"])
            link_files = []
            for root, _dirs, names in os.walk(src):
                rel = os.path.relpath(root, src)
                for n in names:
                    if n.endswith(".parquet") and not n.startswith(("_", ".")):
                        link_files.append(
                            (
                                os.path.join(root, n),
                                n if rel == "." else os.path.join(rel, n),
                            )
                        )
        old_snapshot = meta["current"]
        new_snapshot = f"v={meta['version'] + 1}-{uuid.uuid4().hex[:8]}"
        new_dir = os.path.join(self.path, new_snapshot)
        os.makedirs(new_dir, exist_ok=True)
        for src_path, rel in link_files:
            dest = os.path.join(new_dir, rel)
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            try:
                os.link(src_path, dest)
            except OSError:
                shutil.copy2(src_path, dest)
        to_delete = self._plan_retention(meta, old_snapshot)
        try:
            self._commit(
                meta, f"RESTORE VERSION AS OF {version}", new_snapshot=new_snapshot
            )
        except ConcurrentModificationError:
            shutil.rmtree(new_dir, ignore_errors=True)
            raise
        for d in to_delete:
            shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)

    @property
    def declared_schema(self) -> StructType:
        return StructType.fromJson(json.loads(self._read_meta()["schema"]))

    def detail(self) -> dict:
        """Table metadata (mirrors ``DeltaTable.detail()`` row)."""
        meta = self._read_meta()
        files = self._data_files()
        return {
            "location": self.path,
            "partitionColumns": meta["partition_columns"],
            "properties": meta["properties"],
            "numFiles": len(files),
            "sizeInBytes": sum(os.path.getsize(f) for f in files),
        }

    def history(self) -> List[dict]:
        return list(self._read_meta()["history"])

    def _data_files(self) -> List[str]:
        out = []
        for root, _dirs, names in os.walk(self._snapshot_dir()):
            out.extend(
                os.path.join(root, n)
                for n in names
                if n.endswith(".parquet") and not n.startswith(("_", "."))
            )
        return out

    # ------------------------------------------------------------------ write
    def append(self, df: DataFrame, merge_schema: bool = False, operation: str = "WRITE") -> None:
        """Distributed append: add parquet files to the current snapshot.

        ``merge_schema`` widens the declared schema with new columns
        (mirrors Delta's ``option("mergeSchema","true")``, reference
        mack/__init__.py:378). Parquet readers union schemas per file, so
        no data rewrite is needed.

        Files are staged into a hidden temp directory and only moved
        into the live snapshot after the distributed write fully
        succeeds, so a job that dies mid-write never leaves partial
        files visible to readers (the same write-then-commit shape as
        the overwrite path; file moves are same-filesystem renames).
        """
        meta = self._read_meta()
        declared = StructType.fromJson(json.loads(meta["schema"]))
        new_cols = [f for f in df.schema.fields if f.name not in declared.fieldNames()]
        if new_cols:
            if not merge_schema:
                raise TypeError(
                    f"append has columns not in table schema: {[f.name for f in new_cols]}"
                )
            for f in new_cols:
                declared = declared.add(f)
            meta["schema"] = declared.json()
        staging = os.path.join(self.path, f".staging-{uuid.uuid4().hex}")
        try:
            from mack_spark.layout import optimize_write_partitions

            writer = optimize_write_partitions(df).write.mode("overwrite")
            if meta["partition_columns"]:
                writer = writer.partitionBy(*meta["partition_columns"])
            writer.parquet(staging)
            # Claim the version BEFORE moving files into the live
            # snapshot: a writer that loses the CAS leaves nothing
            # visible (its staging dir is simply removed). The staged
            # file list rides in the marker so a crash between claim
            # and finalize can be rolled back by the next claimer
            # (_undo_marker_files) instead of leaving a half-applied
            # append visible forever.
            staged = []
            for root, _dirs, names in os.walk(staging):
                rel = os.path.relpath(root, staging)
                for n in names:
                    if not n.endswith(".parquet") or n.startswith(("_", ".")):
                        continue
                    staged.append(n if rel == "." else os.path.join(rel, n))
            target = self._claim_version(meta, operation, payload={"files": staged})
            snap = self._snapshot_dir(meta)
            for rel in staged:
                dest = os.path.join(snap, rel)
                os.makedirs(os.path.dirname(dest), exist_ok=True)
                os.replace(os.path.join(staging, rel), dest)
        finally:
            shutil.rmtree(staging, ignore_errors=True)
        self._finalize(meta, operation, target, files_added=staged)

    def overwrite(
        self,
        df: DataFrame,
        operation: str = "WRITE",
        partition_by: Optional[List[str]] = None,
        schema_change: bool = True,
        sized: bool = True,
    ) -> None:
        """Materialize ``df`` as a fresh snapshot, then swing the pointer.

        The new snapshot is fully written before the commit, so a crash
        mid-write leaves the previous snapshot intact (same guarantee
        shape as a Delta overwrite transaction). Old snapshots are
        garbage-collected immediately (no time travel — the reference's
        ``copy_table`` explicitly does not copy history either,
        reference README.md:201).
        """
        meta = self._read_meta()
        old_snapshot = meta["current"]
        # Writer-unique dir name: two racing overwrites must stage into
        # DIFFERENT directories; the commit CAS then picks one pointer.
        new_snapshot = f"v={meta['version'] + 1}-{uuid.uuid4().hex[:8]}"
        parts = partition_by if partition_by is not None else meta["partition_columns"]
        if sized:
            # sized=False: the caller (optimize_compact / clustered
            # rewrites) laid out the partitioning itself — respect it
            from mack_spark.layout import optimize_write_partitions

            df = optimize_write_partitions(df)
        writer = df.write.mode("overwrite")
        if parts:
            writer = writer.partitionBy(*parts)
        writer.parquet(os.path.join(self.path, new_snapshot))
        meta["partition_columns"] = list(parts or [])
        if schema_change:
            meta["schema"] = df.schema.json()
        to_delete = self._plan_retention(meta, old_snapshot)
        try:
            self._commit(meta, operation, new_snapshot=new_snapshot)
        except ConcurrentModificationError:
            shutil.rmtree(os.path.join(self.path, new_snapshot), ignore_errors=True)
            raise
        for d in to_delete:
            shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)

    def _file_key_stats(self, files: List[str], key_col: str):
        """Per-file (min, max, has_nulls) of ``key_col`` from parquet
        footers — a driver-side metadata-only read, O(#files), the same
        information Delta keeps per-file in its transaction log
        (``stats.minValues/maxValues/nullCount``). Returns ``None`` for
        a file whose statistics are missing (caller must disable
        pruning — a range-less file voids the disjointness closure)."""
        import pyarrow.parquet as pq

        out = {}
        for path in files:
            try:
                md = pq.ParquetFile(path).metadata
            except Exception:
                out[path] = None
                continue
            idx = None
            if md.num_row_groups > 0:
                rg0 = md.row_group(0)
                for j in range(rg0.num_columns):
                    if rg0.column(j).path_in_schema == key_col:
                        idx = j
                        break
            if idx is None:
                out[path] = None
                continue
            lo = hi = None
            nulls = False
            ok = True
            for g in range(md.num_row_groups):
                col = md.row_group(g).column(idx)
                st = col.statistics
                if st is None or not st.has_min_max:
                    ok = False
                    break
                if st.null_count is None or st.null_count > 0:
                    nulls = True
                mn, mx = st.min, st.max
                # Footers without a UTF8 annotation surface BYTE_ARRAY
                # stats as bytes; normalize so they compare with the
                # declared string type. (parquet truncates long string
                # stats but keeps them valid bounds — min rounded down,
                # max incremented — so pruning stays correct.)
                if isinstance(mn, bytes):
                    mn = mn.decode("utf-8", "surrogateescape")
                if isinstance(mx, bytes):
                    mx = mx.decode("utf-8", "surrogateescape")
                lo = mn if lo is None else min(lo, mn)
                hi = mx if hi is None else max(hi, mx)
            out[path] = (lo, hi, nulls) if ok and lo is not None else None
        return out

    def _merge_file_pruned(
        self, post_state: DataFrame, operation: str, meta: dict, touched_keys: tuple
    ) -> bool:
        """File-pruned rewrite for an unpartitioned table. Returns False
        when pruning is impossible (missing stats, unsupported key type,
        every file touched) — caller falls back to the full overwrite.

        Correctness argument: after the range-overlap closure, every
        untouched file's [min,max] is disjoint from every touched file's
        range. The rewrite keeps exactly the post-state rows NOT covered
        by an untouched interval — that region contains all rows of all
        touched files, all inserted out-of-range keys, and (when any
        file can hold NULL keys, those files are forced touched) all
        NULL-key rows; untouched files are byte-identical hard links, so
        no row is duplicated and none is lost.
        """
        from pyspark.sql.types import (
            ByteType,
            DateType,
            DoubleType,
            FloatType,
            IntegerType,
            LongType,
            ShortType,
            StringType,
            StructField,
            TimestampType,
        )

        key_col, keys_df = touched_keys
        declared = StructType.fromJson(json.loads(meta["schema"]))
        if key_col not in declared.fieldNames():
            return False
        key_type = declared[key_col].dataType
        if not isinstance(
            key_type,
            (ByteType, ShortType, IntegerType, LongType, FloatType,
             DoubleType, StringType, DateType, TimestampType),
        ):
            return False
        files = self._data_files()
        if len(files) < 2:
            return False
        stats = self._file_key_stats(files, key_col)
        if any(s is None for s in stats.values()):
            # A range-less file (unreadable footer, key column absent —
            # e.g. written before a merge_schema append added the key —
            # or writer-suppressed min/max) breaks the disjointness
            # closure: its rows could fall inside an untouched file's
            # [min,max] and be excluded by the rewrite filter while the
            # file itself is never hard-linked. Pruning is only sound
            # when every file has trustworthy stats.
            return False
        known = dict(stats)
        touched = set()
        # Which files can contain a touched key: broadcast the per-file
        # ranges (one short row per file) and range-join the key set —
        # the distributed twin of Delta's stats-vs-predicate file skip.
        flist = sorted(known)
        ranges_df = self.spark.createDataFrame(
            [(i, known[f][0], known[f][1]) for i, f in enumerate(flist)],
            StructType(
                [
                    StructField("fid", LongType()),
                    StructField("lo", key_type),
                    StructField("hi", key_type),
                ]
            ),
        )
        # Evaluate the caller's key plan ONCE: it is consumed twice here
        # (range join + NULL probe) and may be arbitrarily expensive
        # (e.g. a dup-detection aggregate over the whole table). The
        # checkpointed relation is one narrow column of touched keys.
        keys = (
            keys_df.select(F.col(key_col).alias("__k"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        touched_ids = {
            r.fid
            for r in keys.join(
                F.broadcast(ranges_df),
                (F.col("__k") >= F.col("lo")) & (F.col("__k") <= F.col("hi")),
            )
            .select("fid")
            .distinct()
            .collect()
        }
        touched |= {flist[i] for i in touched_ids}
        # NULL keys carry no min/max: any file that may hold them is
        # rewritten so NULL-key rows live only in the rewrite region;
        # a NULL in the touched-key set (possible for dedup group keys)
        # likewise forces NULL rows into the rewrite.
        null_files = {f for f, s in known.items() if s[2]}
        keys_have_null = keys.filter(F.col("__k").isNull()).limit(1).count() > 0
        include_nulls = bool(null_files) or keys_have_null
        touched |= null_files
        # Closure: untouched ranges must be disjoint from touched ones,
        # else a touched file's row could fall inside an untouched
        # interval and be dropped by the rewrite filter.
        changed = True
        while changed:
            changed = False
            tranges = [known[f][:2] for f in touched if f in known]
            for f in flist:
                if f in touched:
                    continue
                lo, hi = known[f][0], known[f][1]
                if any(hi >= tlo and lo <= thi for tlo, thi in tranges):
                    touched.add(f)
                    changed = True
        untouched = [f for f in files if f not in touched]
        if not untouched:
            return False
        ivs = sorted((known[f][0], known[f][1]) for f in untouched)
        merged = [list(ivs[0])]
        for lo, hi in ivs[1:]:
            if lo <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], hi)
            else:
                merged.append([lo, hi])
        in_untouched = F.lit(False)
        for lo, hi in merged:
            in_untouched = in_untouched | F.col(key_col).between(F.lit(lo), F.lit(hi))
        rewrite_cond = ~in_untouched
        if include_nulls:
            rewrite_cond = rewrite_cond | F.col(key_col).isNull()
        self._commit_partial_rewrite(
            meta, operation, post_state.filter(rewrite_cond), untouched
        )
        return True

    def _commit_partial_rewrite(
        self,
        meta: dict,
        operation: str,
        rewrite_df: DataFrame,
        untouched_files: List[str],
        sized: bool = True,
    ) -> None:
        """Write ``rewrite_df`` as the next snapshot's rewritten region,
        hard-link ``untouched_files`` unchanged (zero copy), commit."""
        old_snapshot = meta["current"]
        new_snapshot = f"v={meta['version'] + 1}-{uuid.uuid4().hex[:8]}"
        new_dir = os.path.join(self.path, new_snapshot)
        if sized:
            from mack_spark.layout import optimize_write_partitions

            rewrite_df = optimize_write_partitions(rewrite_df)
        rewrite_df.write.mode("overwrite").parquet(new_dir)
        for f in untouched_files:
            dest = os.path.join(new_dir, os.path.basename(f))
            if os.path.exists(dest):  # pragma: no cover - uuid part names
                dest = os.path.join(
                    new_dir, f"link-{uuid.uuid4().hex[:8]}-{os.path.basename(f)}"
                )
            try:
                os.link(f, dest)
            except OSError:
                shutil.copy2(f, dest)
        to_delete = self._plan_retention(meta, old_snapshot)
        try:
            self._commit(meta, operation, new_snapshot=new_snapshot)
        except ConcurrentModificationError:
            shutil.rmtree(new_dir, ignore_errors=True)
            raise
        for d in to_delete:
            shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)

    def _execute_merge_clauses(
        self, target: DataFrame, km: KeyedMerge, declared: StructType
    ) -> DataFrame:
        """Apply a :class:`KeyedMerge`'s clauses to ``target`` with
        Delta's MERGE semantics: first applicable matched clause in
        registration order (update, then delete), NULL clause condition
        = not applicable, ambiguous multi-source match raises, source
        rows matching nothing take the insert clause, every output
        column cast to the declared schema. The independent verifier
        for these semantics is tests/merge_interpreter.py (the two are
        deliberately separate implementations)."""
        t, s = km.target_alias, km.source_alias
        out_cols = [f.name for f in declared.fields]
        tb = target.withColumn("__tid", F.monotonically_increasing_id()).alias(t)
        src = km.source.alias(s)
        on = F.expr(km.condition)
        pairs = tb.join(src, on, "inner")
        ambiguous = (
            pairs.groupBy("__tid").count().filter(F.col("count") > 1).limit(1).count()
        )
        if ambiguous:
            raise ValueError(
                "ambiguous merge: a target row is matched by multiple source rows"
            )
        if km.matched_update is None:
            upd = F.lit(False)
        elif km.matched_update_condition is None:
            upd = F.lit(True)
        else:
            upd = F.coalesce(F.expr(km.matched_update_condition), F.lit(False))
        if km.matched_delete is None:
            dele = F.lit(False)
        elif km.matched_delete is True:
            dele = F.lit(True)
        else:
            dele = F.coalesce(F.expr(km.matched_delete), F.lit(False))
        src_cols = set(km.source.columns)

        def _upd_expr(c):
            if km.matched_update == "*":
                # UPDATE SET *: same-named source column when present,
                # else the target value carries through
                if c in src_cols:
                    return F.col(f"{s}.`{c}`")
                return F.col(f"{t}.`{c}`")
            if c in (km.matched_update or {}):
                return F.expr(km.matched_update[c])
            return F.col(f"{t}.`{c}`")

        updated = pairs.where(upd).select(
            *[_upd_expr(c).alias(c) for c in out_cols]
        )
        kept = pairs.where(~upd & ~dele).select(
            *[F.col(f"{t}.`{c}`").alias(c) for c in out_cols]
        )
        unmatched = tb.join(src, on, "left_anti").select(
            *[F.col(f"`{c}`").alias(c) for c in out_cols]
        )
        result = updated.unionByName(kept).unionByName(unmatched)
        if km.not_matched_insert is not None:
            new_src = src.join(tb, on, "left_anti")
            if km.not_matched_condition:
                new_src = new_src.where(
                    F.coalesce(F.expr(km.not_matched_condition), F.lit(False))
                )
            if km.not_matched_insert == "*":
                inserts = new_src.select(
                    *[
                        (
                            F.col(f"{s}.`{c}`") if c in src_cols
                            else F.lit(None)
                        ).alias(c)
                        for c in out_cols
                    ]
                )
            else:
                inserts = new_src.select(
                    *[
                        (
                            F.expr(km.not_matched_insert[c])
                            if c in km.not_matched_insert else F.lit(None)
                        ).alias(c)
                        for c in out_cols
                    ]
                )
            result = result.unionByName(inserts)
        for f in declared.fields:
            result = result.withColumn(f.name, F.col(f.name).cast(f.dataType))
        return result

    def _merge_keyed_files(
        self, km: Optional[KeyedMerge], operation: str, meta: dict
    ) -> bool:
        """Native execution of a :class:`KeyedMerge` with Delta MERGE's
        two-phase file-level shape, for unpartitioned tables. Returns
        False when inapplicable — caller falls back.

        Phase 1 (find touched files): footer min/max stats skip files
        whose range misses every source key (no false negatives; files
        with missing stats simply stay candidates — unlike the interval
        rewrite there is NO disjointness closure to void, because
        provenance is explicit); then the candidates' key column is
        scanned with ``_metadata.file_path`` and semi-joined against the
        distinct source keys — EXACTLY the files containing a matched
        key survive (this is Delta MERGE job 1: a columnar key scan +
        shuffle join, no full-width read). Phase 2 (rewrite): only the
        touched files' rows flow through the merge clauses; every other
        file is hard-linked byte-identical. Correctness rests on the
        descriptor contract that ``condition`` implies key equality
        (KeyedMerge.target_key_col), so a matched target row can only
        live in a touched file, and source rows that match no touched
        row match nothing — inserts computed against the touched subset
        equal inserts against the full table.

        This strictly beats the interval rewrite on UNCLUSTERED layouts:
        overlapping ranges collapse the interval closure to a full
        rewrite, while the exact key scan still prunes every file that
        merely range-overlaps without containing a matched key.
        """
        if km is None or not km.target_key_col or not km.source_key_col:
            return False
        if (
            km.not_matched_by_source_update
            or km.not_matched_by_source_delete
        ):
            # not-matched-by-source clauses touch rows in ANY file —
            # key pruning is invalid; fall back to the post-state path
            return False
        if meta["partition_columns"]:
            return False
        declared = StructType.fromJson(json.loads(meta["schema"]))
        key_col = km.target_key_col
        if key_col not in declared.fieldNames():
            return False
        files = self._data_files()
        if len(files) < 2:
            return False
        # The source plan is consumed by key extraction, the pair join,
        # and the insert anti-join; evaluate it once.
        source = km.source.localCheckpoint(eager=True)
        km = dataclasses.replace(km, source=source)
        keys = source.select(F.col(km.source_key_col).alias("__k")).distinct()
        nn_keys = keys.filter(F.col("__k").isNotNull()).localCheckpoint(eager=True)
        keys_have_null = (
            km.null_safe
            and keys.filter(F.col("__k").isNull()).limit(1).count() > 0
        )
        stats = self._file_key_stats(files, key_col)
        known = {f: s for f, s in stats.items() if s is not None}
        cands = {f for f in files if stats[f] is None}
        key_type = declared[key_col].dataType
        from pyspark.sql.types import (
            ByteType, DateType, DoubleType, FloatType, IntegerType,
            LongType, ShortType, StringType, StructField, TimestampType,
        )
        rangeable = isinstance(
            key_type,
            (ByteType, ShortType, IntegerType, LongType, FloatType,
             DoubleType, StringType, DateType, TimestampType),
        )
        if known and rangeable:
            flist = sorted(known)
            ranges_df = self.spark.createDataFrame(
                [(i, known[f][0], known[f][1]) for i, f in enumerate(flist)],
                StructType(
                    [
                        StructField("fid", LongType()),
                        StructField("lo", key_type),
                        StructField("hi", key_type),
                    ]
                ),
            )
            hit_ids = {
                r.fid
                for r in nn_keys.join(
                    F.broadcast(ranges_df),
                    (F.col("__k") >= F.col("lo")) & (F.col("__k") <= F.col("hi")),
                )
                .select("fid")
                .distinct()
                .collect()
            }
            cands |= {flist[i] for i in hit_ids}
            if keys_have_null:
                cands |= {f for f, s in known.items() if s[2]}
        else:
            cands |= set(known)
        if cands:
            scan = (
                self.spark.read.schema(declared)
                .parquet(*sorted(cands))
                .select(
                    F.col("_metadata.file_path").alias("__file"),
                    F.col(key_col).alias("__tk"),
                )
            )
            match = (
                F.col("__tk").eqNullSafe(F.col("__k"))
                if km.null_safe
                else F.col("__tk") == F.col("__k")
            )
            touched_uris = {
                r["__file"]
                for r in scan.join(keys, match, "left_semi")
                .select("__file")
                .distinct()
                .collect()
            }
        else:
            touched_uris = set()
        # _metadata.file_path is a URI; map back to local paths.
        uri_of = {pathlib.Path(f).resolve().as_uri(): f for f in files}
        touched = set()
        for u in touched_uris:
            if u in uri_of:
                touched.add(uri_of[u])
            else:  # pragma: no cover - non-file scheme or symlinked root
                touched.add(unquote(urlparse(u).path))
        untouched = [f for f in files if f not in touched]
        if not untouched:
            return False
        if touched:
            target_sub = self.spark.read.schema(declared).parquet(*sorted(touched))
        else:
            target_sub = self.spark.createDataFrame([], declared)
        rewrite = self._execute_merge_clauses(target_sub, km, declared)
        self._commit_partial_rewrite(meta, operation, rewrite, untouched)
        return True

    def merge_overwrite(
        self,
        post_state: DataFrame,
        operation: str,
        touched_partitions: Optional[List[dict]] = None,
        touched_keys: Optional[tuple] = None,
        keyed_merge: Optional[KeyedMerge] = None,
    ) -> None:
        """Commit a merge-style mutation expressed as a post-state plan.

        ``keyed_merge`` is accepted (and ignored) for interface parity
        with DeltaBackedTable, which compiles it to a native MERGE; the
        parquet backend always commits the equivalent ``post_state``.

        SCALE: when the caller knows which partitions the mutation can
        touch (``touched_partitions``: list of ``{part_col: value}``
        dicts), only those partitions are rewritten from ``post_state``
        — the filter pushes down through the post-state plan to the
        base scan, so untouched partitions are neither read nor written
        (their files are hard-linked from the previous snapshot). This
        is the parquet-backend equivalent of Delta MERGE's file-pruned
        rewrite (reference mack/__init__.py:125-139); on the Delta
        adapter the same hint becomes a ``replaceWhere`` overwrite.

        For UNPARTITIONED tables, ``touched_keys=(key_col, keys_df)``
        enables FILE-pruned rewrite: per-file min/max footer statistics
        identify which files can contain a touched key; only those files
        (plus any the transitive range-overlap closure pulls in) are
        rewritten from ``post_state``, the rest are hard-linked
        unchanged. Effective when the table is range-clustered on the
        key (``optimize_compact(sort_by=key)`` / Z-order); on a randomly
        laid-out table the overlap closure degrades gracefully to a full
        rewrite — exactly Delta MERGE's behavior with unclustered data.
        The caller contract is the MERGE contract: every row the
        mutation deletes/changes and every row it inserts must carry a
        ``key_col`` value present in ``keys_df`` (rows outside are
        assumed identity).

        Without any hint the lazy ``post_state`` plan — typically
        (current ∪ staged) minus deleted rows via join/filter — executes
        once, writing the next snapshot.
        """
        meta = self._read_meta()
        parts = meta["partition_columns"]
        if not parts and touched_keys is not None:
            if self._merge_file_pruned(post_state, operation, meta, touched_keys):
                return
            # Interval rewrite refused (unclustered layout, missing
            # stats, unsupported key type): the provenance-explicit
            # keyed path still prunes — exact touched files via key
            # scan, clause execution on just their rows.
            if self._merge_keyed_files(keyed_merge, operation, meta):
                return
            self.overwrite(post_state, operation=operation, schema_change=False)
            return
        if not parts and keyed_merge is not None:
            if self._merge_keyed_files(keyed_merge, operation, meta):
                return
        if not parts or touched_partitions is None:
            self.overwrite(post_state, operation=operation, schema_change=False)
            return
        touched = {
            tuple(_partition_value_str(t[c]) for c in parts)
            for t in touched_partitions
        }
        cond = F.lit(False)
        for t in touched_partitions:
            this = F.lit(True)
            for c in parts:
                this = this & F.col(c).eqNullSafe(F.lit(t[c]))
            cond = cond | this
        old_snapshot = meta["current"]
        new_snapshot = f"v={meta['version'] + 1}-{uuid.uuid4().hex[:8]}"
        new_dir = os.path.join(self.path, new_snapshot)
        from mack_spark.layout import optimize_write_partitions

        (
            optimize_write_partitions(post_state.filter(cond))
            .write.mode("overwrite")
            .partitionBy(*parts)
            .parquet(new_dir)
        )
        # Untouched partitions: hard-link data files from the previous
        # snapshot (same filesystem, zero copy); the old snapshot dir is
        # removed after commit but the links keep the bytes alive.
        old_dir = os.path.join(self.path, old_snapshot)
        for root, _dirs, names in os.walk(old_dir):
            rel = os.path.relpath(root, old_dir)
            comps = [] if rel == "." else rel.split(os.sep)
            if len(comps) != len(parts) or not all("=" in c for c in comps):
                continue
            key = tuple(unquote(c.split("=", 1)[1]) for c in comps)
            if key in touched:
                continue
            dest = os.path.join(new_dir, rel)
            os.makedirs(dest, exist_ok=True)
            for n in names:
                if n.endswith(".parquet") and not n.startswith(("_", ".")):
                    try:
                        os.link(os.path.join(root, n), os.path.join(dest, n))
                    except OSError:
                        shutil.copy2(os.path.join(root, n), os.path.join(dest, n))
        to_delete = self._plan_retention(meta, old_snapshot)
        try:
            self._commit(meta, operation, new_snapshot=new_snapshot)
        except ConcurrentModificationError:
            shutil.rmtree(new_dir, ignore_errors=True)
            raise
        for d in to_delete:
            shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)

    # ---------------------------------------------------------------- props
    def set_properties(self, props: Dict[str, str]) -> None:
        meta = self._read_meta()
        meta["properties"].update(props)
        self._commit(meta, "SET TBLPROPERTIES")

    def add_constraint(self, name: str, expression: str) -> None:
        """Mirrors ``ALTER TABLE … ADD CONSTRAINT`` (reference tests:890-895)."""
        self.set_properties({f"delta.constraints.{name}": expression})


# ---------------------------------------------------------------------------
# Backend seam
#
# Operator code mutates tables through exactly two methods — ``append``
# and ``merge_overwrite`` (tests/test_backend_seam.py enumerates the call
# sites) — so the storage backend is swappable at construction: this
# sandbox uses the versioned-parquet ManagedTable; a cluster with
# delta-spark on the classpath gets ACID Delta commits through the same
# interface, with no operator changes (reference substrate:
# mack/__init__.py:4, :125-139, :190-192).
# ---------------------------------------------------------------------------

def _delta_table_cls():
    """``delta.tables.DeltaTable`` when delta-spark is importable, else None."""
    try:
        from delta.tables import DeltaTable  # type: ignore

        return DeltaTable
    except ImportError:
        return None


class DeltaBackedTable:
    """``ManagedTable``-interface adapter over a real Delta Lake table.

    Only constructible when delta-spark is on the classpath (not in this
    sandbox — the adapter is exercised for interface parity in
    tests/test_backend_seam.py and live on a Delta-enabled cluster).
    ``append`` maps to a Delta transactional append;
    ``merge_overwrite`` maps to a Delta overwrite transaction — on a
    real deployment, operators whose post-state is a keyed upsert can
    be further specialized to ``DeltaTable.merge`` for file-pruned
    rewrites (reference mack/__init__.py:125-139), which is the one
    scale behavior this sandbox's backend cannot reproduce.
    """

    def __init__(self, spark: SparkSession, path: str):
        dt = _delta_table_cls()
        if dt is None:
            raise ImportError("delta-spark is not installed")
        self.spark = spark
        self.path = os.path.abspath(path)
        self._dt = dt.forPath(spark, self.path)

    def toDF(self) -> DataFrame:
        return self._dt.toDF()

    @property
    def declared_schema(self) -> StructType:
        return self.toDF().schema

    def detail(self) -> dict:
        row = self._dt.detail().collect()[0].asDict()
        return {
            "location": row.get("location", self.path),
            "partitionColumns": row.get("partitionColumns", []),
            "properties": row.get("properties", {}),
            "numFiles": row.get("numFiles", 0),
            "sizeInBytes": row.get("sizeInBytes", 0),
        }

    def history(self) -> List[dict]:
        return [r.asDict() for r in self._dt.history().collect()]

    def append(self, df: DataFrame, merge_schema: bool = False,
               operation: str = "WRITE") -> None:
        (df.write.format("delta").mode("append")
         .option("mergeSchema", str(merge_schema).lower()).save(self.path))

    def merge_overwrite(
        self,
        post_state: DataFrame,
        operation: str,
        touched_partitions: Optional[List[dict]] = None,
        touched_keys: Optional[tuple] = None,
        keyed_merge: Optional[KeyedMerge] = None,
    ) -> None:
        if keyed_merge is not None:
            # Native file-pruned path: Delta MERGE rewrites only files
            # containing matching keys; the post_state plan is unused.
            apply_keyed_merge(self._dt, keyed_merge)
            return
        w = post_state.write.format("delta").mode("overwrite")
        if touched_partitions:
            # Delta's native file-pruned overwrite: only partitions
            # matching the predicate are replaced (and post_state is
            # filtered to them by replaceWhere's constraint check).
            def lit_sql(v):
                if v is None:
                    return "NULL"
                if isinstance(v, bool):
                    return "true" if v else "false"
                if isinstance(v, (int, float)):
                    return repr(v)
                return "'" + str(v).replace("'", "''") + "'"

            clauses = []
            for t in touched_partitions:
                ands = " AND ".join(
                    f"`{c}` IS NULL" if v is None else f"`{c}` = {lit_sql(v)}"
                    for c, v in t.items()
                )
                clauses.append(f"({ands})")
            w = w.option("replaceWhere", " OR ".join(clauses))
        w.save(self.path)

    def overwrite(self, df: DataFrame, operation: str = "WRITE",
                  partition_by: Optional[List[str]] = None,
                  schema_change: bool = True,
                  sized: bool = True) -> None:
        # ``sized`` mirrors ManagedTable.overwrite; delta-spark applies
        # its own optimized-write sizing, so the flag is accepted and
        # ignored here.
        w = df.write.format("delta").mode("overwrite")
        if schema_change:
            w = w.option("overwriteSchema", "true")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.save(self.path)

    def set_properties(self, props: Dict[str, str]) -> None:
        kv = ", ".join(f"'{k}' = '{v}'" for k, v in props.items())
        self.spark.sql(
            f"ALTER TABLE delta.`{self.path}` SET TBLPROPERTIES ({kv})"
        )

    def add_constraint(self, name: str, expression: str) -> None:
        self.set_properties({f"delta.constraints.{name}": expression})

    def delete(self, condition: str) -> None:
        """Native ``DeltaTable.delete`` — Delta's log-driven file
        pruning replaces the parquet backend's partition/footer
        machinery."""
        self._dt.delete(condition)

    def update(self, condition: str, assignments: Dict[str, str]) -> None:
        """Native ``DeltaTable.update`` (simultaneous SET semantics are
        Delta's own)."""
        self._dt.update(condition=condition, set=dict(assignments))


def open_table(spark: SparkSession, path: str):
    """Construct the right backend for ``path`` — the seam's single entry.

    A directory with a ``_delta_log`` (and delta-spark importable) gets
    the Delta adapter; a ``_mack_meta.json`` layout gets ManagedTable.
    Everything downstream is backend-agnostic.
    """
    apath = os.path.abspath(path)
    if (
        _delta_table_cls() is not None
        and os.path.isdir(os.path.join(apath, "_delta_log"))
    ):
        return DeltaBackedTable(spark, apath)
    return ManagedTable(spark, apath)


def _to_df(source: Union[ManagedTable, DataFrame]) -> DataFrame:
    if isinstance(source, DataFrame):
        return source
    if hasattr(source, "toDF"):  # ManagedTable or DeltaBackedTable
        return source.toDF()
    raise TypeError(f"expected a table or DataFrame, got {type(source)}")


# ---------------------------------------------------------------------------
# Table-level utilities (reference mack/__init__.py:287-325, :459-509,
# :616-627, :696-737)
# ---------------------------------------------------------------------------

def copy_table(
    table: ManagedTable,
    target_path: str = "",
    target_table: str = "",
    spark: Optional[SparkSession] = None,
) -> Optional[ManagedTable]:
    """Clone data + partitioning + properties, NOT history.

    Parity with reference ``copy_table`` (mack/__init__.py:287-325): the
    copy starts a fresh history (reference README.md:201). Like the
    reference, the target is either a filesystem path (``target_path``,
    returns the new :class:`ManagedTable`) or a metastore table name
    (``target_table`` → ``saveAsTable`` with the source's partitioning
    and properties carried as writer options, reference
    mack/__init__.py:312-318; returns None — the copy is owned by the
    catalog, query it via ``spark.table(target_table)``).
    """
    if not target_path and not target_table:
        raise TypeError("Either target_path or target_table must be specified.")
    details = table.detail()
    if target_table:
        (
            table.toDF()
            .write.partitionBy(details["partitionColumns"])
            .options(**details["properties"])
            .saveAsTable(target_table)
        )
        return None
    return ManagedTable.create(
        spark or table.spark,
        target_path,
        df=table.toDF(),
        partition_by=details["partitionColumns"],
        properties=details["properties"],
        schema=table.declared_schema,
    )


def rename_table(table: ManagedTable, new_path: str) -> ManagedTable:
    """Move a managed table to a new location/name.

    The reference's non-Databricks path rewrites all data via
    ``saveAsTable`` and loses history (mack/__init__.py:735-737); a
    path-based table can simply be moved, preserving history — strictly
    better while keeping the observable contract (old name gone, new
    name serves the same rows).
    """
    new_path = os.path.abspath(new_path)
    if os.path.exists(new_path):
        raise ValueError(f"target {new_path} already exists")
    shutil.move(table.path, new_path)
    return ManagedTable(table.spark, new_path)


def shallow_clone(table: ManagedTable, target_path: str) -> ManagedTable:
    """Zero-copy clone (Delta ``CREATE TABLE ... SHALLOW CLONE``): the
    clone's snapshot hard-links the source's current data files, so a
    clone of any size costs metadata only. The clone starts version 0
    with the source's schema/partitioning/properties and an independent
    commit history; subsequent writes on either side never affect the
    other (mutations replace whole files, and hard-linked bytes survive
    via inode refcounting — same invariant the pruned merge relies on).
    Unlike Delta, there is no shared transaction log to dangle: deleting
    the source cannot break the clone.
    """
    target_path = os.path.abspath(target_path)
    if os.path.exists(target_path):
        raise ValueError(f"target {target_path} already exists")
    meta = table._read_meta()
    src_dir = table._snapshot_dir(meta)
    snap = "v=0"
    dst_dir = os.path.join(target_path, snap)
    for root, _dirs, names in os.walk(src_dir):
        rel = os.path.relpath(root, src_dir)
        dest = dst_dir if rel == "." else os.path.join(dst_dir, rel)
        os.makedirs(dest, exist_ok=True)
        for n in names:
            if n.endswith(".parquet") and not n.startswith(("_", ".")):
                try:
                    os.link(os.path.join(root, n), os.path.join(dest, n))
                except OSError:
                    shutil.copy2(os.path.join(root, n), os.path.join(dest, n))
    os.makedirs(dst_dir, exist_ok=True)  # empty-source clone still valid
    new_meta = {
        "version": 0,
        "current": snap,
        "partition_columns": list(meta["partition_columns"]),
        "schema": meta["schema"],
        "properties": dict(meta["properties"]),
        "history": [
            {
                "version": 0,
                "operation": f"SHALLOW CLONE {table.path}",
                "timestamp": time.time(),
            }
        ],
    }
    clone = ManagedTable.__new__(ManagedTable)
    clone.spark = table.spark
    clone.path = target_path
    clone._write_meta(new_meta)
    return ManagedTable(table.spark, target_path)


def table_changes(
    table: ManagedTable, from_version: int, to_version: Optional[int] = None
) -> DataFrame:
    """Row-level change feed between two readable versions — Delta
    Change Data Feed's query surface (``table_changes(...)``), computed
    by diffing snapshots instead of logging per-commit deltas: inserted
    rows carry ``_change_type='insert'``, removed rows ``'delete'``; an
    update appears as its delete+insert pair (CDF's
    ``update_preimage``/``update_postimage`` without a row identity
    contract, which a snapshot diff cannot infer).

    Requires both endpoints readable: ``from_version`` retained (the
    ``mack.retain_snapshots`` property) and ``to_version`` retained or
    current (default: current). SCALE: one full-outer anti-join pair
    over the two snapshots — exact, but O(both snapshots); a log-based
    CDF (Delta's) is cheaper per query, which is why this is the
    audit/backfill path, not a streaming source.
    """
    pre = table.toDF(version=from_version)
    post = table.toDF(version=to_version) if to_version is not None else table.toDF()
    cols = pre.columns
    inserts = post.exceptAll(pre).withColumn("_change_type", F.lit("insert"))
    deletes = pre.exceptAll(post).withColumn("_change_type", F.lit("delete"))
    return inserts.unionByName(deletes).select(*cols, "_change_type")


def vacuum(table: ManagedTable, dry_run: bool = False) -> List[str]:
    """Delete files no live version references — Delta's ``VACUUM``
    for this layout. Removable garbage accumulates from (a) writers that
    crashed mid-stage (``.staging-*`` dirs), (b) commit-CAS losers that
    died before their own cleanup ran (orphan ``v=*`` dirs), and (c)
    commit markers for already-committed versions — safe to prune
    because every claimer re-checks the on-disk version after winning
    the marker CAS (``_claim_version``), so a pruned marker can never
    readmit a stale writer. A marker ABOVE the committed version is
    left alone: it is either an in-flight writer or crash debris, and
    ``_claim_version`` reclaims the latter after its staleness TTL.

    Safe under the commit protocol: a CONCURRENT writer stages into
    ``.staging-*``/unique ``v=*`` dirs *before* claiming a version, so
    vacuum can race it — run vacuum when no writer is active (the same
    operational contract as Delta VACUUM with retention 0).

    Returns the deleted (or, with ``dry_run``, deletable) paths.
    """
    meta = table._read_meta()
    live = {meta["current"]} | {s["dir"] for s in meta.get("retained", [])}
    doomed = []
    for name in sorted(os.listdir(table.path)):
        full = os.path.join(table.path, name)
        if not os.path.isdir(full) or name == COMMITS_DIR:
            continue
        if (name.startswith("v=") or name.startswith(".staging-")) and name not in live:
            doomed.append(full)
    commits = os.path.join(table.path, COMMITS_DIR)
    if os.path.isdir(commits):
        for name in sorted(os.listdir(commits)):
            if not name.endswith(".commit"):
                continue
            try:
                v = int(name[1 : -len(".commit")])
            except ValueError:
                continue
            if v <= meta["version"]:
                doomed.append(os.path.join(commits, name))
    if not dry_run:
        for d in doomed:
            if os.path.isdir(d):
                shutil.rmtree(d, ignore_errors=True)
            else:
                try:
                    os.unlink(d)
                except OSError:
                    pass
    return doomed


def _predicate_references(spark: SparkSession, condition: str) -> List[str]:
    """Column names referenced by a SQL predicate (Catalyst parser —
    the same resolution DELETE itself uses, so no regex guessing)."""
    expr = spark._jsparkSession.sessionState().sqlParser().parseExpression(condition)
    it = expr.references().iterator()
    names = []
    while it.hasNext():
        names.append(it.next().name())
    return names


def delete_where(
    table: ManagedTable,
    condition: str,
    touched_keys: Optional[tuple] = None,
) -> None:
    """``DELETE FROM table WHERE condition`` for the parquet
    ManagedTable — the generic mutation behind Delta's
    ``DeltaTable.delete(condition)`` (the reference composes it only
    inside kill_duplicates/drop_duplicates_pkey via MERGE,
    mack/__init__.py:190-192, :253-255; this exposes it directly).

    Semantics are SQL DELETE three-valued logic: rows where the
    condition evaluates TRUE are removed; FALSE **and NULL** rows stay.

    SCALE — pruned commits, chosen automatically:

    * If the predicate references ONLY partition columns, it is
      evaluated against the distinct partition-value tuples (a
      partition-pruned scan of just those columns), and the commit
      rewrites ONLY partitions where it can be TRUE — every other
      partition is hard-linked untouched.
    * On unpartitioned tables callers who know the touched key range
      pass ``touched_keys=(key_col, keys_df)`` and get the footer-stats
      file-pruned rewrite.
    * Otherwise the commit is the plain full post-state overwrite —
      exactly Delta's behavior when a delete predicate prunes nothing.
    """
    if isinstance(table, DeltaBackedTable):
        table.delete(condition)
        return
    spark = table.spark
    cond = F.expr(condition)
    post_state = table.toDF().filter(~F.coalesce(cond, F.lit(False)))
    meta = table._read_meta()
    parts = meta["partition_columns"]
    refs = _predicate_references(spark, condition)
    touched_partitions = None
    if parts and refs and set(refs) <= set(parts):
        # a partition-only predicate is constant per partition: TRUE
        # partitions rewrite (their matching rows delete), FALSE and
        # NULL partitions keep every row and stay hard-linked. filter()
        # keeps exactly the TRUE tuples.
        tuples = table.toDF().select(*parts).distinct()
        touched_partitions = [
            {p: r[p] for p in parts} for r in tuples.filter(cond).collect()
        ]
        if not touched_partitions:
            return  # predicate can match no partition: no-op, no commit
    table.merge_overwrite(
        post_state,
        "DELETE",
        touched_partitions=touched_partitions,
        touched_keys=touched_keys,
    )


def update_where(
    table: ManagedTable,
    condition: str,
    assignments: Dict[str, str],
    touched_keys: Optional[tuple] = None,
) -> None:
    """``UPDATE table SET col = expr, ... WHERE condition`` — Delta's
    ``DeltaTable.update`` on the parquet ManagedTable, with the same
    automatic commit pruning as :func:`delete_where`.

    ``assignments`` maps column name → SQL expression (evaluated
    against the pre-update row, all assignments simultaneously, cast
    back to the column's declared type — SQL UPDATE semantics). Rows
    where the condition is FALSE or NULL are untouched.

    Pruning guard: if any assignment targets a partition column, rows
    can MOVE between partitions, so the partition-pruned path is
    disabled and the commit is the full post-state overwrite (matching
    Delta, where such updates rewrite across partitions).
    """
    if isinstance(table, DeltaBackedTable):
        table.update(condition, assignments)
        return
    spark = table.spark
    unknown = set(assignments) - set(table.toDF().columns)
    if unknown:
        raise ValueError(f"assignments target unknown columns: {sorted(unknown)}")
    cond = F.coalesce(F.expr(condition), F.lit(False))
    schema = table.declared_schema
    types = {f.name: f.dataType for f in schema.fields}
    cols = []
    for c in table.toDF().columns:
        if c in assignments:
            cols.append(
                F.when(cond, F.expr(assignments[c]).cast(types[c]))
                .otherwise(F.col(c))
                .alias(c)
            )
        else:
            cols.append(F.col(c))
    post_state = table.toDF().select(*cols)
    meta = table._read_meta()
    parts = meta["partition_columns"]
    refs = _predicate_references(spark, condition)
    touched_partitions = None
    if (
        parts
        and refs
        and set(refs) <= set(parts)
        and not (set(assignments) & set(parts))
    ):
        tuples = table.toDF().select(*parts).distinct()
        touched_partitions = [
            {p: r[p] for p in parts}
            for r in tuples.filter(F.expr(condition)).collect()
        ]
        if not touched_partitions:
            return
    table.merge_overwrite(
        post_state,
        "UPDATE",
        touched_partitions=touched_partitions,
        touched_keys=touched_keys,
    )


def rename_catalog_table(spark: SparkSession, old_name: str, new_name: str) -> None:
    """Rename a METASTORE-registered table with one DDL statement — the
    reference's Databricks branch (reference mack/__init__.py:733:
    ``ALTER TABLE ... RENAME TO``), which renames in catalog metadata
    without touching data files or history. The path-based twin is
    :func:`rename_table`. Works against any Spark catalog (tested on
    the local session catalog; on a Hive/Unity metastore it is the same
    statement).
    """
    if not old_name or not new_name:
        raise TypeError("both old_name and new_name must be provided")
    quote = lambda n: ".".join(f"`{p}`" for p in n.split("."))  # noqa: E731
    spark.sql(f"ALTER TABLE {quote(old_name)} RENAME TO {quote(new_name)}")


def latest_version(table: ManagedTable) -> int:
    """Max version in history (reference mack/__init__.py:616-627)."""
    return max(h["version"] for h in table.history())


def file_sizes(table: ManagedTable) -> Dict[str, Union[int, float]]:
    """``{size_in_bytes, number_of_files, average_file_size_in_bytes}``.

    Parity: average is ``round(size/files, 0)`` — a float in a dict of
    ints, as in the reference (mack/__init__.py:459-477).
    """
    d = table.detail()
    return {
        "size_in_bytes": d["sizeInBytes"],
        "number_of_files": d["numFiles"],
        "average_file_size_in_bytes": round(d["sizeInBytes"] / d["numFiles"], 0)
        if d["numFiles"]
        else 0.0,
    }


def optimize_compact(
    table: ManagedTable,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_by: Optional[List[str]] = None,
    selective: bool = False,
    min_file_bytes: Optional[int] = None,
) -> Dict[str, int]:
    """OPTIMIZE-style small-file compaction: rewrite the current
    snapshot into ``max(1, ceil(size / target_file_bytes))`` files.

    The remedy for the small-file problem ``file_sizes`` diagnoses
    (the reference exposes the diagnosis, mack/__init__.py:459-509, but
    not the fix — Delta users reach for ``OPTIMIZE``). SCALE: one
    distributed read + ``repartition`` + write; 128 MB targets the
    parquet row-group / HDFS-block sweet spot. Partitioned tables keep
    their partitioning (the repartition happens within the write).

    ``sort_by`` range-clusters the rewrite on the given columns
    (``OPTIMIZE ... ZORDER BY``'s one-dimensional cousin): files get
    disjoint key ranges, which is exactly what makes
    ``merge_overwrite(touched_keys=...)``'s footer-stats file pruning
    effective — run a keyed compaction once, and every subsequent keyed
    merge rewrites only the files whose range the keys hit. For true
    multi-column locality use :func:`mack_spark.operators.zorder_by`.

    ``selective=True`` is Delta ``OPTIMIZE``'s actual contract: only
    files smaller than ``min_file_bytes`` (default ``target / 2``) are
    read and re-binned; already-right-sized files are hard-linked
    untouched. After steady append traffic the small-file tail is a
    sliver of the table, so a selective OPTIMIZE costs O(small files),
    not O(table) — the difference between a nightly maintenance job and
    a nightly full rewrite at 100 TB. Selective mode skips partitioned
    tables and ``sort_by`` requests (a global re-cluster genuinely
    rewrites everything) and falls back to the full rewrite.

    Returns ``{"files_before": int, "files_after": int}``.
    """
    import math

    before = table.detail()
    meta = table._read_meta()
    if (
        selective
        and not meta["partition_columns"]
        and not sort_by
        and before["numFiles"] > 1
    ):
        if min_file_bytes is None:
            min_file_bytes = target_file_bytes // 2
        files = table._data_files()
        small = [f for f in files if os.path.getsize(f) < min_file_bytes]
        big = [f for f in files if os.path.getsize(f) >= min_file_bytes]
        if len(small) > 1 and big:
            small_bytes = sum(os.path.getsize(f) for f in small)
            n = max(1, math.ceil(small_bytes / target_file_bytes))
            declared = StructType.fromJson(json.loads(meta["schema"]))
            rewrite = (
                table.spark.read.schema(declared)
                .parquet(*small)
                .repartition(n)
            )
            table._commit_partial_rewrite(
                meta, "OPTIMIZE", rewrite, big, sized=False
            )
            return {
                "files_before": before["numFiles"],
                "files_after": table.detail()["numFiles"],
            }
    n = max(1, math.ceil(before["sizeInBytes"] / target_file_bytes))
    df = table.toDF()
    if sort_by:
        df = df.repartitionByRange(n, *sort_by).sortWithinPartitions(*sort_by)
    else:
        df = df.repartition(n)
    table.overwrite(df, operation="OPTIMIZE", schema_change=False, sized=False)
    return {
        "files_before": before["numFiles"],
        "files_after": table.detail()["numFiles"],
    }


def show_file_sizes(table: ManagedTable, humanize_binary: bool = False) -> None:
    """Print humanized file sizes (reference mack/__init__.py:480-509)."""
    from mack_spark.fmt import humanize_bytes, humanize_bytes_binary

    fmt = humanize_bytes_binary if humanize_binary else humanize_bytes
    sizes = file_sizes(table)
    # Message shape matches the reference's show_delta_file_sizes output
    # (reference mack/__init__.py:480-509, asserted via capfd in tests:701-720).
    print(
        f"The delta table contains {sizes['number_of_files']:,} files "
        f"with a size of {fmt(sizes['size_in_bytes'])}."
        f" The average file size is {fmt(int(sizes['average_file_size_in_bytes']))}"
    )


def rename_delta_table(
    delta_table: ManagedTable,
    new_table_name: str,
    table_location: Optional[str] = None,
    databricks: bool = False,
    spark_session: Optional[SparkSession] = None,
) -> None:
    """The reference's flag-shaped rename, signature-for-signature
    (reference mack/__init__.py:696-738): ``databricks=True`` issues
    ``ALTER TABLE ... RENAME TO`` through the provided session (a
    catalog-metadata rename — data files untouched); otherwise the
    table's rows are materialized under the new catalog name via
    ``saveAsTable`` (the reference's non-Databricks behavior, which
    rewrites data and does not carry history). Error contract mirrors
    the reference exactly: TypeError for a non-table first argument,
    TypeError for ``databricks=True`` without a session.

    ``table_location`` names the CURRENT catalog entry for the
    databricks path (the reference reads ``delta_table.name``; a
    path-backed ManagedTable has no catalog name, so the caller supplies
    it — defaulting to the path's basename). History-preserving renames
    of path-based tables should use :func:`rename_table` instead.
    """
    if not isinstance(delta_table, ManagedTable):
        raise TypeError("An existing delta table must be specified for delta_table.")
    if databricks and spark_session is None:
        raise TypeError("A spark session must be specified for databricks.")
    if databricks:
        old_name = table_location or os.path.basename(delta_table.path)
        rename_catalog_table(spark_session, old_name, new_table_name)
    else:
        delta_table.toDF().write.mode("overwrite").saveAsTable(new_table_name)


# Drop-in aliases under the reference's exact public names
# (mack/__init__.py:459 delta_file_sizes, :480 show_delta_file_sizes)
# so reference callers can switch imports without renaming call sites.
delta_file_sizes = file_sizes
show_delta_file_sizes = show_file_sizes
