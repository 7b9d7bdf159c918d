"""Pluggable commit LogStore: how a ``_delta_log`` version file is
atomically claimed.

The Delta protocol's multi-writer story is exactly one primitive:
**put-if-absent** of ``_delta_log/%020d.json``. Filesystems with an
atomic exclusive create (POSIX ``O_EXCL``, HDFS ``create``, ABFS/GCS
conditional writes) give it directly — :class:`PosixLogStore`. Object
stores WITHOUT it (S3's PUT unconditionally overwrites) need an
external arbiter; delta-spark ships ``S3DynamoDBLogStore`` for that
(delta-io/delta PROTOCOL.md §Delta Log Entries + the LogStore API of
delta-storage — both public), whose commit recipe
:class:`CoordinatedLogStore` reproduces:

1. write the commit payload to a UNIQUE temp object
   (``_delta_log/.tmp/<uuid>-<n>.json``) — plain PUT, no atomicity
   needed because the name never collides;
2. CLAIM the version in an external coordination table with an atomic
   conditional insert keyed ``(log_dir, version)`` carrying
   ``{temp, complete=false}`` — exactly one writer's insert succeeds,
   the loser has a lost race;
3. copy temp → ``%020d.json`` with a plain overwrite PUT (safe: only
   the claim owner ever writes this name, and the payload is
   immutable);
4. mark the claim ``complete=true``.

A crash between 2 and 3 leaves a claimed-but-missing version; every
reader/writer first runs :meth:`LogStore.reconcile`, which finishes
the copy from the recorded temp object — the fixup rule that makes
the scheme exactly-once (N is never re-claimable, and its bytes are
already durable in the temp object).

Locally the coordination table is a DIRECTORY (``coordinator_dir``)
whose conditional insert is emulated with an atomic hard link of a
fully-written unique file — standing in for DynamoDB's conditional
``PutItem`` the same way delta's own unit tests stand it in with an
in-memory map. The seam is the point: on a real deployment the
coordinator is a CAS service; the engine's commit path is identical.

SCALE: both stores do O(1) driver-side filesystem work per commit;
``reconcile`` lists only the coordinator's per-table claim directory
(bounded by in-flight commits — completed claims older than the
retention window are pruned), never the data.
"""

from __future__ import annotations

import hashlib
import json
import os
import uuid
from typing import Optional

__all__ = [
    "LogStoreConflict",
    "LogStore",
    "PosixLogStore",
    "CoordinatedLogStore",
    "DEFAULT_LOG_STORE",
]


class LogStoreConflict(Exception):
    """The version was already claimed/committed by another writer."""


class LogStore:
    """Abstract put-if-absent + reconcile seam for commit files."""

    name = "abstract"

    def put_if_absent(self, path: str, payload: str) -> None:
        """Atomically create ``path`` with ``payload``; raise
        :class:`LogStoreConflict` if any writer already claimed it."""
        raise AssertionError("LogStore subclass must implement")

    def reconcile(self, log_dir: str) -> None:
        """Finish any claimed-but-unmaterialized commits so listings
        see every durable version. No-op for atomic-create stores."""


class PosixLogStore(LogStore):
    """Atomic exclusive create — POSIX/HDFS/ABFS/GCS semantics."""

    name = "posix"

    def put_if_absent(self, path: str, payload: str) -> None:
        try:
            with open(path, "x") as fh:
                fh.write(payload)
        except FileExistsError:
            raise LogStoreConflict(path) from None


class CoordinatedLogStore(LogStore):
    """Put-if-absent for stores WITHOUT atomic create, arbitrated by
    an external coordination table (see module docstring). All writes
    into the log directory are plain overwrite PUTs."""

    name = "coordinated"

    def __init__(self, coordinator_dir: str, claim_ttl_seconds: int = 3600):
        self.coordinator_dir = os.path.abspath(coordinator_dir)
        # completed claims are only load-bearing during the commit
        # race window; expire them like S3DynamoDBLogStore's TTL so
        # the coordination table stays bounded by in-flight commits
        self.claim_ttl_seconds = claim_ttl_seconds

    # -- coordination-table emulation ---------------------------------

    def _claims_dir(self, log_dir: str) -> str:
        key = hashlib.sha1(
            os.path.abspath(log_dir).encode()
        ).hexdigest()
        return os.path.join(self.coordinator_dir, key)

    def _claim_path(self, log_dir: str, fname: str) -> str:
        return os.path.join(self._claims_dir(log_dir), fname + ".claim")

    def _conditional_insert(self, claim: str, item: dict) -> bool:
        """Atomic insert-if-absent of a fully-formed claim item (the
        DynamoDB conditional PutItem stand-in): write a unique file,
        hard-link it to the claim name — link(2) is atomic and fails
        on an existing target, and the target is never observable
        half-written."""
        d = os.path.dirname(claim)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".ins-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump(item, fh)
        try:
            os.link(tmp, claim)
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def _read_claim(self, claim: str) -> Optional[dict]:
        try:
            with open(claim) as fh:
                return json.load(fh)
        except (OSError, ValueError):
            return None

    def _update_claim(self, claim: str, item: dict) -> None:
        # owner-only overwrite; atomic-rename so readers never see a
        # torn item
        tmp = claim + f".upd-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(item, fh)
        os.replace(tmp, claim)

    # -- object-store emulation ---------------------------------------

    @staticmethod
    def _put_overwrite(path: str, payload: str) -> None:
        """A plain object-store PUT: last writer wins, no O_EXCL.
        Written via a unique temp + rename only so local readers never
        observe a torn file — S3 PUTs are already all-or-nothing."""
        tmp = f"{path}.put-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            fh.write(payload)
        os.replace(tmp, path)

    # -- LogStore interface -------------------------------------------

    def put_if_absent(self, path: str, payload: str) -> None:
        log_dir = os.path.dirname(os.path.abspath(path))
        fname = os.path.basename(path)
        tmp_dir = os.path.join(log_dir, ".tmp")
        os.makedirs(tmp_dir, exist_ok=True)
        temp = os.path.join(tmp_dir, f"{uuid.uuid4().hex}-{fname}")
        self._put_overwrite(temp, payload)
        claim = self._claim_path(log_dir, fname)
        if not self._conditional_insert(
            claim, {"temp": temp, "complete": False}
        ):
            # lost the claim race; help the winner forward (it may
            # have crashed mid-copy), then surface the conflict
            try:
                os.unlink(temp)
            except OSError:
                pass
            self._reconcile_claim(log_dir, claim)
            raise LogStoreConflict(path)
        self._put_overwrite(path, payload)
        self._update_claim(claim, {"temp": temp, "complete": True})

    def _reconcile_claim(self, log_dir: str, claim: str) -> None:
        item = self._read_claim(claim)
        if item is None or item.get("complete"):
            return
        fname = os.path.basename(claim)[: -len(".claim")]
        final = os.path.join(log_dir, fname)
        if not os.path.exists(final):
            try:
                with open(item["temp"]) as fh:
                    payload = fh.read()
            except (OSError, KeyError):
                return  # temp already gone: owner completed + cleaned
            self._put_overwrite(final, payload)
        self._update_claim(claim, dict(item, complete=True))

    def reconcile(self, log_dir: str) -> None:
        import time

        cd = self._claims_dir(log_dir)
        try:
            names = os.listdir(cd)
        except OSError:
            return
        cutoff = time.time() - self.claim_ttl_seconds
        for n in names:
            if not n.endswith(".claim"):
                continue
            claim = os.path.join(cd, n)
            self._reconcile_claim(log_dir, claim)
            # expire: complete + materialized + past the race window
            try:
                st = os.stat(claim)
            except OSError:
                continue
            if st.st_mtime >= cutoff:
                continue
            item = self._read_claim(claim)
            final = os.path.join(log_dir, n[: -len(".claim")])
            if item and item.get("complete") and os.path.exists(final):
                try:
                    os.unlink(claim)
                    if item.get("temp"):
                        os.unlink(item["temp"])
                except OSError:
                    pass


DEFAULT_LOG_STORE = PosixLogStore()
