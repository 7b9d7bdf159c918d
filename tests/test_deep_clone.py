"""Round-13: protocol-level DEEP CLONE + version checksums.

``deep_clone`` materializes a fully standalone copy — live data files
(and referenced DV files) byte-copied under the clone root by a
DISTRIBUTED job, fresh version-0 CLONE commit, fresh table id, no
carried history or SetTransaction watermarks; row-tracking base ids
and the rowIdHighWaterMark domain carry over so ``_row_id`` is
identical on both sides. ``<version>.crc`` sidecars summarize each
commit's post-state (delta's version checksum); ``validate_checksum``
raises on replay/summary disagreement.
"""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from mack_spark.sources.delta_log import (
    DeltaProtocolError,
    DeltaProtocolTable,
    clear_replay_cache,
)


def _mk(spark, tmp_path, name="src", n=60, props=None, partition=False):
    df = spark.createDataFrame(
        [(i, f"r{i}", "even" if i % 2 == 0 else "odd") for i in range(n)],
        "pkey int, attr string, par string",
    ).repartition(3)
    return DeltaProtocolTable.create(
        spark, str(tmp_path / name), df,
        partition_by=["par"] if partition else None,
        properties=props or {},
    )


class TestDeepClone:
    def test_data_and_files_copied(self, spark, tmp_path):
        src = _mk(spark, tmp_path)
        src.append(spark.createDataFrame(
            [(100, "x", "even")], "pkey int, attr string, par string"
        ))
        want = sorted(map(tuple, src.to_df().collect()))
        c = DeltaProtocolTable.deep_clone(
            spark, src.path, str(tmp_path / "dst")
        )
        assert sorted(map(tuple, c.to_df().collect())) == want
        # every add's file physically exists under the CLONE root
        for p in c.snapshot().files:
            assert not os.path.isabs(p)
            assert os.path.exists(os.path.join(c.path, p))

    def test_independent_histories(self, spark, tmp_path):
        src = _mk(spark, tmp_path)
        want = sorted(map(tuple, src.to_df().collect()))
        c = DeltaProtocolTable.deep_clone(
            spark, src.path, str(tmp_path / "dst")
        )
        src.delete_where("pkey < 30")
        assert sorted(map(tuple, c.to_df().collect())) == want
        c.delete_where("pkey >= 30")
        assert src.to_df().count() == 30
        assert c.to_df().count() == 30
        # fresh identity, no carried transactions, own history
        assert c.snapshot().metadata["id"] != src.snapshot().metadata["id"]
        assert c.snapshot().txns == {}
        assert c.snapshot().version == 1  # CLONE + its own DELETE

    def test_partitioned_clone(self, spark, tmp_path):
        src = _mk(spark, tmp_path, partition=True)
        want = sorted(map(tuple, src.to_df().collect()))
        c = DeltaProtocolTable.deep_clone(
            spark, src.path, str(tmp_path / "dst")
        )
        assert sorted(map(tuple, c.to_df().collect())) == want
        assert c.snapshot().partition_columns == ["par"]

    def test_dv_files_copied(self, spark, tmp_path):
        src = _mk(spark, tmp_path,
                  props={"delta.enableDeletionVectors": "true"})
        src.delete_where("pkey % 5 = 0")  # DV delete
        assert any(
            a.get("deletionVector")
            for a in src.snapshot().files.values()
        )
        want = sorted(map(tuple, src.to_df().collect()))
        c = DeltaProtocolTable.deep_clone(
            spark, src.path, str(tmp_path / "dst")
        )
        # the clone reads correctly even after the SOURCE dies
        shutil.rmtree(src.path)
        clear_replay_cache(src.path)
        assert sorted(map(tuple, c.to_df().collect())) == want

    def test_row_ids_carry_over(self, spark, tmp_path):
        src = _mk(spark, tmp_path,
                  props={"delta.enableRowTracking": "true"})
        ids = {
            r["pkey"]: r["_row_id"]
            for r in src.to_df(with_row_ids=True).collect()
        }
        hwm_src = json.loads(
            src.snapshot().domains["delta.rowTracking"]["configuration"]
        )["rowIdHighWaterMark"]
        c = DeltaProtocolTable.deep_clone(
            spark, src.path, str(tmp_path / "dst")
        )
        assert {
            r["pkey"]: r["_row_id"]
            for r in c.to_df(with_row_ids=True).collect()
        } == ids
        # allocations continue past the carried high-water mark
        c.append(spark.createDataFrame(
            [(200, "n", "even")], "pkey int, attr string, par string"
        ))
        new_id = {
            r["pkey"]: r["_row_id"]
            for r in c.to_df(with_row_ids=True).collect()
        }[200]
        assert new_id > hwm_src

    def test_deep_clone_of_shallow_clone_detaches(self, spark, tmp_path):
        src = _mk(spark, tmp_path)
        want = sorted(map(tuple, src.to_df().collect()))
        sh = DeltaProtocolTable.shallow_clone(
            spark, src.path, str(tmp_path / "sh")
        )
        det = DeltaProtocolTable.deep_clone(
            spark, sh.path, str(tmp_path / "det")
        )
        shutil.rmtree(src.path)  # kill the shallow clone's source
        clear_replay_cache()
        assert sorted(map(tuple, det.to_df().collect())) == want
        # materialized copies live under the DETACHED root
        for p in det.snapshot().files:
            assert os.path.exists(os.path.join(det.path, p))

    def test_existing_target_refused(self, spark, tmp_path):
        src = _mk(spark, tmp_path)
        with pytest.raises(FileExistsError):
            DeltaProtocolTable.deep_clone(spark, src.path, src.path)


class TestVersionChecksums:
    def test_crc_written_per_commit(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        t.append(spark.createDataFrame(
            [(100, "x", "even")], "pkey int, attr string, par string"
        ))
        logdir = os.path.join(t.path, "_delta_log")
        crcs = sorted(f for f in os.listdir(logdir) if f.endswith(".crc"))
        assert crcs == ["%020d.crc" % v for v in range(2)]
        snap = t.snapshot()
        crc = json.loads(open(os.path.join(logdir, crcs[-1])).read())
        assert crc["numFiles"] == len(snap.files)
        assert crc["tableSizeBytes"] == sum(
            a["size"] for a in snap.files.values()
        )
        assert crc["metadata"]["id"] == snap.metadata["id"]

    def test_validate_checksum(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        assert t.validate_checksum() is True
        assert t.validate_checksum(version=0) is True

    def test_tampered_checksum_raises(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        v = t.snapshot().version
        p = os.path.join(t.path, "_delta_log", "%020d.crc" % v)
        c = json.loads(open(p).read())
        c["tableSizeBytes"] += 1
        open(p, "w").write(json.dumps(c))
        with pytest.raises(DeltaProtocolError, match="mismatch"):
            t.validate_checksum()

    def test_foreign_log_without_crc_reads_fine(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        logdir = os.path.join(t.path, "_delta_log")
        for f in os.listdir(logdir):
            if f.endswith(".crc"):
                os.unlink(os.path.join(logdir, f))
        clear_replay_cache(t.path)
        assert t.to_df().count() == 60
        assert t.validate_checksum() is False  # absent, not an error

    def test_cleanup_expires_crc_with_log(self, spark, tmp_path):
        import time as _time

        t = _mk(spark, tmp_path, props={
            "delta.logRetentionDuration": "interval 1 hours",
        })
        for i in range(3):
            t.append(spark.createDataFrame(
                [(100 + i, "x", "even")],
                "pkey int, attr string, par string",
            ))
        t.checkpoint()
        logdir = os.path.join(t.path, "_delta_log")
        old = _time.time() - 100 * 3600
        for v in range(3):
            for ext in ("json", "crc"):
                os.utime(os.path.join(logdir, f"%020d.{ext}" % v),
                         (old, old))
        gone = t.cleanup_metadata()
        assert "%020d.crc" % 0 in gone
        assert "%020d.json" % 0 in gone


class TestOptimizeWhere:
    """r13: ``OPTIMIZE ... WHERE`` — delta's partition-predicate scope:
    only files in selected partitions compact; everything else is
    untouched (not read, not rewritten)."""

    def _small_files(self, spark, tmp_path):
        t = _mk(spark, tmp_path, name="ow", partition=True)
        for i in range(3):
            t.append(spark.createDataFrame(
                [(200 + i, "x", "even"), (300 + i, "y", "odd")],
                "pkey int, attr string, par string",
            ))
        return t

    def test_scoped_compaction(self, spark, tmp_path):
        t = self._small_files(spark, tmp_path)
        snap = t.snapshot()
        odd_before = {
            p for p, a in snap.files.items()
            if (a.get("partitionValues") or {}).get("par") == "odd"
        }
        want = sorted(map(tuple, t.to_df().collect()))
        res = t.optimize(target_file_bytes=1 << 20, where="par = 'even'")
        assert res["rewritten"] > 0
        after = t.snapshot()
        odd_after = {
            p for p, a in after.files.items()
            if (a.get("partitionValues") or {}).get("par") == "odd"
        }
        assert odd_after == odd_before  # untouched, same log entries
        assert sorted(map(tuple, t.to_df().collect())) == want

    def test_scoped_zorder(self, spark, tmp_path):
        t = self._small_files(spark, tmp_path)
        want = sorted(map(tuple, t.to_df().collect()))
        res = t.optimize(
            target_file_bytes=1 << 20, zorder_by=["pkey"],
            where="par = 'odd'",
        )
        assert res["rewritten"] > 0
        assert sorted(map(tuple, t.to_df().collect())) == want

    def test_unpartitioned_refused(self, spark, tmp_path):
        t = _mk(spark, tmp_path, name="up")
        with pytest.raises(DeltaProtocolError, match="partitioned"):
            t.optimize(where="pkey = 1")

    def test_non_partition_predicate_refused(self, spark, tmp_path):
        t = self._small_files(spark, tmp_path)
        with pytest.raises(DeltaProtocolError, match="partition columns"):
            t.optimize(where="attr = 'x'")

    def test_no_match_is_noop(self, spark, tmp_path):
        t = self._small_files(spark, tmp_path)
        v = t.snapshot().version
        res = t.optimize(target_file_bytes=1 << 20,
                         where="par = 'nothing'")
        assert res["rewritten"] == 0
        assert t.snapshot().version == v
