"""Deletion-vector WRITES (round 11, VERDICT-r10 #3): with
``delta.enableDeletionVectors=true`` a DELETE/UPDATE commits deletion
vectors instead of rewriting data files — Delta's actual 100-TB delete
path (delta-spark 3.x behavior the reference inherits, reference
pyproject.toml:13-14). Pinned here:

* the data file is NOT rewritten (same inode/bytes on disk);
* positions accumulate across deletes (bitmap union);
* a full-file delete removes the file instead of DV'ing all rows;
* UPDATE DVs the pre-image rows and writes only post-image rows;
* the DV state survives checkpoints, restore, vacuum, and time travel;
* CDF rows are exact for DV'd deletes/updates;
* the protocol auto-upgrades to a table-features log on enablement;
* delta.appendOnly blocks DELETE/UPDATE/OVERWRITE/RESTORE.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from mack_spark.sources.delta_log import (
    DeltaProtocolError,
    DeltaProtocolTable,
    _decode_dv_bitmap,
    _dv_file_path,
    _encode_dv_bitmap_np,
    _z85_decode,
    _z85_encode,
)

DV_ON = {"delta.enableDeletionVectors": "true"}


def _mk(spark, path, n=40, files=2, props=None):
    df = spark.range(n).selectExpr(
        "cast(id as int) pkey", "concat('v', id) attr"
    ).repartition(files)
    return DeltaProtocolTable.create(
        spark, path, df, properties=dict(DV_ON, **(props or {}))
    )


def _file_sig(t):
    """path → (inode, mtime, size) of every live data file."""
    out = {}
    for p in t.snapshot().files:
        st = os.stat(os.path.join(t.path, p))
        out[p] = (st.st_ino, st.st_mtime_ns, st.st_size)
    return out


class TestEncoder:
    def test_product_encoder_roundtrips_through_reference_decoder(self):
        import numpy as np

        cases = [
            [0, 1, 5, 65535, 65536, 70000],
            list(range(0, 12000)),               # >4096 → bitset container
            [3, (1 << 32) + 7, (5 << 32) + 9],   # high-32 buckets
            [0],
        ]
        for pos in cases:
            arr = np.array(sorted(pos), dtype=np.int64)
            assert _decode_dv_bitmap(_encode_dv_bitmap_np(arr)) == sorted(pos)

    def test_z85_encode_matches_decode(self):
        import uuid

        raw = uuid.uuid4().bytes
        assert _z85_decode(_z85_encode(raw)) == raw


class TestDeleteWithDvs:
    def test_delete_writes_dv_not_rewrite(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "t"))
        before = _file_sig(t)
        res = t.delete_where("pkey < 5")
        assert res["rewritten_files"] == 0
        assert res["deletion_vectors"] >= 1
        after = _file_sig(t)
        # THE point: the same physical files, byte-identical, same inode
        assert after == before
        # and the DV descriptors are live in the snapshot
        snap = t.snapshot()
        dvd = [a for a in snap.files.values() if a.get("deletionVector")]
        assert len(dvd) == res["deletion_vectors"]
        got = sorted(r["pkey"] for r in t.to_df().collect())
        assert got == list(range(5, 40))

    def test_protocol_upgraded_on_enablement(self, spark, tmp_path):
        df = spark.range(10).selectExpr("cast(id as int) pkey")
        t = DeltaProtocolTable.create(spark, str(tmp_path / "u"), df)
        assert t.snapshot().protocol["minWriterVersion"] <= 4
        t.set_properties(DV_ON)
        proto = t.snapshot().protocol
        assert proto["minReaderVersion"] == 3
        assert proto["minWriterVersion"] == 7
        assert "deletionVectors" in proto["readerFeatures"]
        assert "deletionVectors" in proto["writerFeatures"]
        # legacy-implied features are declared too (spec upgrade rule)
        assert "invariants" in proto["writerFeatures"]

    def test_second_delete_unions_positions(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "t2"), n=30, files=1)
        t.delete_where("pkey < 3")
        sig_after_first = _file_sig(t)
        t.delete_where("pkey >= 27")
        assert _file_sig(t) == sig_after_first  # still no rewrite
        snap = t.snapshot()
        [add] = [a for a in snap.files.values() if a.get("deletionVector")]
        assert int(add["deletionVector"]["cardinality"]) == 6
        got = sorted(r["pkey"] for r in t.to_df().collect())
        assert got == list(range(3, 27))

    def test_full_file_delete_removes_file(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(i, "A" if i < 10 else "B") for i in range(20)],
            "pkey int, part string",
        ).repartition(1)
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / "f"), df,
            partition_by=["part"], properties=dict(DV_ON),
        )
        res = t.delete_where("part = 'A'")
        snap = t.snapshot()
        assert len(snap.files) == 1  # partition A's file plainly removed
        assert not any(a.get("deletionVector") for a in snap.files.values())
        assert res["deletion_vectors"] == 0
        assert sorted(r["pkey"] for r in t.to_df().collect()) == list(
            range(10, 20)
        )

    def test_delete_condition_on_live_rows_only(self, spark, tmp_path):
        """A second delete's predicate evaluates over LIVE rows; rows
        already DV'd stay deleted and are not double-counted."""
        t = _mk(spark, str(tmp_path / "l"), n=20, files=1)
        t.delete_where("pkey % 2 = 0")
        t.delete_where("pkey < 10")
        got = sorted(r["pkey"] for r in t.to_df().collect())
        assert got == [11, 13, 15, 17, 19]

    # slow (~6 s): million-row scale shape
    @pytest.mark.slow
    def test_million_row_dv_write_and_read(self, spark, tmp_path):
        """Scale pin: a DV covering ~10⁶ positions is written executor-
        side and read back exactly — no driver materialization."""
        n = 1_100_000
        df = spark.range(n).selectExpr("id pkey").coalesce(1)
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / "big"), df, properties=dict(DV_ON)
        )
        before = _file_sig(t)
        t.delete_where("pkey % 1000 != 0")
        assert _file_sig(t) == before
        [add] = [
            a for a in t.snapshot().files.values()
            if a.get("deletionVector")
        ]
        assert int(add["deletionVector"]["cardinality"]) == n - n // 1000
        got = sorted(r["pkey"] for r in t.to_df().collect())
        assert got == list(range(0, n, 1000))


class TestUpdateWithDvs:
    def test_update_dvs_old_rows_writes_new(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "t"), n=20, files=1)
        before = _file_sig(t)
        res = t.update_where("pkey < 3", {"attr": "'updated'"})
        assert res["deletion_vectors"] == 1
        assert res["rewritten_files"] >= 1
        sig = _file_sig(t)
        # the ORIGINAL file is untouched on disk, now read through a DV
        for p, s in before.items():
            assert sig[p] == s
        rows = {r["pkey"]: r["attr"] for r in t.to_df().collect()}
        assert len(rows) == 20
        assert all(rows[k] == "updated" for k in (0, 1, 2))
        assert rows[10] == "v10"

    def test_update_cdf_pre_post_images(self, spark, tmp_path):
        t = _mk(
            spark, str(tmp_path / "c"), n=10, files=1,
            props={"delta.enableChangeDataFeed": "true"},
        )
        v = t.update_where("pkey = 4", {"attr": "'x'"})["version"]
        ch = sorted(
            (r["_change_type"], r["pkey"], r["attr"])
            for r in t.table_changes(v, v).collect()
        )
        assert ch == [
            ("update_postimage", 4, "x"),
            ("update_preimage", 4, "v4"),
        ]


class TestDvCdf:
    def test_delete_cdf_rows_exact(self, spark, tmp_path):
        t = _mk(
            spark, str(tmp_path / "c"), n=10, files=1,
            props={"delta.enableChangeDataFeed": "true"},
        )
        v = t.delete_where("pkey >= 8")["version"]
        ch = sorted(
            (r["_change_type"], r["pkey"])
            for r in t.table_changes(v, v).collect()
        )
        assert ch == [("delete", 8), ("delete", 9)]


class TestDvLifecycle:
    def test_checkpoint_preserves_dv(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "cp"), n=20, files=1)
        t.delete_where("pkey < 4")
        v = t.snapshot().version
        t._write_checkpoint(v)
        # force replay through the checkpoint alone: drop the JSON tail
        for i in range(v + 1):
            f = os.path.join(t.path, "_delta_log", "%020d.json" % i)
            if os.path.exists(f):
                os.unlink(f)
        t2 = DeltaProtocolTable(spark, t.path)
        got = sorted(r["pkey"] for r in t2.to_df().collect())
        assert got == list(range(4, 20))

    def test_restore_across_dv_versions(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "rs"), n=10, files=1)
        t.delete_where("pkey < 5")            # v1: DV
        t.append(
            t.spark.createDataFrame([(100, "z")], "pkey int, attr string")
        )                                      # v2
        t.restore(0)                           # back to the full table
        assert t.to_df().count() == 10
        t.restore(1)                           # DV'd state again
        assert sorted(r["pkey"] for r in t.to_df().collect()) == list(
            range(5, 10)
        )

    def test_vacuum_reclaims_replaced_dv_keeps_live(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "v"), n=20, files=1)
        t.delete_where("pkey = 0")
        [a1] = [
            a for a in t.snapshot().files.values()
            if a.get("deletionVector")
        ]
        old_dv_rel = os.path.relpath(
            _dv_file_path(t.path, a1["deletionVector"]), t.path
        )
        t.delete_where("pkey = 1")  # replaces the DV file
        [a2] = [
            a for a in t.snapshot().files.values()
            if a.get("deletionVector")
        ]
        new_dv_rel = os.path.relpath(
            _dv_file_path(t.path, a2["deletionVector"]), t.path
        )
        reclaimed = t.vacuum(retention_hours=0.0)
        assert old_dv_rel in reclaimed
        assert new_dv_rel not in reclaimed
        assert sorted(r["pkey"] for r in t.to_df().collect()) == list(
            range(2, 20)
        )

    def test_time_travel_across_dv_commits(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "tt"), n=10, files=1)
        t.delete_where("pkey < 2")  # v1
        t.delete_where("pkey < 4")  # v2
        assert t.to_df(version_as_of=0).count() == 10
        assert t.to_df(version_as_of=1).count() == 8
        assert t.to_df(version_as_of=2).count() == 6

    def test_merge_rewrite_drops_dv(self, spark, tmp_path):
        from mack_spark.tables import KeyedMerge

        t = _mk(spark, str(tmp_path / "m"), n=10, files=1)
        t.delete_where("pkey < 2")
        src = t.spark.createDataFrame(
            [(5, "merged")], "pkey int, attr string"
        )
        t.merge(KeyedMerge(
            source=src,
            condition="t.pkey = s.pkey",
            matched_update={"attr": "s.attr"},
            target_key_col="pkey",
            source_key_col="pkey",
        ))
        snap = t.snapshot()
        # the rewrite produced fresh files without DVs
        assert not any(a.get("deletionVector") for a in snap.files.values())
        rows = {r["pkey"]: r["attr"] for r in t.to_df().collect()}
        assert rows[5] == "merged"
        assert sorted(rows) == list(range(2, 10))

    def test_optimize_compacts_dvd_files(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "o"), n=40, files=4)
        t.delete_where("pkey % 2 = 0")
        res = t.optimize(target_file_bytes=1 << 20)
        assert res["rewritten"] >= 2
        snap = t.snapshot()
        assert not any(a.get("deletionVector") for a in snap.files.values())
        got = sorted(r["pkey"] for r in t.to_df().collect())
        assert got == list(range(1, 40, 2))


class TestAppendOnly:
    def test_append_only_blocks_mutations(self, spark, tmp_path):
        df = spark.range(5).selectExpr("cast(id as int) pkey")
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / "ao"), df,
            properties={"delta.appendOnly": "true"},
        )
        with pytest.raises(DeltaProtocolError, match="append-only"):
            t.delete_where("pkey = 1")
        with pytest.raises(DeltaProtocolError, match="append-only"):
            t.update_where("pkey = 1", {"pkey": "2"})
        with pytest.raises(DeltaProtocolError, match="append-only"):
            t.overwrite(df)
        # appends still fine
        t.append(spark.createDataFrame([(9,)], "pkey int"))
        assert t.to_df().count() == 6
