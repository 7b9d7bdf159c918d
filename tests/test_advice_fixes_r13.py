"""Round-13 regression tests for the five ADVICE-r12 findings:

1. (medium) ``table_changes`` verifies every version in the requested
   range still has its commit JSON and raises when metadata cleanup
   removed part of the range — before the fix it silently replayed the
   surviving suffix, returning an INCOMPLETE change feed (delta-spark
   raises when the start version is no longer available).
2. (low) ``cleanup_metadata`` deletes commit JSONs only as a
   CONTIGUOUS PREFIX (delta-spark's BufferingLogDeletionIterator
   rule), so non-monotonic mtimes (restored/copied tables) can no
   longer delete a MIDDLE version while older ones survive; and
   ``snapshot()`` raises on a replayed version-sequence GAP instead of
   silently reconstructing wrong time-travel state.
3. (low) Rewrites on row-tracked tables MATERIALIZE row ids (spec
   §Row Tracking): OPTIMIZE / REORG / UPDATE / DELETE rewrites and
   rewriting MERGEs persist each surviving row's ``_row_id`` into the
   table's ``delta.rowTracking.materializedRowIdColumnName`` column,
   so ids are stable where the old writer handed out fresh ones.
4. (low) V2 checkpoint sidecars carry BOTH ``add`` and ``remove``
   columns (spec §V2 Spec Checkpoints file-action schema); remove is
   all-null (this writer never checkpoints tombstones) but present
   for foreign v2 readers that validate the shape.
5. (low) Batch ``table_changes`` with a ``starting_timestamp`` after
   the last commit raises (delta-spark's batch CDF rule) instead of
   returning a silently empty feed; streaming keeps the wait-for-
   future-commits semantics via ``first_version_at_or_after``.
"""

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from mack_spark.sources import delta_log as dl
from mack_spark.sources.delta_log import (
    DeltaProtocolError,
    DeltaProtocolTable,
    clear_replay_cache,
)


def _mk(spark, tmp_path, name="t", props=None, n=6):
    df = spark.createDataFrame(
        [(i, f"r{i}") for i in range(n)], "pkey int, attr string"
    )
    return DeltaProtocolTable.create(
        spark, str(tmp_path / name), df, properties=props or {}
    )


def _age(path, hours=100):
    old = time.time() - hours * 3600
    os.utime(path, (old, old))


class TestCdfCleanedRange:
    def _cleaned_table(self, spark, tmp_path):
        """CDF table whose early commit JSONs are gone below a
        checkpoint (what cleanup_metadata produces)."""
        t = _mk(spark, tmp_path,
                props={"delta.enableChangeDataFeed": "true"})
        for i in range(3):
            t.append(spark.createDataFrame(
                [(100 + i, "x")], "pkey int, attr string"
            ))
        t.checkpoint()
        logdir = os.path.join(t.path, "_delta_log")
        for v in (0, 1):
            os.unlink(os.path.join(logdir, "%020d.json" % v))
        clear_replay_cache(t.path)
        return t

    def test_cleaned_range_raises(self, spark, tmp_path):
        t = self._cleaned_table(spark, tmp_path)
        with pytest.raises(DeltaProtocolError, match="incomplete"):
            t.table_changes(starting_version=0)
        with pytest.raises(DeltaProtocolError, match="incomplete"):
            t.table_changes(starting_version=1, ending_version=3)

    def test_surviving_range_still_reads(self, spark, tmp_path):
        t = self._cleaned_table(spark, tmp_path)
        df = t.table_changes(starting_version=2)
        assert df.count() == 2  # commits 2 and 3, one insert each
        assert set(
            r["_commit_version"] for r in df.collect()
        ) == {2, 3}


class TestCdfFutureTimestamp:
    def test_starting_timestamp_after_head_raises(self, spark, tmp_path):
        t = _mk(spark, tmp_path,
                props={"delta.enableChangeDataFeed": "true"})
        with pytest.raises(DeltaProtocolError, match="after"):
            t.table_changes(
                starting_timestamp=dl._now_ms() + 3_600_000
            )

    def test_past_timestamp_still_works(self, spark, tmp_path):
        t = _mk(spark, tmp_path,
                props={"delta.enableChangeDataFeed": "true"})
        assert t.table_changes(starting_timestamp=0).count() == 6


class TestCleanupPrefixOnly:
    def test_middle_version_survives_when_older_is_fresh(
        self, spark, tmp_path
    ):
        """Non-monotonic mtimes: v1 fresh, v2 old. Per-file expiry
        would delete v2 and keep v1 — a hole. Prefix rule: neither
        goes (the prefix stops at non-expired v0/v1)."""
        t = _mk(spark, tmp_path, props={
            "delta.logRetentionDuration": "interval 1 hours",
        })
        for i in range(4):
            t.append(spark.createDataFrame(
                [(50 + i, "x")], "pkey int, attr string"
            ))
        t.checkpoint()
        logdir = os.path.join(t.path, "_delta_log")
        # v0 old, v1 FRESH (restored-table shape), v2/v3 old
        _age(os.path.join(logdir, "%020d.json" % 0))
        _age(os.path.join(logdir, "%020d.json" % 2))
        _age(os.path.join(logdir, "%020d.json" % 3))
        doomed = t.cleanup_metadata()
        gone_json = [d for d in doomed if d.endswith(".json")]
        assert gone_json == ["%020d.json" % 0], gone_json
        # v2/v3 survived despite being expired — no mid-log hole
        assert os.path.exists(os.path.join(logdir, "%020d.json" % 2))

    def test_contiguous_prefix_deletes(self, spark, tmp_path):
        t = _mk(spark, tmp_path, props={
            "delta.logRetentionDuration": "interval 1 hours",
        })
        for i in range(3):
            t.append(spark.createDataFrame(
                [(50 + i, "x")], "pkey int, attr string"
            ))
        t.checkpoint()
        logdir = os.path.join(t.path, "_delta_log")
        for v in range(3):  # 0..2 old; head (3) stays fresh
            _age(os.path.join(logdir, "%020d.json" % v))
        gone = [d for d in t.cleanup_metadata() if d.endswith(".json")]
        assert gone == ["%020d.json" % v for v in range(3)]
        clear_replay_cache(t.path)
        assert t.to_df().count() == 9  # checkpoint replay intact


class TestSnapshotGapCheck:
    def test_missing_middle_version_raises(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        for i in range(3):
            t.append(spark.createDataFrame(
                [(50 + i, "x")], "pkey int, attr string"
            ))
        os.unlink(os.path.join(
            t.path, "_delta_log", "%020d.json" % 1
        ))
        clear_replay_cache(t.path)
        with pytest.raises(DeltaProtocolError, match="missing commit"):
            t.snapshot()

    def test_time_travel_below_cleaned_prefix_raises(
        self, spark, tmp_path
    ):
        t = _mk(spark, tmp_path)
        for i in range(3):
            t.append(spark.createDataFrame(
                [(50 + i, "x")], "pkey int, attr string"
            ))
        t.checkpoint()
        os.unlink(os.path.join(
            t.path, "_delta_log", "%020d.json" % 0
        ))
        clear_replay_cache(t.path)
        # latest still reads (checkpoint covers it)
        assert t.to_df().count() == 9
        # time travel below the cleaned prefix fails LOUDLY
        with pytest.raises(DeltaProtocolError, match="missing commit"):
            t.snapshot(version_as_of=1)


class TestV2SidecarShape:
    def test_sidecar_has_add_and_remove_columns(self, spark, tmp_path):
        import pyarrow.parquet as pq

        t = _mk(spark, tmp_path,
                props={"delta.checkpointPolicy": "v2"})
        t.append(spark.createDataFrame(
            [(50, "x")], "pkey int, attr string"
        ))
        t.checkpoint()
        sdir = os.path.join(t.path, "_delta_log", "_sidecars")
        scs = [f for f in os.listdir(sdir) if f.endswith(".parquet")]
        assert scs
        tbl = pq.read_table(os.path.join(sdir, scs[0]))
        assert {"add", "remove"} <= set(tbl.schema.names)
        # remove is all-null, add is not
        assert tbl.column("remove").null_count == len(tbl)
        assert tbl.column("add").null_count == 0
        # and the reader still replays through it
        clear_replay_cache(t.path)
        assert DeltaProtocolTable(spark, t.path).to_df().count() == 7


class TestMaterializedRowIds:
    def _rt(self, spark, tmp_path, name="rt", props=None, n=40):
        p = dict(props or {})
        p["delta.enableRowTracking"] = "true"
        df = spark.createDataFrame(
            [(i, f"r{i}") for i in range(n)], "pkey int, attr string"
        ).repartition(4)
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / name), df, properties=p
        )
        for i in range(2):
            t.append(spark.createDataFrame(
                [(100 + i, "a")], "pkey int, attr string"
            ))
        return t

    @staticmethod
    def _ids(t):
        return {
            r["pkey"]: (r["_row_id"], r["_row_commit_version"])
            for r in t.to_df(with_row_ids=True).collect()
        }

    def test_config_names_fixed_at_create(self, spark, tmp_path):
        t = self._rt(spark, tmp_path)
        cfg = t.snapshot().metadata["configuration"]
        assert cfg[
            "delta.rowTracking.materializedRowIdColumnName"
        ].startswith("_row-id-col-")
        assert cfg[
            "delta.rowTracking.materializedRowCommitVersionColumnName"
        ].startswith("_row-commit-version-col-")

    def test_optimize_preserves_ids_and_commit_versions(
        self, spark, tmp_path
    ):
        t = self._rt(spark, tmp_path)
        before = self._ids(t)
        res = t.optimize(target_file_bytes=1 << 20)
        assert res["rewritten"] > 0
        assert self._ids(t) == before

    def test_materialized_column_physically_written(
        self, spark, tmp_path
    ):
        import pyarrow.parquet as pq

        t = self._rt(spark, tmp_path)
        t.optimize(target_file_bytes=1 << 20)
        snap = t.snapshot()
        mid, mcv = DeltaProtocolTable._row_tracking_phys_cols(snap)
        newest = max(
            snap.files.values(),
            key=lambda a: a.get("defaultRowCommitVersion") or 0,
        )
        cols = set(pq.read_schema(
            os.path.join(t.path, newest["path"])
        ).names)
        assert mid in cols and mcv in cols
        # footer stats do NOT index the hidden materialized columns
        st = json.loads(newest["stats"])
        assert mid not in (st.get("minValues") or {})

    def test_delete_rewrite_preserves_survivors(self, spark, tmp_path):
        t = self._rt(spark, tmp_path)
        before = self._ids(t)
        t.delete_where("pkey % 4 = 0")
        after = self._ids(t)
        assert set(after) == {k for k in before if k % 4 != 0}
        assert all(after[k] == before[k] for k in after)

    def test_update_rewrite_preserves_id_bumps_commit_version(
        self, spark, tmp_path
    ):
        t = self._rt(spark, tmp_path)
        before = self._ids(t)
        t.update_where("pkey = 3", {"attr": "'changed'"})
        after = self._ids(t)
        assert after[3][0] == before[3][0]
        assert after[3][1] > before[3][1]
        assert all(
            after[k] == before[k] for k in after if k != 3
        )

    def test_merge_preserves_kept_and_updated_ids(
        self, spark, tmp_path
    ):
        from mack_spark.tables import KeyedMerge

        t = self._rt(spark, tmp_path)
        before = self._ids(t)
        src = spark.createDataFrame(
            [(3, "upd"), (999, "new")], "pkey int, attr string"
        )
        t.merge(KeyedMerge(
            source=src, condition="t.pkey = s.pkey",
            target_alias="t", source_alias="s",
            matched_update={"attr": "s.attr"},
            not_matched_insert="*",
            target_key_col="pkey", source_key_col="pkey",
        ))
        after = self._ids(t)
        # updated row keeps its id, takes the merge commit's version
        assert after[3][0] == before[3][0]
        assert after[3][1] > before[3][1]
        # kept rows unchanged, inserted row got a FRESH id
        assert all(after[k] == before[k] for k in before if k != 3)
        assert after[999][0] not in {v[0] for v in before.values()}
        rows = t.to_df().where("pkey = 3").collect()
        assert rows[0]["attr"] == "upd"

    def test_reorg_purge_preserves_ids(self, spark, tmp_path):
        t = self._rt(spark, tmp_path,
                     props={"delta.enableDeletionVectors": "true"})
        before = self._ids(t)
        t.delete_where("pkey % 5 = 0")  # DV delete, ids stable
        t.reorg_purge()
        after = self._ids(t)
        assert set(after) == {k for k in before if k % 5 != 0}
        assert all(after[k] == before[k] for k in after)

    def test_row_ids_on_column_mapped_table(self, spark, tmp_path):
        t = self._rt(spark, tmp_path)
        before = self._ids(t)
        t.enable_column_mapping()
        t.rename_column("attr", "label")
        after = {
            r["pkey"]: (r["_row_id"], r["_row_commit_version"])
            for r in t.to_df(with_row_ids=True).collect()
        }
        assert after == before
        # and preservation still works through a mapped OPTIMIZE
        t.optimize(target_file_bytes=1 << 20)
        assert {
            r["pkey"]: (r["_row_id"], r["_row_commit_version"])
            for r in t.to_df(with_row_ids=True).collect()
        } == before


class TestIdentityMerge:
    def _id_table(self, spark, tmp_path, **id_kw):
        df = spark.createDataFrame(
            [(i, f"r{i}") for i in range(10)], "pkey int, attr string"
        )
        return DeltaProtocolTable.create(
            spark, str(tmp_path / "idm"), df,
            identity={"rid": dict({"start": 1, "step": 1}, **id_kw)},
        )

    def test_full_merge_generates_gap_free(self, spark, tmp_path):
        from mack_spark.tables import KeyedMerge

        t = self._id_table(spark, tmp_path)
        src = spark.createDataFrame(
            [(i, "new") for i in range(5, 15)], "pkey int, attr string"
        )
        t.merge(KeyedMerge(
            source=src, condition="t.pkey = s.pkey",
            target_alias="t", source_alias="s",
            matched_update={"attr": "s.attr"},
            not_matched_insert={"pkey": "s.pkey", "attr": "s.attr"},
            target_key_col="pkey", source_key_col="pkey",
        ))
        got = t.to_df().collect()
        assert sorted(r["rid"] for r in got) == list(range(1, 16))
        assert all(
            r["attr"] == "new" for r in got if 5 <= r["pkey"] < 15
        )

    def test_insert_only_merge_generates_and_syncs_hwm(
        self, spark, tmp_path
    ):
        from mack_spark.tables import KeyedMerge

        t = self._id_table(spark, tmp_path)
        src = spark.createDataFrame(
            [(i, "x") for i in range(8, 14)], "pkey int, attr string"
        )
        t.merge(KeyedMerge(
            source=src, condition="t.pkey = s.pkey",
            target_alias="t", source_alias="s",
            not_matched_insert={"pkey": "s.pkey", "attr": "s.attr"},
            target_key_col="pkey", source_key_col="pkey",
        ))
        assert sorted(
            r["rid"] for r in t.to_df().collect()
        ) == list(range(1, 15))
        # hwm landed in the merge commit — the NEXT append continues
        t.append(spark.createDataFrame(
            [(99, "z")], "pkey int, attr string"
        ))
        assert sorted(
            r["rid"] for r in t.to_df().collect()
        ) == list(range(1, 16))

    def test_matched_assignment_refused(self, spark, tmp_path):
        from mack_spark.tables import KeyedMerge

        t = self._id_table(spark, tmp_path)
        src = spark.createDataFrame(
            [(1, "u")], "pkey int, attr string"
        )
        with pytest.raises(DeltaProtocolError, match="identity"):
            t.merge(KeyedMerge(
                source=src, condition="t.pkey = s.pkey",
                target_alias="t", source_alias="s",
                matched_update={"rid": "0", "attr": "s.attr"},
                target_key_col="pkey", source_key_col="pkey",
            ))

    def test_explicit_insert_gate(self, spark, tmp_path):
        from mack_spark.tables import KeyedMerge

        t = self._id_table(spark, tmp_path)  # allowExplicitInsert off
        src = spark.createDataFrame(
            [(50, "x", 777)], "pkey int, attr string, rid long"
        )
        with pytest.raises(DeltaProtocolError, match="GENERATED ALWAYS"):
            t.merge(KeyedMerge(
                source=src, condition="t.pkey = s.pkey",
                target_alias="t", source_alias="s",
                not_matched_insert={
                    "pkey": "s.pkey", "attr": "s.attr", "rid": "s.rid",
                },
                target_key_col="pkey", source_key_col="pkey",
            ))

    def test_explicit_insert_allowed_syncs_hwm(self, spark, tmp_path):
        from mack_spark.tables import KeyedMerge

        t = self._id_table(spark, tmp_path, allow_explicit_insert=True)
        src = spark.createDataFrame(
            [(50, "x", 777)], "pkey int, attr string, rid long"
        )
        t.merge(KeyedMerge(
            source=src, condition="t.pkey = s.pkey",
            target_alias="t", source_alias="s",
            not_matched_insert={
                "pkey": "s.pkey", "attr": "s.attr", "rid": "s.rid",
            },
            target_key_col="pkey", source_key_col="pkey",
        ))
        assert 777 in {r["rid"] for r in t.to_df().collect()}
        t.append(spark.createDataFrame(
            [(99, "z")], "pkey int, attr string"
        ))
        assert 778 in {r["rid"] for r in t.to_df().collect()}


class TestIdentityMergeCdf:
    def test_cdf_insert_rows_carry_generated_ids(self, spark, tmp_path):
        """Review find (r13): merge_changes runs on the patched clause
        set whose insert stages NULL as the generation marker — the
        change feed must still record the GENERATED ids, not the
        marker, or downstream CDF consumers key on NULL."""
        from mack_spark.tables import KeyedMerge

        df = spark.createDataFrame(
            [(i, f"r{i}") for i in range(6)], "pkey int, attr string"
        )
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / "cdfid"), df,
            identity={"rid": {"start": 1, "step": 1}},
            properties={"delta.enableChangeDataFeed": "true"},
        )
        src = spark.createDataFrame(
            [(4, "upd"), (100, "new"), (101, "new")],
            "pkey int, attr string",
        )
        t.merge(KeyedMerge(
            source=src, condition="t.pkey = s.pkey",
            target_alias="t", source_alias="s",
            matched_update={"attr": "s.attr"},
            not_matched_insert={"pkey": "s.pkey", "attr": "s.attr"},
            target_key_col="pkey", source_key_col="pkey",
        ))
        table_ids = {
            r["pkey"]: r["rid"] for r in t.to_df().collect()
        }
        assert sorted(table_ids.values()) == list(range(1, 9))
        changes = t.table_changes(starting_version=1).collect()
        inserts = {
            r["pkey"]: r["rid"] for r in changes
            if r["_change_type"] == "insert"
        }
        assert set(inserts) == {100, 101}
        # the change feed carries the COMMITTED ids, never NULL
        assert inserts == {k: table_ids[k] for k in (100, 101)}
        post = {
            r["pkey"]: r["rid"] for r in changes
            if r["_change_type"] == "update_postimage"
        }
        assert post == {4: table_ids[4]}
