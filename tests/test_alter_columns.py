"""ALTER TABLE schema evolution without file rewrites (round 11):
RENAME/DROP COLUMN ride column mapping (auto-enabled, metadata-only —
the reason Databricks runtimes flip tables to name mapping), ADD COLUMN
NULL-fills history on any table.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from mack_spark.sources.delta_log import (
    DeltaProtocolError,
    DeltaProtocolTable,
)


def _mk(spark, tmp_path, **kw):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "pkey int, attr string, val double"
    )
    return DeltaProtocolTable.create(spark, str(tmp_path / "t"), df, **kw)


def _sig(t):
    return {
        p: os.stat(os.path.join(t.path, p)).st_ino
        for p in t.snapshot().files
    }


class TestEnableColumnMapping:
    def test_enable_is_metadata_only(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        before = _sig(t)
        t.enable_column_mapping()
        assert _sig(t) == before  # no file rewritten
        snap = t.snapshot()
        assert snap.column_mapping_mode == "name"
        assert snap.protocol["minReaderVersion"] >= 2
        assert snap.protocol["minWriterVersion"] >= 5
        # physical names = original names → old files keep resolving
        assert snap.physical_names() == {
            "pkey": "pkey", "attr": "attr", "val": "val"
        }
        assert sorted(map(tuple, t.to_df().collect())) == [
            (1, "a", 1.5), (2, "b", 2.5)
        ]
        t.enable_column_mapping()  # idempotent
        assert t.snapshot().version == snap.version

    def test_enable_on_features_log_declares_feature(self, spark, tmp_path):
        t = _mk(
            spark, tmp_path,
            properties={"delta.enableInCommitTimestamps": "true"},
        )
        assert t.snapshot().protocol["minWriterVersion"] == 7
        t.enable_column_mapping()
        proto = t.snapshot().protocol
        assert "columnMapping" in proto["readerFeatures"]
        assert "columnMapping" in proto["writerFeatures"]


class TestRenameColumn:
    def test_rename_no_rewrite_roundtrip(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        before = _sig(t)
        t.rename_column("attr", "label")
        assert _sig(t) == before
        df = t.to_df()
        assert df.columns == ["pkey", "label", "val"]
        assert sorted(map(tuple, df.collect())) == [
            (1, "a", 1.5), (2, "b", 2.5)
        ]
        # appends under the NEW logical name land in the old physical
        t.append(spark.createDataFrame(
            [(3, "c", 3.5)], "pkey int, label string, val double"
        ))
        assert t.to_df().where("label = 'c'").count() == 1
        # merges and deletes still work post-rename
        t.delete_where("label = 'a'")
        assert sorted(r["label"] for r in t.to_df().collect()) == ["b", "c"]

    def test_rename_partition_column(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(1, "x", "p1"), (2, "y", "p2")], "pkey int, v string, p string"
        )
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / "p"), df, partition_by=["p"]
        )
        t.rename_column("p", "part")
        snap = t.snapshot()
        assert snap.partition_columns == ["part"]
        got = sorted(map(tuple, t.to_df().collect()))
        assert got == [(1, "x", "p1"), (2, "y", "p2")]

    def test_rename_conflicts_and_references(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        with pytest.raises(ValueError, match="already exists"):
            t.rename_column("attr", "pkey")
        with pytest.raises(ValueError, match="no such column"):
            t.rename_column("ghost", "x")
        t.add_constraint("positive", "val > 0")
        with pytest.raises(DeltaProtocolError, match="constraint"):
            t.rename_column("val", "value")
        # unreferenced columns still rename fine
        t.rename_column("attr", "label")
        assert "label" in t.to_df().columns


class TestDropColumn:
    def test_drop_is_metadata_only(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        before = _sig(t)
        t.drop_column("attr")
        assert _sig(t) == before
        df = t.to_df()
        assert df.columns == ["pkey", "val"]
        assert sorted(map(tuple, df.collect())) == [(1, 1.5), (2, 2.5)]
        # time travel still sees the dropped column pre-drop
        old = t.to_df(version_as_of=0)
        assert "attr" in old.columns

    def test_drop_guards(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(1, "x", "p1")], "pkey int, v string, p string"
        )
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / "p"), df, partition_by=["p"]
        )
        with pytest.raises(DeltaProtocolError, match="partition"):
            t.drop_column("p")


class TestAddColumn:
    def test_add_column_null_fills_history(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        t.add_column("note", "string")
        df = t.to_df()
        assert df.columns == ["pkey", "attr", "val", "note"]
        assert all(r["note"] is None for r in df.collect())
        t.append(spark.createDataFrame(
            [(3, "c", 3.5, "hello")],
            "pkey int, attr string, val double, note string",
        ))
        rows = {r["pkey"]: r["note"] for r in t.to_df().collect()}
        assert rows == {1: None, 2: None, 3: "hello"}

    def test_add_column_on_mapped_table_gets_fresh_physical(
        self, spark, tmp_path
    ):
        t = _mk(spark, tmp_path)
        t.rename_column("attr", "label")  # enables mapping
        t.add_column("note", "string")
        snap = t.snapshot()
        phys = snap.physical_names()
        assert phys["note"].startswith("col-")
        cfg = snap.metadata["configuration"]
        assert cfg["delta.columnMapping.maxColumnId"] == "4"
        # add-then-rename composes: the fresh column renames too
        t.rename_column("note", "comment")
        t.append(spark.createDataFrame(
            [(3, "c", 3.5, "hi")],
            "pkey int, label string, val double, comment string",
        ))
        rows = {r["pkey"]: r["comment"] for r in t.to_df().collect()}
        assert rows == {1: None, 2: None, 3: "hi"}

    def test_add_existing_refuses(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        with pytest.raises(ValueError, match="already exists"):
            t.add_column("attr", "string")


class TestAlterComposesWithInterop:
    def test_rename_then_dv_delete(self, spark, tmp_path):
        """The full stack composes: rename (mapping) + DV writes. The
        table is ONE multi-row file so the delete is partial (a
        single-row file would take the full-file-delete remove path)."""
        df = spark.createDataFrame(
            [(i, f"a{i}", float(i)) for i in range(10)],
            "pkey int, attr string, val double",
        ).coalesce(1)
        t = DeltaProtocolTable.create(spark, str(tmp_path / "t"), df)
        t.rename_column("attr", "label")
        t.set_properties({"delta.enableDeletionVectors": "true"})
        before = _sig(t)
        res = t.delete_where("label = 'a0'")
        assert res["rewritten_files"] == 0
        assert res["deletion_vectors"] == 1
        assert _sig(t) == before
        got = sorted(r["label"] for r in t.to_df().collect())
        assert got == [f"a{i}" for i in range(1, 10)]

    def test_checkpoint_roundtrip_after_alter(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        t.rename_column("attr", "label")
        t.drop_column("val")
        v = t.snapshot().version
        t._write_checkpoint(v)
        for i in range(v + 1):
            f = os.path.join(t.path, "_delta_log", "%020d.json" % i)
            if os.path.exists(f):
                os.unlink(f)
        t2 = DeltaProtocolTable(spark, t.path)
        assert t2.to_df().columns == ["pkey", "label"]
        assert sorted(map(tuple, t2.to_df().collect())) == [
            (1, "a"), (2, "b")
        ]
