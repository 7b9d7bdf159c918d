"""Round-12 regression tests for the five ADVICE-r11 findings:

1. (medium) Change-data files on COLUMN-MAPPED tables are keyed by
   ``physicalName`` (+ parquet field ids), exactly like data files —
   the Delta spec's rule, what delta-spark writes and expects. Before
   the fix this writer emitted LOGICAL names (unreadable by
   delta-spark on a mapped table) and ``table_changes`` read foreign
   mapped cdc with a logical-named explicit schema (silently
   NULL-filling every data column).
2. (low) In-commit-timestamp stamping derives "is ICT on" from the
   commit's own metaData or the caller's SNAPSHOT configuration —
   never from sniffing the previous commit's first JSON line, so a
   previous commit whose commitInfo is not the first line (spec
   allows any order) no longer silently disables ICT; the monotonic
   floor scan also reads every line.
3. (low) ``version_at_timestamp`` monotonizes out-of-order advisory
   commit timestamps while scanning (``eff_v = max(raw_v,
   eff_{v-1})``), matching Delta's history-manager adjustment, so
   TIMESTAMP AS OF on a clock-skewed foreign log resolves to the same
   version delta-spark picks.
4. (low) Files re-added under a deletion vector rewrite their stats
   with ``"tightBounds": false`` (min/max/nullCount describe physical
   rows, some now deleted) — delta-spark's marker that data-skipping
   bounds are wide.
5. (low) Reading an id-mode table no longer mutates the caller's
   session: ``spark.sql.parquet.fieldId.read.enabled`` is scoped to a
   cached ``newSession()`` clone whose conf the parquet relation
   captures at creation.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from mack_spark.sources.delta_log import (
    DeltaProtocolError,
    DeltaProtocolTable,
    _field_id_session,
)
from tests.test_column_mapping_rw import _mk_id_mode, _mk_name_mode_rw


def _mk_mapped_cdf(spark, tmp_path):
    """Name-mode mapped table with CDF enabled (writer 5 covers both)."""
    t, phys = _mk_name_mode_rw(spark, tmp_path)
    t.set_properties({"delta.enableChangeDataFeed": "true"})
    return t, phys


class TestMappedCdc:
    def test_cdc_files_written_physical(self, spark, tmp_path):
        """The cdc parquet's columns carry PHYSICAL names + field ids;
        _change_type keeps its literal name (CDF metadata, unmapped)."""
        import pyarrow.parquet as pq

        t, phys = _mk_mapped_cdf(spark, tmp_path)
        t.delete_where("k = 1")
        cdir = os.path.join(t.path, "_change_data")
        files = [f for f in os.listdir(cdir) if f.endswith(".parquet")]
        assert files, "delete on a CDF table must write change data"
        sch = pq.ParquetFile(os.path.join(cdir, files[0])).schema_arrow
        assert set(sch.names) == {
            phys["k"], phys["v"], phys["p"], "_change_type"
        }
        fld = sch.field(phys["k"])
        assert fld.metadata and b"PARQUET:field_id" in fld.metadata

    def test_table_changes_roundtrip_on_mapped(self, spark, tmp_path):
        """table_changes on the mapped table surfaces LOGICAL columns
        with real values — the pre-fix bug NULL-filled every column."""
        t, _ = _mk_mapped_cdf(spark, tmp_path)
        v_del = t.snapshot().version + 1
        t.delete_where("k = 1")
        t.update_where("k = 2", {"v": "'updated'"})
        ch = t.table_changes(v_del).orderBy("_commit_version", "k")
        rows = [
            (r["k"], r["v"], r["_change_type"]) for r in ch.collect()
        ]
        assert (1, "x", "delete") in rows
        assert (2, "y", "update_preimage") in rows
        assert (2, "updated", "update_postimage") in rows
        assert all(k is not None and v is not None for k, v, _ in rows)

    def test_table_changes_foreign_id_mode_cdc(self, spark, tmp_path):
        """Foreign id-mode table whose cdc file uses arbitrary physical
        names — resolution must go by parquet field id."""
        from pyspark.sql.types import (
            IntegerType,
            StringType,
            StructField,
            StructType,
        )

        t = _mk_id_mode(spark, tmp_path)
        # enable CDF in the foreign log (rewrite metaData via a new commit)
        snap = t.snapshot()
        meta = dict(
            snap.metadata,
            configuration=dict(
                snap.metadata.get("configuration") or {},
                **{"delta.enableChangeDataFeed": "true"},
            ),
        )
        cdir = os.path.join(t.path, "_change_data")
        os.makedirs(cdir, exist_ok=True)
        cdc_schema = StructType([
            StructField("ice_1", IntegerType(), True,
                        {"parquet.field.id": 1}),
            StructField("ice_2", StringType(), True,
                        {"parquet.field.id": 2}),
            StructField("_change_type", StringType(), True),
        ])
        spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
        spark.createDataFrame(
            [(2, "y", "delete")], cdc_schema
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(t.path, "_cdc_staging")
        )
        src = next(
            f for f in os.listdir(os.path.join(t.path, "_cdc_staging"))
            if f.endswith(".parquet")
        )
        os.rename(
            os.path.join(t.path, "_cdc_staging", src),
            os.path.join(cdir, src),
        )
        actions = [
            {"commitInfo": {"timestamp": 1000, "operation": "DELETE"}},
            {"metaData": meta},
            {"cdc": {"path": f"_change_data/{src}",
                     "partitionValues": {}, "size": 1,
                     "dataChange": False}},
        ]
        with open(
            os.path.join(t.path, "_delta_log", "%020d.json" % 1), "w"
        ) as fh:
            fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
        rows = t.table_changes(1).collect()
        assert [(r["k"], r["v"], r["_change_type"]) for r in rows] == [
            (2, "y", "delete")
        ]


def _doctor_commit_ts(path, version, new_ts):
    f = os.path.join(path, "_delta_log", "%020d.json" % version)
    lines = [json.loads(x) for x in open(f) if x.strip()]
    for a in lines:
        if "commitInfo" in a:
            a["commitInfo"]["timestamp"] = new_ts
            a["commitInfo"].pop("inCommitTimestamp", None)
    with open(f, "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in lines) + "\n")


class TestIctRobustness:
    def _mk_ict(self, spark, tmp_path):
        return DeltaProtocolTable.create(
            spark,
            str(tmp_path / "ict"),
            spark.createDataFrame([(1,)], "k int"),
            properties={"delta.enableInCommitTimestamps": "true"},
        )

    def test_commitinfo_not_first_line_keeps_ict(self, spark, tmp_path):
        """Reorder the previous commit so commitInfo is the LAST line:
        the next commit must still carry a monotonic ICT (pre-fix, the
        probe broke on the first line and disabled stamping)."""
        t = self._mk_ict(spark, tmp_path)
        t.append(spark.createDataFrame([(2,)], "k int"))
        f = os.path.join(t.path, "_delta_log", "%020d.json" % 1)
        lines = [json.loads(x) for x in open(f) if x.strip()]
        assert "commitInfo" in lines[0]
        prev_ict = lines[0]["commitInfo"]["inCommitTimestamp"]
        with open(f, "w") as fh:
            fh.write("\n".join(
                json.dumps(a) for a in lines[1:] + [lines[0]]
            ) + "\n")
        t.append(spark.createDataFrame([(3,)], "k int"))
        acts = [json.loads(x) for x in open(
            os.path.join(t.path, "_delta_log", "%020d.json" % 2)
        ) if x.strip()]
        ci = next(a["commitInfo"] for a in acts if "commitInfo" in a)
        assert ci.get("inCommitTimestamp", 0) > prev_ict

    def test_metadata_less_commit_after_missing_prev_ict(
        self, spark, tmp_path
    ):
        """Strip the previous commit's ICT entirely: the snapshot's
        configuration still says ICT is on, so the next commit stamps
        one (pre-fix: prev_ict=None silently disabled it)."""
        t = self._mk_ict(spark, tmp_path)
        t.append(spark.createDataFrame([(2,)], "k int"))
        _doctor_commit_ts(t.path, 1, 1234)  # also drops inCommitTimestamp
        t.append(spark.createDataFrame([(3,)], "k int"))
        acts = [json.loads(x) for x in open(
            os.path.join(t.path, "_delta_log", "%020d.json" % 2)
        ) if x.strip()]
        ci = next(a["commitInfo"] for a in acts if "commitInfo" in a)
        assert "inCommitTimestamp" in ci


class TestTimestampMonotonized:
    def test_out_of_order_commit_times(self, spark, tmp_path):
        """raw times 1000, 500, 2000 → effective 1000, 1000, 2000
        (Delta's adjustment): ts=700 is before every effective commit
        (raises); ts=1000 resolves to v1, not v0; ts=1500 → v1."""
        path = str(tmp_path / "skewed")
        t = DeltaProtocolTable.create(
            spark, path, spark.createDataFrame([(0,)], "k int")
        )
        t.append(spark.createDataFrame([(1,)], "k int"))
        t.append(spark.createDataFrame([(2,)], "k int"))
        for v, ts in ((0, 1000), (1, 500), (2, 2000)):
            _doctor_commit_ts(path, v, ts)
        with pytest.raises(DeltaProtocolError, match="before the earliest"):
            t.version_at_timestamp(700)
        assert t.version_at_timestamp(1000) == 1
        assert t.version_at_timestamp(1500) == 1
        assert t.version_at_timestamp(2000) == 2


class TestDvTightBounds:
    def test_dv_add_marks_wide_bounds(self, spark, tmp_path):
        path = str(tmp_path / "dvtb")
        t = DeltaProtocolTable.create(
            spark, path,
            spark.range(100).selectExpr("cast(id as int) k").coalesce(1),
            properties={"delta.enableDeletionVectors": "true"},
        )
        t.delete_where("k < 10")
        snap = t.snapshot()
        dv_adds = [
            a for a in snap.files.values() if a.get("deletionVector")
        ]
        assert dv_adds, "delete under DVs must re-add the touched file"
        st = json.loads(dv_adds[0]["stats"])
        assert st.get("tightBounds") is False
        assert st["numRecords"] == 100  # physical rows, per the spec


class TestFieldIdFlagScoped:
    def test_main_session_conf_untouched(self, spark, tmp_path):
        spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "false")
        t = _mk_id_mode(spark, tmp_path)
        assert sorted(map(tuple, t.to_df().collect())) == [
            (1, "x"), (2, "y")
        ]
        assert (
            spark.conf.get("spark.sql.parquet.fieldId.read.enabled")
            == "false"
        )
        # the clone is cached (one newSession per real session, not per read)
        assert _field_id_session(spark) is _field_id_session(spark)
