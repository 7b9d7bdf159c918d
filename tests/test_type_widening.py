"""Round-14: the typeWidening table feature (Delta spec §Type
Widening) — ``alter_column_type`` commits a METADATA-ONLY widen: the
schema field takes the wider type, ``delta.typeChanges`` records the
change, the protocol declares the reader+writer feature, and NO data
file is rewritten. Files written before the widen keep their narrower
physical parquet type; scans upcast them to the snapshot schema
(Spark's parquet reader does int→long/double/decimal, float→double,
date→timestamp_ntz, and decimal growth natively — probed in this
round). delta-spark 4.x exposes the same surface as ``ALTER TABLE ...
ALTER COLUMN ... TYPE``; the SQL front-end form is tested here too."""

import datetime as dt
import json
import os

import pytest

from mack_spark.sources.delta_log import (
    DeltaProtocolError,
    DeltaProtocolTable,
)

SCHEMA = "pkey int, qty int, price float, d date"


def _mk(spark, tmp_path, name="t", **kw):
    df = spark.createDataFrame(
        [(i, i * 2, float(i) + 0.5, dt.date(2020, 1, 1 + i))
         for i in range(5)],
        SCHEMA,
    )
    return DeltaProtocolTable.create(spark, str(tmp_path / name), df, **kw)


class TestWidenMatrix:
    ALLOWED = [
        ("byte", "short"), ("byte", "integer"), ("byte", "long"),
        ("short", "integer"), ("short", "long"), ("integer", "long"),
        ("float", "double"), ("date", "timestamp_ntz"),
        ("byte", "double"), ("short", "double"), ("integer", "double"),
        ("byte", "decimal(3,0)"), ("short", "decimal(5,0)"),
        ("integer", "decimal(10,0)"), ("integer", "decimal(14,4)"),
        ("long", "decimal(20,0)"), ("long", "decimal(24,4)"),
        ("decimal(5,2)", "decimal(7,2)"),
        ("decimal(5,2)", "decimal(9,4)"),
    ]
    REFUSED = [
        ("long", "integer"), ("integer", "short"), ("double", "float"),
        ("long", "double"),          # loses precision above 2^53
        ("float", "decimal(20,10)"),  # binary fp → decimal not exact
        ("integer", "decimal(9,0)"),  # 9 digits can't hold 2^31
        ("integer", "decimal(12,3)"),  # 12-3=9 integral digits < 10
        ("long", "decimal(19,0)"),
        ("decimal(5,2)", "decimal(5,1)"),   # scale shrink
        ("decimal(5,2)", "decimal(6,4)"),   # integral digits shrink
        ("decimal(5,2)", "decimal(5,2)"),   # no-op
        ("integer", "string"), ("string", "long"),
        ("timestamp_ntz", "date"), ("integer", "float"),
    ]

    @pytest.mark.parametrize("ft,tt", ALLOWED)
    def test_allowed(self, ft, tt):
        assert DeltaProtocolTable._is_type_widening(ft, tt)

    @pytest.mark.parametrize("ft,tt", REFUSED)
    def test_refused(self, ft, tt):
        assert not DeltaProtocolTable._is_type_widening(ft, tt)


class TestWidenCommit:
    def test_int_to_long_metadata_and_protocol(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        files_before = set(t.snapshot().files)
        t.alter_column_type("qty", "bigint")
        snap = t.snapshot()
        # metadata-only: same data files
        assert set(snap.files) == files_before
        f = [x for x in snap.schema.fields if x.name == "qty"][0]
        assert f.dataType.simpleString() == "bigint"
        changes = (f.metadata or {})["delta.typeChanges"]
        assert changes == [
            {"fromType": "integer", "toType": "long", "tableVersion": 1}
        ]
        proto = snap.protocol
        assert "typeWidening" in proto["readerFeatures"]
        assert "typeWidening" in proto["writerFeatures"]
        assert proto["minReaderVersion"] == 3

    def test_old_files_upcast_at_read(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        t.alter_column_type("qty", "bigint")
        t.alter_column_type("price", "double")
        # new write carries the WIDE physical type; old files stay narrow
        t.append(spark.createDataFrame(
            [(100, 2**40, 1.25, dt.date(2021, 1, 1))],
            "pkey int, qty bigint, price double, d date",
        ))
        rows = {r["pkey"]: r for r in t.to_df().collect()}
        assert rows[3]["qty"] == 6 and rows[100]["qty"] == 2**40
        assert rows[3]["price"] == pytest.approx(3.5)
        dtypes = dict(t.to_df().dtypes)
        assert dtypes["qty"] == "bigint" and dtypes["price"] == "double"

    def test_second_widen_appends_change_history(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        t.alter_column_type("qty", "bigint")
        t.alter_column_type("qty", "decimal(22,2)")
        f = [x for x in t.snapshot().schema.fields if x.name == "qty"][0]
        kinds = [(c["fromType"], c["toType"], c["tableVersion"])
                 for c in f.metadata["delta.typeChanges"]]
        assert kinds == [
            ("integer", "long", 1), ("long", "decimal(22,2)", 2),
        ]

    def test_date_to_timestamp_ntz_adds_ntz_feature(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        t.alter_column_type("d", "timestamp_ntz")
        snap = t.snapshot()
        assert "timestampNtz" in snap.protocol["readerFeatures"]
        rows = t.to_df().where("pkey = 2").collect()
        assert rows[0]["d"] == dt.datetime(2020, 1, 3, 0, 0)

    def test_mutations_after_widen(self, spark, tmp_path):
        """MERGE-family rewrites read narrow files and write wide ones
        — the post-state keeps both generations readable."""
        t = _mk(spark, tmp_path)
        t.alter_column_type("qty", "bigint")
        t.update_where("pkey = 1", {"qty": "9999999999"})
        rows = {r["pkey"]: r["qty"] for r in t.to_df().collect()}
        assert rows[1] == 9999999999 and rows[0] == 0

    def test_narrow_frame_append_store_assigns(self, spark, tmp_path):
        """After a widen, appending a frame still typed with the OLD
        narrow type upcasts silently (store assignment, the
        value-preserving matrix only) — delta-spark's INSERT behavior."""
        t = _mk(spark, tmp_path)
        t.alter_column_type("qty", "bigint")
        t.append(spark.createDataFrame(
            [(200, 7, 1.0, dt.date(2022, 1, 1))], SCHEMA  # qty still int
        ))
        rows = {r["pkey"]: r["qty"] for r in t.to_df().collect()}
        assert rows[200] == 7
        assert dict(t.to_df().dtypes)["qty"] == "bigint"
        # a NON-widening mismatch still refuses
        with pytest.raises(DeltaProtocolError, match="schema mismatch"):
            t.append(spark.createDataFrame(
                [(201, "x", 1.0, dt.date(2022, 1, 1))],
                "pkey int, qty string, price float, d date",
            ))

    def test_time_travel_sees_narrow_schema(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        t.alter_column_type("qty", "bigint")
        assert dict(t.to_df(version_as_of=0).dtypes)["qty"] == "int"
        assert dict(t.to_df().dtypes)["qty"] == "bigint"

    def test_checkpoint_roundtrip(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        t.alter_column_type("qty", "bigint")
        t.checkpoint()
        from mack_spark.sources.delta_log import clear_replay_cache

        clear_replay_cache(t.path)
        t2 = DeltaProtocolTable(spark, t.path)
        f = [x for x in t2.snapshot().schema.fields if x.name == "qty"][0]
        assert f.metadata["delta.typeChanges"][0]["toType"] == "long"
        assert t2.to_df().count() == 5


class TestWidenRefusals:
    def test_narrowing_refused(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        with pytest.raises(DeltaProtocolError, match="not a supported"):
            t.alter_column_type("qty", "smallint")

    def test_partition_column_refused(self, spark, tmp_path):
        df = spark.createDataFrame([(1, 2)], "a int, b int")
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / "p"), df, partition_by=["b"]
        )
        with pytest.raises(DeltaProtocolError, match="partition"):
            t.alter_column_type("b", "bigint")

    def test_constraint_referenced_refused(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        t.add_constraint("qpos", "qty >= 0")
        with pytest.raises(DeltaProtocolError, match="CHECK constraint"):
            t.alter_column_type("qty", "bigint")

    def test_identity_refused(self, spark, tmp_path):
        df = spark.createDataFrame([(1,)], "v int")
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / "i"), df,
            identity={"id": {"start": 1, "step": 1}},
        )
        with pytest.raises(DeltaProtocolError, match="identity"):
            t.alter_column_type("id", "decimal(22,0)")

    def test_missing_and_nested_refused(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        with pytest.raises(DeltaProtocolError, match="no column"):
            t.alter_column_type("nope", "bigint")
        with pytest.raises(DeltaProtocolError, match="nested"):
            t.alter_column_type("a.b", "bigint")


class TestWidenForeignAndSql:
    def test_preview_feature_name_readable(self, spark, tmp_path):
        """A log declaring delta-spark 3.x's typeWidening-preview must
        read fine."""
        t = _mk(spark, tmp_path)
        t.alter_column_type("qty", "bigint")
        # rewrite the protocol action of the widen commit to the
        # preview name, as a 3.x writer would have produced
        vf = os.path.join(t.path, "_delta_log", "%020d.json" % 1)
        lines = [json.loads(x) for x in open(vf)]
        for a in lines:
            if "protocol" in a:
                a["protocol"]["readerFeatures"] = [
                    "typeWidening-preview"
                    if f == "typeWidening" else f
                    for f in a["protocol"]["readerFeatures"]
                ]
                a["protocol"]["writerFeatures"] = [
                    "typeWidening-preview"
                    if f == "typeWidening" else f
                    for f in a["protocol"]["writerFeatures"]
                ]
        with open(vf, "w") as fh:
            fh.writelines(json.dumps(a) + "\n" for a in lines)
        from mack_spark.sources.delta_log import clear_replay_cache

        clear_replay_cache(t.path)
        t2 = DeltaProtocolTable(spark, t.path)
        assert t2.to_df().count() == 5

    def test_sql_alter_column_type(self, spark, tmp_path):
        from mack_spark.sql_ddl import DeltaSqlSession

        t = _mk(spark, tmp_path)
        sq = DeltaSqlSession(spark, {"tbl": t})
        res = sq.sql("ALTER TABLE tbl ALTER COLUMN qty TYPE bigint")
        assert res.collect()[0]["version"] == 1
        assert dict(t.to_df().dtypes)["qty"] == "bigint"
        # decimal with parens parses through the statement tail
        sq.sql("ALTER TABLE tbl CHANGE COLUMN qty TYPE decimal(22,2)")
        assert dict(t.to_df().dtypes)["qty"] == "decimal(22,2)"
