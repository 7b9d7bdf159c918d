"""Identity columns (round 12): Delta writer version 6 / table feature
``identityColumns`` (delta PROTOCOL.md §Identity Columns). Field
metadata ``delta.identity.start`` / ``step`` / ``highWaterMark`` /
``allowExplicitInsert``; omitted values are GENERATED via a gap-free
two-pass assignment (per-partition counts → each partition stamps its
reserved contiguous range, no global sort); the high-water mark commits
atomically with the rows that consumed it. The reference inherits this
from delta-spark (reference pyproject.toml:13-14); mack itself never
creates identity tables, so parity is against the protocol spec."""

import pytest

from mack_spark.sources.delta_log import (
    DeltaProtocolError,
    DeltaProtocolTable,
    _identity_columns,
)


def _mk(spark, tmp_path, n=7, **kw):
    df = spark.createDataFrame(
        [(f"k{i}", i * 1.5) for i in range(n)], "name string, val double"
    ).repartition(3)
    return DeltaProtocolTable.create(
        spark, str(tmp_path / "t"), df,
        identity={"row_id": kw or {"start": 1, "step": 1}},
    )


def _ids(t):
    return sorted(r["row_id"] for r in t.to_df().select("row_id").collect())


class TestIdentityGeneration:
    def test_create_generates_gap_free_ids(self, spark, tmp_path):
        t = _mk(spark, tmp_path, n=7)
        assert _ids(t) == list(range(1, 8))

    def test_protocol_and_metadata(self, spark, tmp_path):
        t = _mk(spark, tmp_path, n=3)
        snap = t.snapshot()
        assert snap.protocol["minWriterVersion"] == 6
        ids = _identity_columns(snap.schema)
        assert ids["row_id"]["start"] == 1
        assert ids["row_id"]["step"] == 1
        assert ids["row_id"]["hwm"] == 3
        assert ids["row_id"]["allow_explicit"] is False

    def test_append_continues_from_high_water_mark(self, spark, tmp_path):
        t = _mk(spark, tmp_path, n=5)
        t.append(spark.createDataFrame(
            [("x", 0.0), ("y", 1.0)], "name string, val double"
        ))
        assert _ids(t) == list(range(1, 8))
        assert _identity_columns(t.snapshot().schema)["row_id"]["hwm"] == 7

    def test_custom_start_step(self, spark, tmp_path):
        t = _mk(spark, tmp_path, n=4, start=100, step=5)
        assert _ids(t) == [100, 105, 110, 115]
        t.append(spark.createDataFrame(
            [("z", 9.9)], "name string, val double"
        ))
        assert max(_ids(t)) == 120

    def test_negative_step(self, spark, tmp_path):
        t = _mk(spark, tmp_path, n=3, start=0, step=-10)
        assert _ids(t) == [-20, -10, 0]
        t.append(spark.createDataFrame(
            [("z", 9.9)], "name string, val double"
        ))
        assert min(_ids(t)) == -30

    def test_overwrite_never_resets_watermark(self, spark, tmp_path):
        t = _mk(spark, tmp_path, n=5)
        t.overwrite(spark.createDataFrame(
            [("o1", 1.0), ("o2", 2.0)], "name string, val double"
        ))
        assert _ids(t) == [6, 7]

    def test_empty_append_keeps_watermark(self, spark, tmp_path):
        t = _mk(spark, tmp_path, n=4)
        empty = spark.createDataFrame([], "name string, val double")
        t.append(empty)
        assert _identity_columns(t.snapshot().schema)["row_id"]["hwm"] == 4
        t.append(spark.createDataFrame(
            [("z", 0.0)], "name string, val double"
        ))
        assert max(_ids(t)) == 5

    def test_ids_unique_across_many_partitions(self, spark, tmp_path):
        df = spark.range(0, 1000).selectExpr(
            "cast(id as string) as name", "cast(id as double) as val"
        ).repartition(16)
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / "big"), df,
            identity={"row_id": {"start": 1, "step": 1}},
        )
        assert _ids(t) == list(range(1, 1001))


class TestIdentityExplicitInsert:
    def test_generated_always_refuses_explicit(self, spark, tmp_path):
        t = _mk(spark, tmp_path, n=2)
        batch = spark.createDataFrame(
            [("x", 0.0, 99)], "name string, val double, row_id long"
        )
        with pytest.raises(DeltaProtocolError, match="GENERATED ALWAYS"):
            t.append(batch)

    def test_explicit_insert_syncs_watermark(self, spark, tmp_path):
        t = _mk(spark, tmp_path, n=3, start=1, step=1,
                allow_explicit_insert=True)
        t.append(spark.createDataFrame(
            [("x", 0.0, 50)], "name string, val double, row_id long"
        ))
        # next GENERATED id must land past the explicit 50
        t.append(spark.createDataFrame(
            [("y", 1.0)], "name string, val double"
        ))
        got = _ids(t)
        assert 50 in got and max(got) == 51

    def test_explicit_below_watermark_keeps_it(self, spark, tmp_path):
        t = _mk(spark, tmp_path, n=5, start=1, step=1,
                allow_explicit_insert=True)
        t.append(spark.createDataFrame(
            [("x", 0.0, 2)], "name string, val double, row_id long"
        ))
        t.append(spark.createDataFrame(
            [("y", 1.0)], "name string, val double"
        ))
        assert max(_ids(t)) == 6  # hwm stayed at 5, not regressed to 2


class TestIdentityGuards:
    def test_update_refuses_identity_assignment(self, spark, tmp_path):
        t = _mk(spark, tmp_path, n=3)
        with pytest.raises(ValueError, match="identity"):
            t.update_where("val > 0", {"row_id": "0"})

    def test_merge_allowed_but_identity_assignment_refused(
        self, spark, tmp_path
    ):
        """r13: MERGE works on identity tables (inserts generate,
        updates keep the target's writer-assigned id); only ASSIGNING
        an identity column in a matched clause is refused —
        delta-spark's rule. The old blanket refusal is gone; full
        generation coverage lives in tests/test_advice_fixes_r13.py."""
        from mack_spark.tables import KeyedMerge

        t = _mk(spark, tmp_path, n=3)
        src = spark.createDataFrame(
            [("k0", 9.9)], "name string, val double"
        )
        km = KeyedMerge(
            source=src, condition="t.name = s.name",
            matched_update={"val": "s.val"},
            target_key_col="name", source_key_col="name",
        )
        before = _ids(t)
        t.merge(km)
        assert _ids(t) == before  # updated row kept its identity value
        assert t.to_df().where("name = 'k0'").collect()[0]["val"] == 9.9
        km_bad = KeyedMerge(
            source=src, condition="t.name = s.name",
            matched_update={"row_id": "0", "val": "s.val"},
            target_key_col="name", source_key_col="name",
        )
        with pytest.raises(DeltaProtocolError, match="identity"):
            t.merge(km_bad)

    def test_identity_partition_column_refused(self, spark, tmp_path):
        df = spark.createDataFrame([("a", 1.0)], "name string, val double")
        with pytest.raises(DeltaProtocolError, match="partition"):
            DeltaProtocolTable.create(
                spark, str(tmp_path / "p"), df,
                partition_by=["row_id"],
                identity={"row_id": {"start": 1, "step": 1}},
            )

    def test_non_bigint_identity_refused(self, spark, tmp_path):
        df = spark.createDataFrame(
            [("a", 1.0, 1)], "name string, val double, row_id int"
        )
        with pytest.raises(DeltaProtocolError, match="bigint"):
            DeltaProtocolTable.create(
                spark, str(tmp_path / "i"), df,
                identity={"row_id": {}},
            )

    def test_zero_step_refused(self, spark, tmp_path):
        df = spark.createDataFrame([("a", 1.0)], "name string, val double")
        with pytest.raises(DeltaProtocolError, match="step 0"):
            DeltaProtocolTable.create(
                spark, str(tmp_path / "z"), df,
                identity={"row_id": {"start": 1, "step": 0}},
            )


class TestIdentityComposition:
    def test_delete_preserves_surviving_ids(self, spark, tmp_path):
        t = _mk(spark, tmp_path, n=6)
        t.delete_where("row_id % 2 = 0")
        assert _ids(t) == [1, 3, 5]
        t.append(spark.createDataFrame(
            [("z", 0.0)], "name string, val double"
        ))
        assert _ids(t) == [1, 3, 5, 7]  # watermark unaffected by delete

    def test_dv_delete_on_identity_table(self, spark, tmp_path):
        t = _mk(spark, tmp_path, n=6)
        t.set_properties({"delta.enableDeletionVectors": "true"})
        snap = t.snapshot()
        assert "identityColumns" in snap.protocol["writerFeatures"]
        t.delete_where("row_id <= 2")
        assert _ids(t) == [3, 4, 5, 6]

    def test_foreign_writer6_table_is_writable(self, spark, tmp_path):
        # a plain writer-6 protocol (no features list) must be accepted
        t = _mk(spark, tmp_path, n=2)
        snap = t.snapshot()
        assert snap.protocol == {"minReaderVersion": 1,
                                 "minWriterVersion": 6}
        t.append(spark.createDataFrame(
            [("z", 0.0)], "name string, val double"
        ))
        assert len(_ids(t)) == 3

    def test_checkpoint_roundtrip(self, spark, tmp_path):
        import os
        t = _mk(spark, tmp_path, n=4)
        t.append(spark.createDataFrame(
            [("z", 0.0)], "name string, val double"
        ))
        v = t.checkpoint()
        for i in range(v + 1):
            f = os.path.join(t.path, "_delta_log", "%020d.json" % i)
            if os.path.exists(f):
                os.unlink(f)
        t2 = DeltaProtocolTable(spark, t.path)
        assert sorted(
            r["row_id"] for r in t2.to_df().select("row_id").collect()
        ) == [1, 2, 3, 4, 5]
        # watermark survives the checkpoint replay
        t2.append(spark.createDataFrame(
            [("w", 0.0)], "name string, val double"
        ))
        assert max(
            r["row_id"] for r in t2.to_df().select("row_id").collect()
        ) == 6


class TestIdentityComposedFeatures:
    def test_identity_with_generated_column_and_constraint(
        self, spark, tmp_path
    ):
        # writer-6+ composition: identity generates first, so a
        # generated column may derive from it; constraints see the
        # full row
        import json

        df = spark.createDataFrame(
            [(f"k{i}",) for i in range(6)], "name string"
        )
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / "t"), df,
            identity={"row_id": {"start": 1, "step": 1}},
        )
        snap = t.snapshot()
        schema_json = json.loads(snap.metadata["schemaString"])
        schema_json["fields"].append({
            "name": "row_id_even", "type": "boolean", "nullable": True,
            "metadata": {
                "delta.generationExpression": "row_id % 2 = 0"
            },
        })
        t._commit(snap.version + 1, [
            {"commitInfo": {"timestamp": 0, "operation": "ADD COLUMNS"}},
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 6}},
            {"metaData": dict(
                snap.metadata,
                schemaString=json.dumps(schema_json),
            )},
        ], snap=snap)
        t.add_constraint("pos_id", "row_id > 0")
        t.append(spark.createDataFrame([("x",), ("y",)], "name string"))
        rows = {r["row_id"]: r["row_id_even"]
                for r in t.to_df().collect()}
        assert sorted(rows) == list(range(1, 9))
        # files written BEFORE the generated column existed NULL-fill
        # it (Delta: evolution does not backfill history); rows
        # appended after compute it from the freshly-generated row_id
        assert all(rows[i] is None for i in range(1, 7))
        assert rows[7] is False and rows[8] is True
