"""Incremental rollup maintenance (mack_spark/rollup.py) and the in-era
version reconstruction (append manifests) that powers its change feed."""

import pytest
from pyspark.sql import functions as F

from mack_spark.rollup import (
    SOURCE_VERSION_PROP,
    create_rollup,
    refresh_rollup_incremental,
    rollup_as_view,
)
from mack_spark.tables import ManagedTable, table_changes


def _events(spark, rows):
    return spark.createDataFrame(rows, "grp string, value double")


def _expected(spark, rows):
    return (
        _events(spark, rows)
        .groupBy("grp")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            (
                F.sum(
                    F.floor(F.col("value") * 10000.0).cast("decimal(38,0)")
                ).cast("double")
                / 10000.0
            ).alias("total_value"),
        )
    )


class TestInEraVersions:
    def test_toDF_version_across_appends_without_retention(self, spark, tmp_path):
        t = ManagedTable.create(
            spark, str(tmp_path / "t"), _events(spark, [("a", 1.0)])
        )
        t.append(_events(spark, [("b", 2.0)]))
        t.append(_events(spark, [("c", 3.0)]))
        assert {r["grp"] for r in t.toDF(version=0).collect()} == {"a"}
        assert {r["grp"] for r in t.toDF(version=1).collect()} == {"a", "b"}
        assert {r["grp"] for r in t.toDF().collect()} == {"a", "b", "c"}

    def test_changes_across_append(self, spark, tmp_path):
        t = ManagedTable.create(
            spark, str(tmp_path / "c"), _events(spark, [("a", 1.0)])
        )
        t.append(_events(spark, [("b", 2.0)]))
        ch = table_changes(t, 0).collect()
        assert [(r["grp"], r["_change_type"]) for r in ch] == [("b", "insert")]

    def test_overwrite_breaks_era_but_retention_covers(self, spark, tmp_path):
        t = ManagedTable.create(
            spark, str(tmp_path / "o"), _events(spark, [("a", 1.0)])
        )
        t.set_properties({"mack.retain_snapshots": "4"})
        t.append(_events(spark, [("b", 2.0)]))
        t.overwrite(_events(spark, [("z", 9.0)]), schema_change=False)
        # v2 (pre-overwrite) comes from the retained snapshot; but the
        # retained dir holds BOTH appends, so in-era math applies within
        # the old era only via retained resolution
        assert {r["grp"] for r in t.toDF(version=2).collect()} == {"a", "b"}
        assert {r["grp"] for r in t.toDF().collect()} == {"z"}


class TestIncrementalRollup:
    def test_follows_appends_and_deletes(self, spark, tmp_path):
        rows1 = [("a", 1.5), ("a", 2.0), ("b", 3.0)]
        t = ManagedTable.create(spark, str(tmp_path / "src"), _events(spark, rows1))
        t.set_properties({"mack.retain_snapshots": "8"})
        rollup = create_rollup(t, str(tmp_path / "r"), ["grp"])

        # append: new group + growth of existing
        rows2 = [("b", 1.0), ("c", 4.0)]
        t.append(_events(spark, rows2))
        refresh_rollup_incremental(rollup, t, ["grp"])
        got = rollup_as_view(rollup, ["grp"])
        from conftest import assert_df_equality

        assert_df_equality(got, _expected(spark, rows1 + rows2))

        # delete group a entirely and one b row
        t.overwrite(
            t.toDF().filter("grp <> 'a' and value <> 1.0"), schema_change=False
        )
        refresh_rollup_incremental(rollup, t, ["grp"])
        assert_df_equality(
            rollup_as_view(rollup, ["grp"]),
            _expected(spark, [("b", 3.0), ("c", 4.0)]),
        )
        # group 'a' row is GONE, not zeroed
        assert rollup.toDF().filter("grp = 'a'").count() == 0

    def test_refresh_is_idempotent_noop_when_current(self, spark, tmp_path):
        t = ManagedTable.create(spark, str(tmp_path / "s2"), _events(spark, [("a", 1.0)]))
        t.set_properties({"mack.retain_snapshots": "4"})
        rollup = create_rollup(t, str(tmp_path / "r2"), ["grp"])
        v1 = refresh_rollup_incremental(rollup, t, ["grp"])
        v2 = refresh_rollup_incremental(rollup, t, ["grp"])
        assert v1 == v2
        assert int(rollup.detail()["properties"][SOURCE_VERSION_PROP]) == v2

    def test_missing_watermark_raises(self, spark, tmp_path):
        t = ManagedTable.create(spark, str(tmp_path / "s3"), _events(spark, [("a", 1.0)]))
        bare = ManagedTable.create(
            spark, str(tmp_path / "r3"),
            spark.createDataFrame([], "grp string, n_events long, value_fp decimal(38,0)"),
        )
        with pytest.raises(ValueError, match=SOURCE_VERSION_PROP.replace(".", r"\.")):
            refresh_rollup_incremental(bare, t, ["grp"])

    def test_null_group_maintained(self, spark, tmp_path):
        rows = [(None, 1.0), ("x", 2.0)]
        t = ManagedTable.create(spark, str(tmp_path / "s4"), _events(spark, rows))
        t.set_properties({"mack.retain_snapshots": "4"})
        rollup = create_rollup(t, str(tmp_path / "r4"), ["grp"])
        t.append(_events(spark, [(None, 3.0)]))
        refresh_rollup_incremental(rollup, t, ["grp"])
        got = {r["grp"]: r["n_events"] for r in rollup.toDF().collect()}
        assert got == {None: 2, "x": 1}


class TestInEraRestore:
    def test_restore_to_pre_append_version(self, spark, tmp_path):
        t = ManagedTable.create(
            spark, str(tmp_path / "re"), _events(spark, [("a", 1.0)])
        )
        t.append(_events(spark, [("b", 2.0)]))
        t.append(_events(spark, [("c", 3.0)]))
        t.restore(1)  # back to {a, b} without any retention configured
        assert {r["grp"] for r in t.toDF().collect()} == {"a", "b"}
        # restore is a forward commit, not an undo
        assert t._read_meta()["version"] == 3


class TestProtocolRollup:
    """Rollup maintained from the protocol table's REAL Change Data
    Feed — updates arrive as pre/post pairs and net to exact deltas."""

    def _mk(self, spark, tmp_path, rows):
        from mack_spark.sources.delta_log import DeltaProtocolTable

        return DeltaProtocolTable.create(
            spark, str(tmp_path / "src"), _events(spark, rows),
            properties={"delta.enableChangeDataFeed": "true"},
        )

    def test_follows_merge_update_delete(self, spark, tmp_path):
        from mack_spark.rollup import (
            create_rollup_protocol,
            refresh_rollup_incremental_protocol,
        )
        from mack_spark.tables import KeyedMerge

        rows = [("a", 1.5), ("a", 2.5), ("b", 10.0), ("c", 3.0)]
        src = self._mk(spark, tmp_path, rows)
        rollup = create_rollup_protocol(
            src, str(tmp_path / "r"), ["grp"], "value"
        )
        # v: append
        src.append(_events(spark, [("b", 5.0), ("d", 7.0)]))
        # v: update_where (CDF pre/post pair)
        src.update_where("grp = 'a'", {"value": "value + 100"})
        # v: delete a whole group
        src.delete_where("grp = 'c'")
        refresh_rollup_incremental_protocol(rollup, src, ["grp"], "value")
        got = rollup_as_view(rollup, ["grp"]).orderBy("grp")
        final = [("a", 101.5), ("a", 102.5), ("b", 10.0), ("b", 5.0),
                 ("d", 7.0)]
        from conftest import assert_df_equality

        assert_df_equality(
            got,
            _expected(spark, final).orderBy("grp"),
        )
        # group c reached zero -> row deleted from the rollup
        assert rollup.to_df().where(F.col("grp") == "c").count() == 0

    def test_second_refresh_is_noop(self, spark, tmp_path):
        from mack_spark.rollup import (
            create_rollup_protocol,
            refresh_rollup_incremental_protocol,
        )

        src = self._mk(spark, tmp_path, [("a", 1.0)])
        rollup = create_rollup_protocol(
            src, str(tmp_path / "r"), ["grp"], "value"
        )
        src.append(_events(spark, [("b", 2.0)]))
        v1 = refresh_rollup_incremental_protocol(rollup, src, ["grp"], "value")
        ver_before = rollup.snapshot().version
        v2 = refresh_rollup_incremental_protocol(rollup, src, ["grp"], "value")
        assert v1 == v2
        assert rollup.snapshot().version == ver_before  # no commit
