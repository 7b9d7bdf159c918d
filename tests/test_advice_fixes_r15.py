"""Round-15 ADVICE fixes.

1 (medium). Checkpoint ``stats_parsed`` on COLUMN-MAPPED tables must be
keyed by PHYSICAL names (the Delta checkpoint spec keys stats_parsed
like the per-file stats JSON — physically). Before the fix the struct
fields and decoders used logical names, so every min/max/nullCount
decoded to null; with writeStatsAsJson=false a cold checkpoint read
silently lost every file-skipping bound.

2-5 (low). sql_ddl parse robustness: derived-table FROM rewriting,
REPLACE WHERE subquery predicates, typeless column defs, truncated
TBLPROPERTIES.
"""

import os

import pytest

from mack_spark.sources.delta_log import (
    DeltaProtocolTable,
    clear_replay_cache,
)


class TestMappedStructStats:
    def _mk(self, spark, tmp_path, drop_json):
        df = spark.createDataFrame(
            [(i, f"v{i}") for i in range(10)], "k int, v string"
        ).coalesce(2)
        props = {
            "delta.checkpoint.writeStatsAsStruct": "true",
            "delta.checkpointInterval": "1",
        }
        if drop_json:
            props["delta.checkpoint.writeStatsAsJson"] = "false"
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / "m"), df, properties=props
        )
        t.enable_column_mapping()
        # physicalName now differs from the logical name for 'k'
        t.rename_column("k", "key")
        t.append(
            spark.createDataFrame(
                [(100 + i, f"w{i}") for i in range(10)],
                "key int, v string",
            ).coalesce(2)
        )
        return t

    def test_struct_keys_are_physical(self, spark, tmp_path):
        import pyarrow.parquet as pq

        t = self._mk(spark, tmp_path, drop_json=False)
        snap = t.snapshot()
        phys_k = snap.physical_names()["key"]
        assert phys_k != "key"  # renamed: physical keeps the old slot
        logdir = os.path.join(t.path, "_delta_log")
        cps = sorted(
            f for f in os.listdir(logdir)
            if f.endswith(".checkpoint.parquet")
        )
        assert cps, "checkpointInterval=1 produced no checkpoint"
        tbl = pq.read_table(os.path.join(logdir, cps[-1]))
        adds = [a for a in tbl.column("add").to_pylist() if a]
        sps = [a["stats_parsed"] for a in adds if a.get("stats_parsed")]
        assert sps, "no stats_parsed in checkpoint adds"
        for sp in sps:
            assert phys_k in sp["minValues"], sorted(sp["minValues"])
            assert sp["minValues"][phys_k] is not None
            assert sp["maxValues"][phys_k] is not None
            assert sp["numRecords"] is not None

    def test_struct_only_cold_read_keeps_bounds(self, spark, tmp_path):
        t = self._mk(spark, tmp_path, drop_json=True)
        import pyarrow.parquet as pq

        logdir = os.path.join(t.path, "_delta_log")
        cps = sorted(
            f for f in os.listdir(logdir)
            if f.endswith(".checkpoint.parquet")
        )
        tbl = pq.read_table(os.path.join(logdir, cps[-1]))
        adds = [a for a in tbl.column("add").to_pylist() if a]
        assert all(a.get("stats") is None for a in adds)
        clear_replay_cache(t.path)
        t2 = DeltaProtocolTable(spark, t.path)
        snap = t2.snapshot()
        phys_k = snap.physical_names()["key"]
        checked = 0
        for p in snap.files:
            st = snap.file_stats(p)
            assert st is not None, p
            # bounds survived the struct-only round trip, physically
            # keyed exactly like live add stats on a mapped table
            if phys_k in (st.get("minValues") or {}):
                assert st["minValues"][phys_k] is not None
                checked += 1
        assert checked > 0
        assert t2.to_df().count() == 20
        # and the bounds actually prune a keyed delete
        res = t2.delete_where("key = 105")
        assert res["touched_files"] <= 2


class TestSqlDdlParseFixes:
    def test_derived_table_comma_join_rewritten(self, spark, tmp_path):
        from mack_spark.sql_ddl import DeltaSqlSession

        df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
        t = DeltaProtocolTable.create(spark, str(tmp_path / "t1"), df)
        sq = DeltaSqlSession(spark).register("t2", t)
        out = sq.sql(
            "SELECT x.n, t2.v FROM (SELECT 1 AS n) x, t2 "
            "WHERE t2.k = 1"
        )
        rows = out.collect()
        assert [(r["n"], r["v"]) for r in rows] == [(1, "a")]

    def test_replace_where_subquery_predicate(self, spark, tmp_path):
        from mack_spark.sql_ddl import DeltaSqlSession

        df = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k int, v string"
        )
        t = DeltaProtocolTable.create(spark, str(tmp_path / "t2"), df)
        sq = DeltaSqlSession(spark).register("t", t)
        sq.sql(
            "INSERT INTO t REPLACE WHERE k IN (SELECT 1 AS one) "
            "SELECT 1 AS k, 'z' AS v"
        )
        rows = sorted(
            (r["k"], r["v"]) for r in t.to_df().collect()
        )
        assert rows == [(1, "z"), (2, "b"), (3, "c")]

    def test_typeless_column_def_clean_error(self, spark, tmp_path):
        from mack_spark.sql_ddl import DeltaSqlSession, SqlDmlError

        sq = DeltaSqlSession(spark)
        with pytest.raises(SqlDmlError, match="type"):
            sq.sql(f"CREATE TABLE delta.`{tmp_path}/t3` (c NOT NULL)")

    def test_truncated_tblproperties_clean_error(self, spark, tmp_path):
        from mack_spark.sql_ddl import DeltaSqlSession, SqlDmlError

        sq = DeltaSqlSession(spark)
        with pytest.raises(SqlDmlError):
            sq.sql(
                f"CREATE TABLE delta.`{tmp_path}/t4` (k INT) "
                "USING DELTA TBLPROPERTIES ('k'"
            )
