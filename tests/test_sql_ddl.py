"""Round-14: SQL utility / DDL front-end — the delta-spark SQL surface
beyond DML. ``DESCRIBE HISTORY/DETAIL``, ``OPTIMIZE [WHERE] [ZORDER
BY]``, ``VACUUM [RETAIN n HOURS] [DRY RUN]``, ``RESTORE TABLE``,
``ALTER TABLE`` (columns, properties, constraints, clustering),
``CREATE TABLE ... USING DELTA`` (+ CTAS), ``CONVERT TO DELTA``,
time-travel ``SELECT ... VERSION AS OF`` and the ``table_changes``
TVF, all parsed here and dispatched onto the SAME engine methods the
Python API uses (delta-spark routes the same statements through its
catalog extension; the reference inherits that surface,
/root/reference/pyproject.toml:13-14). Every test asserts against the
Python API's own result so the SQL skin can never drift from the
engine."""

import os

import pytest

from mack_spark.sources.delta_log import DeltaProtocolTable
from mack_spark.sql_ddl import DeltaSqlSession
from mack_spark.sql_dml import SqlDmlError

SCHEMA = "pkey int, status string, v int"


def _mk(spark, tmp_path, name="t", n=10, **kw):
    df = spark.createDataFrame(
        [(i, "old", i * 10) for i in range(n)], SCHEMA
    )
    return DeltaProtocolTable.create(spark, str(tmp_path / name), df, **kw)


@pytest.fixture
def sq(spark):
    return DeltaSqlSession(spark)


class TestDescribe:
    def test_history_shape_and_order(self, spark, tmp_path, sq):
        t = _mk(spark, tmp_path)
        t.delete_where("pkey = 0")
        sq.register("tbl", t)
        rows = sq.sql("DESCRIBE HISTORY tbl").collect()
        assert [r["version"] for r in rows] == [1, 0]
        assert rows[0]["operation"] == "DELETE"
        assert rows[0]["timestamp"] is not None
        assert isinstance(rows[0]["operationParameters"], dict)

    def test_history_limit(self, spark, tmp_path, sq):
        t = _mk(spark, tmp_path)
        t.delete_where("pkey = 0")
        t.delete_where("pkey = 1")
        sq.register("tbl", t)
        rows = sq.sql("DESCRIBE HISTORY tbl LIMIT 1").collect()
        assert len(rows) == 1 and rows[0]["version"] == 2

    def test_detail_matches_python(self, spark, tmp_path, sq):
        t = _mk(spark, tmp_path)
        sq.register("tbl", t)
        row = sq.sql("DESCRIBE DETAIL tbl").collect()[0]
        d = t.detail()
        assert row["numFiles"] == d["numFiles"]
        assert row["sizeInBytes"] == d["sizeInBytes"]
        assert row["location"] == t.path
        assert row["version"] == d["version"]

    def test_path_syntax(self, spark, tmp_path, sq):
        t = _mk(spark, tmp_path)
        row = sq.sql(f"DESCRIBE DETAIL delta.`{t.path}`").collect()[0]
        assert row["location"] == t.path


class TestOptimizeVacuumRestore:
    def test_optimize_binpacks(self, spark, tmp_path, sq):
        t = _mk(spark, tmp_path)
        for i in range(3):
            t.append(spark.createDataFrame([(100 + i, "new", 1)], SCHEMA))
        sq.register("tbl", t)
        before = len(t.snapshot().files)
        sq.sql("OPTIMIZE tbl")
        assert len(t.snapshot().files) < before
        assert t.to_df().count() == 13

    def test_optimize_where_scopes(self, spark, tmp_path, sq):
        df = spark.createDataFrame(
            [(i, "a" if i % 2 else "b", i) for i in range(20)], SCHEMA
        )
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / "p"), df, partition_by=["status"]
        )
        for i in range(3):
            t.append(
                spark.createDataFrame([(100 + i, "a", 1)], SCHEMA)
            )
        sq.register("tbl", t)
        res = sq.sql("OPTIMIZE tbl WHERE status = 'a'").collect()[0]
        d = res.asDict()
        # only the 'a' partition was compacted; 'b' files untouched
        assert t.to_df().count() == 23
        assert any(v for v in d.values())

    def test_optimize_zorder(self, spark, tmp_path, sq):
        t = _mk(spark, tmp_path, n=100)
        sq.register("tbl", t)
        sq.sql("OPTIMIZE tbl ZORDER BY (pkey, v)")
        assert t.to_df().count() == 100

    def test_vacuum_dry_run_and_retain(self, spark, tmp_path, sq):
        t = _mk(spark, tmp_path)
        t.delete_where("pkey < 5")
        t.optimize()
        sq.register("tbl", t)
        dry = {r["path"] for r in
               sq.sql("VACUUM tbl RETAIN 0 HOURS DRY RUN").collect()}
        assert dry == set(t.vacuum(retention_hours=0, dry_run=True))
        assert dry  # something is reclaimable after delete+optimize
        real = {r["path"] for r in
                sq.sql("VACUUM tbl RETAIN 0 HOURS").collect()}
        assert real == dry
        for p in real:
            assert not os.path.exists(os.path.join(t.path, p))

    def test_restore_version(self, spark, tmp_path, sq):
        t = _mk(spark, tmp_path)
        t.delete_where("pkey >= 5")
        sq.register("tbl", t)
        res = sq.sql("RESTORE TABLE tbl TO VERSION AS OF 0").collect()[0]
        assert res["version"] == 2
        assert t.to_df().count() == 10

    def test_restore_timestamp(self, spark, tmp_path, sq):
        import datetime as dt

        t = _mk(spark, tmp_path)
        v0_ts = t.history()[-1]["timestamp"]
        t.delete_where("pkey >= 5")
        sq.register("tbl", t)
        ts = dt.datetime.fromtimestamp(v0_ts / 1000.0).strftime(
            "%Y-%m-%d %H:%M:%S.%f"
        )
        sq.sql(f"RESTORE tbl TO TIMESTAMP AS OF '{ts}'")
        assert t.to_df().count() == 10


class TestAlterTable:
    def test_add_column_and_columns(self, spark, tmp_path, sq):
        t = _mk(spark, tmp_path)
        sq.register("tbl", t)
        sq.sql("ALTER TABLE tbl ADD COLUMN note string")
        sq.sql("ALTER TABLE tbl ADD COLUMNS (a int, b decimal(10,2))")
        names = [f.name for f in t.snapshot().schema.fields]
        assert names[-3:] == ["note", "a", "b"]
        assert t.to_df().where("note IS NOT NULL").count() == 0

    def test_rename_and_drop(self, spark, tmp_path, sq):
        t = _mk(spark, tmp_path)
        t.enable_column_mapping()
        sq.register("tbl", t)
        sq.sql("ALTER TABLE tbl RENAME COLUMN status TO state")
        assert "state" in t.to_df().columns
        sq.sql("ALTER TABLE tbl DROP COLUMN state")
        assert "state" not in t.to_df().columns

    def test_set_tblproperties(self, spark, tmp_path, sq):
        t = _mk(spark, tmp_path)
        sq.register("tbl", t)
        sq.sql(
            "ALTER TABLE tbl SET TBLPROPERTIES"
            " ('delta.enableChangeDataFeed' = 'true')"
        )
        cfg = t.snapshot().metadata["configuration"]
        assert cfg["delta.enableChangeDataFeed"] == "true"

    def test_unset_tblproperties(self, spark, tmp_path, sq):
        t = _mk(spark, tmp_path)
        sq.register("tbl", t)
        sq.sql(
            "ALTER TABLE tbl SET TBLPROPERTIES"
            " ('delta.appendOnly' = 'false', 'custom.tag' = 'x')"
        )
        sq.sql(
            "ALTER TABLE tbl UNSET TBLPROPERTIES IF EXISTS"
            " ('custom.tag', 'never.was.set')"
        )
        cfg = t.snapshot().metadata["configuration"]
        assert "custom.tag" not in cfg
        assert cfg["delta.appendOnly"] == "false"

    def test_constraints(self, spark, tmp_path, sq):
        t = _mk(spark, tmp_path)
        sq.register("tbl", t)
        sq.sql("ALTER TABLE tbl ADD CONSTRAINT vpos CHECK (v >= 0)")
        with pytest.raises(Exception):
            t.append(spark.createDataFrame([(99, "x", -1)], SCHEMA))
        sq.sql("ALTER TABLE tbl DROP CONSTRAINT vpos")
        t.append(spark.createDataFrame([(99, "x", -1)], SCHEMA))
        assert t.to_df().count() == 11

    def test_cluster_by(self, spark, tmp_path, sq):
        t = _mk(spark, tmp_path)
        sq.register("tbl", t)
        sq.sql("ALTER TABLE tbl CLUSTER BY (pkey)")
        assert t.clustering_columns() == ["pkey"]
        sq.sql("ALTER TABLE tbl CLUSTER BY NONE")
        assert t.clustering_columns() == []


class TestCreateConvert:
    def test_create_with_columns(self, spark, tmp_path, sq):
        p = str(tmp_path / "c1")
        sq.sql(
            f"CREATE TABLE t1 (id bigint, name string) USING DELTA"
            f" PARTITIONED BY (name) LOCATION '{p}'"
        )
        t = DeltaProtocolTable(spark, p)
        assert [f.name for f in t.snapshot().schema.fields] == ["id", "name"]
        assert t.snapshot().partition_columns == ["name"]
        # registered: usable in follow-up statements
        assert sq.sql("SELECT * FROM t1").count() == 0

    def test_ctas_and_if_not_exists(self, spark, tmp_path, sq):
        p = str(tmp_path / "c2")
        spark.createDataFrame(
            [(i,) for i in range(5)], "x int"
        ).createOrReplaceTempView("src5")
        sq.sql(
            f"CREATE TABLE delta.`{p}` USING DELTA AS"
            f" SELECT x, x * 2 AS y FROM src5"
        )
        t = DeltaProtocolTable(spark, p)
        assert t.to_df().count() == 5
        res = sq.sql(
            f"CREATE TABLE IF NOT EXISTS delta.`{p}` USING DELTA AS"
            f" SELECT x, x * 2 AS y FROM src5"
        ).collect()[0]
        assert res["created"] == "false"
        with pytest.raises(SqlDmlError, match="already exists"):
            sq.sql(
                f"CREATE TABLE delta.`{p}` USING DELTA AS"
                f" SELECT x FROM src5"
            )

    def test_create_or_replace(self, spark, tmp_path, sq):
        p = str(tmp_path / "c3")
        spark.createDataFrame(
            [(1,), (2,)], "x int"
        ).createOrReplaceTempView("src2")
        sq.sql(
            f"CREATE TABLE delta.`{p}` USING DELTA AS SELECT x FROM src2"
        )
        sq.sql(
            f"CREATE OR REPLACE TABLE delta.`{p}` USING DELTA AS"
            f" SELECT x + 10 AS x FROM src2"
        )
        t = DeltaProtocolTable(spark, p)
        assert sorted(r["x"] for r in t.to_df().collect()) == [11, 12]
        assert t.snapshot().version == 1  # replace is a commit, not a wipe

    def test_create_tblproperties(self, spark, tmp_path, sq):
        p = str(tmp_path / "c4")
        sq.sql(
            f"CREATE TABLE delta.`{p}` (id int) USING DELTA"
            f" TBLPROPERTIES ('delta.appendOnly' = 'true')"
        )
        t = DeltaProtocolTable(spark, p)
        cfg = t.snapshot().metadata["configuration"]
        assert cfg["delta.appendOnly"] == "true"

    def test_create_identity_column(self, spark, tmp_path, sq):
        p = str(tmp_path / "ident")
        sq.sql(
            f"CREATE TABLE delta.`{p}` ("
            f" id BIGINT GENERATED ALWAYS AS IDENTITY"
            f"   (START WITH 10 INCREMENT BY 2),"
            f" v INT NOT NULL"
            f") USING DELTA"
        )
        t = DeltaProtocolTable(spark, p)
        t.append(spark.createDataFrame([(7,), (8,)], "v int"))
        rows = sorted(
            (r["id"], r["v"]) for r in t.to_df().collect()
        )
        assert rows == [(10, 7), (12, 8)]

    def test_create_generated_column(self, spark, tmp_path, sq):
        p = str(tmp_path / "gen")
        sq.sql(
            f"CREATE TABLE delta.`{p}` ("
            f" a INT, doubled INT GENERATED ALWAYS AS (a * 2)"
            f") USING DELTA"
        )
        t = DeltaProtocolTable(spark, p)
        t.append(spark.createDataFrame([(3,), (4,)], "a int"))
        rows = sorted(
            (r["a"], r["doubled"]) for r in t.to_df().collect()
        )
        assert rows == [(3, 6), (4, 8)]

    def test_column_defaults(self, spark, tmp_path, sq):
        """spec §Default Columns: CREATE col DEFAULT, INSERT fills
        omitted columns from CURRENT_DEFAULT, ALTER SET/DROP DEFAULT."""
        p = str(tmp_path / "defs")
        sq.sql(
            f"CREATE TABLE dt (k INT, status STRING DEFAULT 'fresh',"
            f" score DOUBLE DEFAULT 1.5) USING DELTA LOCATION '{p}'"
        )
        t = DeltaProtocolTable(spark, p)
        assert "allowColumnDefaults" in (
            t.snapshot().protocol.get("writerFeatures") or []
        )
        sq.sql("INSERT INTO dt (k) VALUES (1)")
        row = t.to_df().collect()[0]
        assert (row["status"], row["score"]) == ("fresh", 1.5)
        sq.sql("ALTER TABLE dt ALTER COLUMN status SET DEFAULT 'aged'")
        sq.sql("ALTER TABLE dt ALTER COLUMN score DROP DEFAULT")
        sq.sql("INSERT INTO dt (k) VALUES (2)")
        row2 = t.to_df().where("k = 2").collect()[0]
        assert row2["status"] == "aged" and row2["score"] is None

    def test_create_identity_requires_bigint(self, sq, tmp_path):
        from mack_spark.sql_dml import SqlDmlError

        with pytest.raises(SqlDmlError, match="BIGINT"):
            sq.sql(
                f"CREATE TABLE delta.`{tmp_path}/x` ("
                f" id INT GENERATED ALWAYS AS IDENTITY"
                f") USING DELTA"
            )

    def test_convert_to_delta(self, spark, tmp_path, sq):
        p = str(tmp_path / "plain")
        spark.createDataFrame(
            [(i, i * 2) for i in range(50)], "a int, b int"
        ).write.parquet(p)
        res = sq.sql(f"CONVERT TO DELTA parquet.`{p}`").collect()[0]
        assert res["numFiles"] >= 1
        t = DeltaProtocolTable(spark, p)
        assert t.to_df().count() == 50


class TestCloneShowFsck:
    def test_shallow_and_deep_clone(self, spark, tmp_path, sq):
        t = _mk(spark, tmp_path)
        sq.register("src", t)
        p_sh = str(tmp_path / "sh")
        p_dp = str(tmp_path / "dp")
        res = sq.sql(
            f"CREATE TABLE sh SHALLOW CLONE src LOCATION '{p_sh}'"
        ).collect()[0]
        assert res["clone"] == "shallow"
        assert sq.sql("SELECT count(*) AS n FROM sh").collect()[0]["n"] == 10
        sq.sql(f"CREATE TABLE dp DEEP CLONE src LOCATION '{p_dp}'")
        assert sq.sql("SELECT count(*) AS n FROM dp").collect()[0]["n"] == 10
        # deep clone is standalone: data files live under the clone
        dp = DeltaProtocolTable(spark, p_dp)
        assert all(not p.startswith("/") for p in dp.snapshot().files)

    def test_clone_version_as_of(self, spark, tmp_path, sq):
        t = _mk(spark, tmp_path)
        t.delete_where("pkey >= 5")
        sq.register("src", t)
        p = str(tmp_path / "v0clone")
        sq.sql(
            f"CREATE TABLE oldc SHALLOW CLONE src VERSION AS OF 0"
            f" LOCATION '{p}'"
        )
        assert sq.sql(
            "SELECT count(*) AS n FROM oldc"
        ).collect()[0]["n"] == 10  # pre-delete state
        assert t.to_df().count() == 5  # source head unchanged

    def test_show_tblproperties_and_columns(self, spark, tmp_path, sq):
        t = _mk(spark, tmp_path)
        t.set_properties({"delta.appendOnly": "false", "x.y": "z"})
        sq.register("tbl", t)
        props = {
            r["key"]: r["value"]
            for r in sq.sql("SHOW TBLPROPERTIES tbl").collect()
        }
        assert props["x.y"] == "z"
        cols = [r["col_name"]
                for r in sq.sql("SHOW COLUMNS IN tbl").collect()]
        assert cols == ["pkey", "status", "v"]

    def test_show_partitions(self, spark, tmp_path, sq):
        df = spark.createDataFrame(
            [(i, "a" if i % 2 else "b", i) for i in range(10)], SCHEMA
        )
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / "p"), df, partition_by=["status", "v"]
        )
        sq.register("tbl", t)
        rows = sq.sql("SHOW PARTITIONS tbl").collect()
        assert len(rows) == 10
        assert {r["status"] for r in rows} == {"a", "b"}
        assert isinstance(rows[0]["v"], int)  # typed, not string

    def test_fsck_repair(self, spark, tmp_path, sq):
        t = _mk(spark, tmp_path)
        t.append(spark.createDataFrame([(100, "x", 1)], SCHEMA))
        sq.register("tbl", t)
        victim = sorted(t.snapshot().files)[0]
        os.unlink(os.path.join(t.path, victim))
        dry = [r["path"] for r in
               sq.sql("FSCK REPAIR TABLE tbl DRY RUN").collect()]
        assert dry == [victim]
        assert t.snapshot().version == 1  # dry run commits nothing
        fixed = [r["path"] for r in
                 sq.sql("FSCK REPAIR TABLE tbl").collect()]
        assert fixed == [victim]
        assert t.snapshot().version == 2
        t.to_df().count()  # table reads cleanly again


class TestGenerateManifest:
    def test_unpartitioned_manifest(self, spark, tmp_path, sq):
        t = _mk(spark, tmp_path)
        sq.register("tbl", t)
        rows = sq.sql(
            "GENERATE symlink_format_manifest FOR TABLE tbl"
        ).collect()
        assert [r["manifest"] for r in rows] == [
            "_symlink_format_manifest/manifest"
        ]
        lines = open(
            os.path.join(t.path, "_symlink_format_manifest", "manifest")
        ).read().splitlines()
        assert sorted(lines) == sorted(
            "file://" + os.path.join(t.path, p)
            for p in t.snapshot().files
        )

    def test_partitioned_manifest_tracks_current(self, spark, tmp_path, sq):
        df = spark.createDataFrame(
            [(i, "a" if i < 5 else "b", i) for i in range(10)], SCHEMA
        )
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / "p"), df, partition_by=["status"]
        )
        sq.register("tbl", t)
        sq.sql("GENERATE symlink_format_manifest FOR TABLE tbl")
        root = os.path.join(t.path, "_symlink_format_manifest")
        assert sorted(os.listdir(root)) == ["status=a", "status=b"]
        # drop partition b; regeneration removes its stale manifest
        t.delete_where("status = 'b'")
        sq.sql("GENERATE symlink_format_manifest FOR TABLE tbl")
        assert sorted(os.listdir(root)) == ["status=a"]

    def test_auto_manifest_property(self, spark, tmp_path, sq):
        """delta.compatibility.symlinkFormatManifest.enabled keeps the
        manifests current on every commit (delta-spark's post-commit
        hook)."""
        t = _mk(
            spark, tmp_path,
            properties={
                "delta.compatibility.symlinkFormatManifest.enabled":
                    "true",
            },
        )
        mpath = os.path.join(
            t.path, "_symlink_format_manifest", "manifest"
        )
        assert os.path.exists(mpath)
        before = set(open(mpath).read().splitlines())
        t.append(spark.createDataFrame([(100, "x", 1)], SCHEMA))
        after = set(open(mpath).read().splitlines())
        assert len(after) > len(before)
        assert after == {
            "file://" + os.path.join(t.path, p)
            for p in t.snapshot().files
        }

    def test_vacuum_spares_manifests(self, spark, tmp_path, sq):
        """Full VACUUM must not reclaim _symlink_format_manifest (or
        any hidden dir except _change_data / staging debris) — the r14
        review's finding; delta skips hidden dirs the same way."""
        t = _mk(spark, tmp_path)
        sq.register("tbl", t)
        sq.sql("GENERATE symlink_format_manifest FOR TABLE tbl")
        mpath = os.path.join(
            t.path, "_symlink_format_manifest", "manifest"
        )
        os.utime(mpath, (0, 0))  # ancient — eligible if ever listed
        t.delete_where("pkey = 0")
        t.vacuum(retention_hours=0)
        assert os.path.exists(mpath)

    def test_from_comma_list_rewrites_all_refs(self, spark, tmp_path, sq):
        ta = _mk(spark, tmp_path, "a")
        tb = _mk(spark, tmp_path, "b")
        sq.register("ta", ta).register("tb", tb)
        n = sq.sql(
            "SELECT count(*) AS n FROM ta, tb"
            " WHERE ta.pkey = tb.pkey"
        ).collect()[0]["n"]
        assert n == 10
        # commas AFTER the from list (ORDER BY x, y) are not table refs
        rows = sq.sql(
            "SELECT ta.pkey, ta.v FROM ta, tb WHERE ta.pkey = tb.pkey"
            " ORDER BY ta.v, ta.pkey"
        ).collect()
        assert len(rows) == 10

    def test_dv_table_refused(self, spark, tmp_path, sq):
        t = _mk(
            spark, tmp_path,
            properties={"delta.enableDeletionVectors": "true"},
        )
        t.delete_where("pkey = 1")
        sq.register("tbl", t)
        with pytest.raises(Exception, match="deletion vectors"):
            sq.sql("GENERATE symlink_format_manifest FOR TABLE tbl")


class TestSelectRewrite:
    def test_registered_name_and_where(self, spark, tmp_path, sq):
        t = _mk(spark, tmp_path)
        sq.register("tbl", t)
        got = sq.sql(
            "SELECT count(*) AS n FROM tbl WHERE pkey < 5"
        ).collect()[0]["n"]
        assert got == 5

    def test_version_as_of(self, spark, tmp_path, sq):
        t = _mk(spark, tmp_path)
        t.delete_where("pkey >= 5")
        sq.register("tbl", t)
        assert sq.sql("SELECT * FROM tbl").count() == 5
        assert sq.sql("SELECT * FROM tbl VERSION AS OF 0").count() == 10

    def test_timestamp_as_of(self, spark, tmp_path, sq):
        import datetime as dt

        t = _mk(spark, tmp_path)
        v0_ts = t.history()[-1]["timestamp"]
        t.delete_where("pkey >= 5")
        sq.register("tbl", t)
        ts = dt.datetime.fromtimestamp(v0_ts / 1000.0).strftime(
            "%Y-%m-%d %H:%M:%S.%f"
        )
        n = sq.sql(
            f"SELECT * FROM tbl TIMESTAMP AS OF '{ts}'"
        ).count()
        assert n == 10

    def test_join_two_versions_of_same_table(self, spark, tmp_path, sq):
        t = _mk(spark, tmp_path)
        t.delete_where("pkey >= 5")
        sq.register("tbl", t)
        rows = sq.sql(
            "SELECT old.pkey FROM tbl VERSION AS OF 0 old"
            " LEFT ANTI JOIN tbl cur ON old.pkey = cur.pkey"
        ).collect()
        assert sorted(r["pkey"] for r in rows) == [5, 6, 7, 8, 9]

    def test_path_ref_in_select(self, spark, tmp_path, sq):
        t = _mk(spark, tmp_path)
        n = sq.sql(f"SELECT * FROM delta.`{t.path}`").count()
        assert n == 10

    def test_column_named_like_table_untouched(self, spark, tmp_path, sq):
        t = _mk(spark, tmp_path)
        sq.register("tbl", t)
        # 'tbl' appears as an alias qualifier too — only the FROM ref
        # may be rewritten
        rows = sq.sql(
            "SELECT tbl.pkey FROM tbl WHERE tbl.v = 90"
        ).collect()
        assert [r["pkey"] for r in rows] == [9]

    def test_table_changes_tvf(self, spark, tmp_path, sq):
        t = _mk(
            spark, tmp_path,
            properties={"delta.enableChangeDataFeed": "true"},
        )
        t.delete_where("pkey = 3")
        sq.register("tbl", t)
        rows = sq.sql(
            "SELECT _change_type, pkey FROM table_changes('tbl', 1, 1)"
        ).collect()
        assert [(r["_change_type"], r["pkey"]) for r in rows] == [
            ("delete", 3)
        ]
        # TVF in a subquery, mixed with a normal ref
        n = sq.sql(
            "SELECT count(*) AS n FROM (SELECT * FROM"
            " table_changes('tbl', 0)) c JOIN tbl ON c.pkey = tbl.pkey"
        ).collect()[0]["n"]
        assert n == 9 + 0  # 10 inserts + 1 delete, minus pkey 3 gone


class TestInsert:
    def test_insert_into_values(self, spark, tmp_path, sq):
        t = _mk(spark, tmp_path)
        sq.register("tbl", t)
        sq.sql("INSERT INTO tbl VALUES (100, 'new', 1), (101, 'new', 2)")
        assert t.to_df().where("status = 'new'").count() == 2
        assert t.to_df().count() == 12

    def test_insert_into_select_from_registered(self, spark, tmp_path, sq):
        t = _mk(spark, tmp_path)
        sq.register("tbl", t)
        sq.sql(
            "INSERT INTO tbl SELECT pkey + 1000, status, v FROM tbl"
            " WHERE pkey < 3"
        )
        assert t.to_df().count() == 13

    def test_insert_column_list_null_fills(self, spark, tmp_path, sq):
        t = _mk(spark, tmp_path)
        sq.register("tbl", t)
        sq.sql("INSERT INTO tbl (pkey, v) VALUES (500, 9)")
        row = t.to_df().where("pkey = 500").collect()[0]
        assert row["status"] is None and row["v"] == 9

    def test_insert_overwrite(self, spark, tmp_path, sq):
        t = _mk(spark, tmp_path)
        sq.register("tbl", t)
        sq.sql("INSERT OVERWRITE tbl VALUES (1, 'only', 0)")
        rows = t.to_df().collect()
        assert len(rows) == 1 and rows[0]["status"] == "only"

    def test_insert_replace_where(self, spark, tmp_path, sq):
        t = _mk(spark, tmp_path)
        sq.register("tbl", t)
        sq.sql(
            "INSERT INTO tbl REPLACE WHERE pkey < 5"
            " SELECT pkey, 'repl' AS status, v FROM tbl WHERE pkey < 5"
        )
        assert t.to_df().where("status = 'repl'").count() == 5
        assert t.to_df().count() == 10

    def test_insert_widened_store_assign(self, spark, tmp_path, sq):
        t = _mk(spark, tmp_path)
        t.alter_column_type("v", "bigint")
        sq.register("tbl", t)
        sq.sql("INSERT INTO tbl VALUES (700, 'w', 5)")  # int literal
        assert t.to_df().where("pkey = 700").collect()[0]["v"] == 5


class TestDmlPassthrough:
    def test_update_returns_metrics_df(self, spark, tmp_path, sq):
        t = _mk(spark, tmp_path)
        sq.register("tbl", t)
        res = sq.sql(
            "UPDATE tbl SET status = 'new' WHERE pkey < 3"
        ).collect()[0]
        assert t.to_df().where("status = 'new'").count() == 3
        assert "version" in res.asDict()

    def test_full_sql_lifecycle(self, spark, tmp_path, sq):
        """CREATE → MERGE → DESCRIBE HISTORY → RESTORE → SELECT, all as
        SQL text — the delta-spark workflow end to end."""
        p = str(tmp_path / "life")
        spark.createDataFrame(
            [(i, i * 10) for i in range(8)], "pkey int, v int"
        ).createOrReplaceTempView("base8")
        sq.sql(
            f"CREATE TABLE life USING DELTA LOCATION '{p}'"
            f" AS SELECT pkey, v FROM base8"
        )
        sq.sql(
            "MERGE INTO life t USING (SELECT 1 AS pkey, 999 AS v) s"
            " ON t.pkey = s.pkey"
            " WHEN MATCHED THEN UPDATE SET *"
            " WHEN NOT MATCHED THEN INSERT *"
        )
        hist = sq.sql("DESCRIBE HISTORY life").collect()
        assert [h["version"] for h in hist] == [1, 0]
        sq.sql("RESTORE TABLE life TO VERSION AS OF 0")
        vals = sq.sql(
            "SELECT v FROM life WHERE pkey = 1"
        ).collect()
        assert [r["v"] for r in vals] == [10]


class TestErrors:
    def test_unknown_statement(self, sq):
        with pytest.raises(SqlDmlError, match="unsupported statement"):
            sq.sql("TRUNCATE TABLE x")

    def test_unknown_table(self, sq):
        with pytest.raises(SqlDmlError, match="unknown table"):
            sq.sql("DESCRIBE HISTORY nope")

    def test_create_without_location(self, sq):
        with pytest.raises(SqlDmlError, match="LOCATION"):
            sq.sql("CREATE TABLE t (a int) USING DELTA")

    def test_create_requires_delta(self, sq, tmp_path):
        with pytest.raises(SqlDmlError, match="USING DELTA"):
            sq.sql(
                f"CREATE TABLE t (a int) USING PARQUET"
                f" LOCATION '{tmp_path}/x'"
            )

    def test_vacuum_trailing_garbage(self, spark, tmp_path, sq):
        t = _mk(spark, tmp_path)
        sq.register("tbl", t)
        with pytest.raises(SqlDmlError, match="unexpected token"):
            sq.sql("VACUUM tbl RETAIN 0 HOURS WET RUN")


class TestSqlTailR15:
    """Round 15: SHOW CREATE TABLE, plain DESCRIBE TABLE, and the
    ``@v`` / ``@yyyyMMddHHmmssSSS`` time-travel shorthand."""

    def test_show_create_table(self, spark, tmp_path, sq):
        df = spark.createDataFrame(
            [(1, "a", "x")], "pkey int, status string, p string"
        )
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / "t"), df, partition_by=["p"],
            properties={"delta.appendOnly": "false"},
        )
        sq.register("tbl", t)
        stmt = sq.sql("SHOW CREATE TABLE tbl").collect()[0]["createtab_stmt"]
        assert "CREATE TABLE `tbl`" in stmt
        assert "`pkey` INT" in stmt and "`status` STRING" in stmt
        assert "USING DELTA" in stmt
        assert "PARTITIONED BY (`p`)" in stmt
        assert "'delta.appendOnly' = 'false'" in stmt
        assert f"LOCATION '{t.path}'" in stmt

    def test_describe_table_plain(self, spark, tmp_path, sq):
        df = spark.createDataFrame(
            [(1, "a", "x")], "pkey int, status string, p string"
        )
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / "t"), df, partition_by=["p"]
        )
        sq.register("tbl", t)
        rows = sq.sql("DESCRIBE TABLE tbl").collect()
        names = [r["col_name"] for r in rows]
        assert names[:3] == ["pkey", "status", "p"]
        assert "# Partition Information" in names
        assert names[-1] == "p"  # partition column restated
        assert rows[0]["data_type"] == "int"

    def test_at_version_suffix(self, spark, tmp_path, sq):
        t = _mk(spark, tmp_path)
        t.delete_where("pkey < 5")
        sq.register("tbl", t)
        assert sq.sql("SELECT count(*) AS c FROM tbl@v0").collect()[0]["c"] == 10
        assert sq.sql("SELECT count(*) AS c FROM tbl@v1").collect()[0]["c"] == 5
        # and it composes with predicates + qualified refs
        r = sq.sql(
            "SELECT count(*) AS c FROM tbl@v0 WHERE tbl.pkey >= 8"
        ).collect()[0]
        assert r["c"] == 2

    def test_at_suffix_in_path_backticks(self, spark, tmp_path, sq):
        t = _mk(spark, tmp_path)
        t.delete_where("pkey < 5")
        r = sq.sql(
            f"SELECT count(*) AS c FROM delta.`{t.path}@v0`"
        ).collect()[0]
        assert r["c"] == 10

    def test_at_timestamp_suffix(self, spark, tmp_path, sq):
        import datetime as dt

        # ICT guarantees strictly increasing per-commit timestamps
        t = _mk(
            spark, tmp_path,
            properties={"delta.enableInCommitTimestamps": "true"},
        )
        t.delete_where("pkey < 5")
        icts = {
            r["version"]: r["inCommitTimestamp"] for r in t.history()
        }
        ms = icts[1] - 1  # just before the delete landed
        when = dt.datetime.fromtimestamp(
            ms / 1000.0, tz=dt.timezone.utc
        )
        suffix = when.strftime("%Y%m%d%H%M%S") + f"{ms % 1000:03d}"
        sq.register("tbl", t)
        r = sq.sql(
            f"SELECT count(*) AS c FROM tbl@{suffix}"
        ).collect()[0]
        assert r["c"] == 10  # v0 was current just before v1

    def test_bad_at_suffix_raises(self, spark, tmp_path, sq):
        t = _mk(spark, tmp_path)
        sq.register("tbl", t)
        with pytest.raises(SqlDmlError, match="time-travel"):
            sq.sql("SELECT * FROM tbl@banana")
