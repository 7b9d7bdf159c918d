"""Round-14: VACUUM LITE (delta 3.3's log-driven vacuum) — reclaimable
files come from REMOVE tombstones in the available log tail, never a
storage listing: O(log) instead of O(every object under a 100 TB
prefix). Tradeoffs pinned here are delta's own: staging debris needs a
full vacuum; shallow-clone source files (absolute tombstones) are
never touched."""

import os

import pytest

from mack_spark.sources.delta_log import DeltaProtocolTable

SCHEMA = "pkey int, v int"


def _mk(spark, tmp_path, name="t", **kw):
    df = spark.createDataFrame([(i, i) for i in range(20)], SCHEMA)
    return DeltaProtocolTable.create(spark, str(tmp_path / name), df, **kw)


class TestVacuumLite:
    def test_reclaims_tombstoned_files(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        before = set(t.snapshot().files)
        t.delete_where("pkey < 10")
        t.optimize()
        dry = t.vacuum(retention_hours=0, dry_run=True, lite=True)
        full_dry = t.vacuum(retention_hours=0, dry_run=True)
        # LITE finds exactly the tombstoned set the full listing finds
        # (no staging debris in this fixture)
        assert set(dry) == set(full_dry)
        assert set(dry) & before  # the rewritten originals are in it
        got = t.vacuum(retention_hours=0, lite=True)
        assert set(got) == set(dry)
        for p in got:
            assert not os.path.exists(os.path.join(t.path, p))
        assert t.to_df().count() == 10  # live data intact

    def test_lite_skips_staging_debris(self, spark, tmp_path):
        """The documented tradeoff: never-committed files are invisible
        to the log, so LITE leaves them; full vacuum reclaims them."""
        t = _mk(spark, tmp_path)
        debris = os.path.join(t.path, "_staging_dead", "junk.parquet")
        os.makedirs(os.path.dirname(debris))
        with open(debris, "wb") as fh:
            fh.write(b"x")
        os.utime(debris, (0, 0))  # ancient
        assert t.vacuum(retention_hours=0, dry_run=True, lite=True) == []
        full = t.vacuum(retention_hours=0, dry_run=True)
        assert any("junk.parquet" in p for p in full)

    def test_lite_never_touches_clone_source(self, spark, tmp_path):
        src = _mk(spark, tmp_path, "src")
        clone = DeltaProtocolTable.shallow_clone(
            spark, src.path, str(tmp_path / "cl")
        )
        clone.delete_where("pkey < 20")  # tombstones ABSOLUTE src paths
        got = clone.vacuum(retention_hours=0, lite=True)
        assert got == []
        assert src.to_df().count() == 20  # source files untouched

    def test_retention_respected(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        t.delete_where("pkey < 5")
        # fresh tombstones are inside the retention window
        assert t.vacuum(retention_hours=1000, dry_run=True, lite=True) \
            == []

    def test_sql_form(self, spark, tmp_path):
        from mack_spark.sql_ddl import DeltaSqlSession

        t = _mk(spark, tmp_path)
        t.delete_where("pkey >= 15")
        sq = DeltaSqlSession(spark, {"tbl": t})
        rows = sq.sql("VACUUM tbl LITE RETAIN 0 HOURS DRY RUN").collect()
        assert rows and all(r["path"] for r in rows)
