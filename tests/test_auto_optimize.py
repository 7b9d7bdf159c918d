"""Round-14: Delta's write-time tuning properties —
``delta.targetFileSize`` sets OPTIMIZE's bin-pack target when the
caller doesn't, and ``delta.autoOptimize.autoCompact`` runs the
selective OPTIMIZE as a post-commit hook once the small-file tail
passes ``minNumFiles`` (the steady-append table that nobody remembers
to compact — delta-spark's autoCompact behavior)."""

import pytest

from mack_spark.sources.delta_log import (
    DeltaProtocolTable,
    _parse_byte_size,
)

SCHEMA = "pkey int, v int"


class TestParseByteSize:
    @pytest.mark.parametrize("s,want", [
        (None, 7), ("104857600", 104857600), ("64kb", 64 << 10),
        ("32MB", 32 << 20), ("1gb", 1 << 30), ("junk", 7), ("", 7),
    ])
    def test_values(self, s, want):
        assert _parse_byte_size(s, 7) == want


class TestTargetFileSize:
    def test_property_drives_optimize(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(i, i) for i in range(100)], SCHEMA
        ).repartition(8)
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / "t"), df,
            properties={"delta.targetFileSize": "64kb"},
        )
        res = t.optimize()  # no explicit target: property applies
        assert res["files_after"] <= res["files_before"]
        for a in t.snapshot().files.values():
            assert a["size"] <= 2 * (64 << 10)  # bins respect the target


class TestAutoCompact:
    def test_small_file_tail_compacts_itself(self, spark, tmp_path):
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / "t"),
            spark.createDataFrame([(0, 0)], SCHEMA),
            properties={
                "delta.autoOptimize.autoCompact": "true",
                "delta.autoOptimize.minNumFiles": "4",
            },
        )
        for i in range(1, 5):
            t.append(spark.createDataFrame([(i, i)], SCHEMA).coalesce(1))
        snap = t.snapshot()
        # the hook fired: the 5 one-row files collapsed
        assert len(snap.files) < 5
        assert t.to_df().count() == 5
        ops = [h["operation"] for h in t.history()]
        assert "OPTIMIZE" in ops

    def test_off_by_default(self, spark, tmp_path):
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / "t"),
            spark.createDataFrame([(0, 0)], SCHEMA),
        )
        for i in range(1, 5):
            t.append(spark.createDataFrame([(i, i)], SCHEMA).coalesce(1))
        assert len(t.snapshot().files) == 5
