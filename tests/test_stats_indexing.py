"""Round-14: Delta's stats-indexing table properties —
``delta.dataSkippingNumIndexedCols`` (first-N cap, -1 = all, default
32) and ``delta.dataSkippingStatsColumns`` (explicit set, overrides
the count). On a 2000-column table at 100 TB, stats on every column
bloat every add action and slow every snapshot replay; stats on the
WRONG columns lose file pruning — these properties are the lever, and
delta-spark honors them on every write path."""

import json

import pytest

from mack_spark.sources.delta_log import DeltaProtocolTable


def _stats_cols(t):
    snap = t.snapshot()
    cols = set()
    for a in snap.files.values():
        st = json.loads(a["stats"])
        cols |= set(st["minValues"])
    return cols


class TestStatsIndexing:
    def test_default_first_32(self, spark, tmp_path):
        wide = spark.createDataFrame(
            [tuple(range(40))], ", ".join(f"c{i} int" for i in range(40))
        )
        t = DeltaProtocolTable.create(spark, str(tmp_path / "w"), wide)
        got = _stats_cols(t)
        assert got == {f"c{i}" for i in range(32)}

    def test_num_indexed_cols_cap(self, spark, tmp_path):
        df = spark.createDataFrame([(1, 2, 3, 4)], "a int, b int, c int, d int")
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / "n"), df,
            properties={"delta.dataSkippingNumIndexedCols": "2"},
        )
        assert _stats_cols(t) == {"a", "b"}
        # appends honor the committed property too
        t.append(df)
        assert _stats_cols(t) == {"a", "b"}

    def test_num_indexed_cols_all(self, spark, tmp_path):
        wide = spark.createDataFrame(
            [tuple(range(40))], ", ".join(f"c{i} int" for i in range(40))
        )
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / "all"), wide,
            properties={"delta.dataSkippingNumIndexedCols": "-1"},
        )
        assert len(_stats_cols(t)) == 40

    def test_explicit_stats_columns(self, spark, tmp_path):
        df = spark.createDataFrame([(1, 2, 3)], "a int, b int, c int")
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / "x"), df,
            properties={"delta.dataSkippingStatsColumns": "b, `c`"},
        )
        assert _stats_cols(t) == {"b", "c"}

    def test_set_property_changes_future_writes(self, spark, tmp_path):
        df = spark.createDataFrame([(1, 2, 3)], "a int, b int, c int")
        t = DeltaProtocolTable.create(spark, str(tmp_path / "p"), df)
        t.set_properties({"delta.dataSkippingStatsColumns": "c"})
        t.append(df)
        snap = t.snapshot()
        per_file = sorted(
            tuple(sorted(json.loads(a["stats"])["minValues"]))
            for a in snap.files.values()
        )
        # the old file keeps its full stats; the new one carries c only
        assert per_file == [("a", "b", "c"), ("c",)]

    def test_pruning_still_works_on_indexed_column(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(i, i * 10) for i in range(100)], "k int, v int"
        ).repartition(4, "k")
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / "pr"), df,
            properties={"delta.dataSkippingStatsColumns": "k"},
        )
        assert t.to_df().where("k = 5").count() == 1
        res = t.delete_where("k = 5")
        assert res["touched_files"] <= res["total_files"]
        assert t.to_df().count() == 99

    def test_long_string_stats_truncate(self, spark, tmp_path):
        long_a = "a" * 500
        long_z = "z" * 500 + "tail"
        df = spark.createDataFrame(
            [(1, long_a), (2, long_z)], "k int, text string"
        ).coalesce(1)
        t = DeltaProtocolTable.create(spark, str(tmp_path / "t"), df)
        a = next(iter(t.snapshot().files.values()))
        st = json.loads(a["stats"])
        assert st["minValues"]["text"] == "a" * 32
        # max truncates by BUMPING the last code point ('z' → '{') —
        # strictly above every string sharing the prefix
        assert st["maxValues"]["text"] == "z" * 31 + "{"
        assert len(a["stats"]) < 500  # the content never ships
        # the truncated bounds stay VALID: both real values fall inside
        assert st["minValues"]["text"] <= long_a
        assert st["maxValues"]["text"] >= long_z
        # and a predicate on the column still finds its rows
        assert t.to_df().where(
            f"text = '{long_z}'"
        ).count() == 1

    def test_supplementary_plane_max_bound_valid(self, spark, tmp_path):
        """The r14 review's counterexample: a >32-char value whose
        33rd char is an emoji (supplementary plane). A U+FFFF sentinel
        would sort BELOW it and let merge pruning wrongly skip the
        file; the bumped prefix stays a strict upper bound."""
        val = "A" * 32 + "\U0001F600" + "tail"
        df = spark.createDataFrame(
            [(1, val)], "k int, text string"
        ).coalesce(1)
        t = DeltaProtocolTable.create(spark, str(tmp_path / "e"), df)
        st = json.loads(
            next(iter(t.snapshot().files.values()))["stats"]
        )
        assert st["maxValues"]["text"] == "A" * 31 + "B"
        assert st["maxValues"]["text"] > val
        # the real proof: a keyed MERGE on that exact value must NOT
        # prune the file away
        from mack_spark.tables import KeyedMerge

        src = spark.createDataFrame([(val,)], "text string")
        t.merge(KeyedMerge(
            source=src,
            condition="t.text = s.text",
            target_alias="t", source_alias="s",
            target_key_col="text", source_key_col="text",
            matched_update={"k": "99"},
        ))
        assert t.to_df().collect()[0]["k"] == 99

    def test_bump_string_prefix_edges(self):
        from mack_spark.sources.delta_log import _bump_string_prefix

        assert _bump_string_prefix("abc") == "abd"
        # surrogate gap skipped: U+D7FF bumps to U+E000
        assert _bump_string_prefix("a퟿") == "a"
        # max code point: carry left
        assert _bump_string_prefix("a\U0010FFFF") == "b"
        assert _bump_string_prefix("\U0010FFFF" * 3) is None

    def test_mapped_table_explicit_logical_names(self, spark, tmp_path):
        df = spark.createDataFrame([(1, 2)], "a int, b int")
        t = DeltaProtocolTable.create(spark, str(tmp_path / "m"), df)
        t.enable_column_mapping()
        t.set_properties({"delta.dataSkippingStatsColumns": "b"})
        t.append(df)
        snap = t.snapshot()
        phys_b = snap.physical_names()["b"]
        newest = json.loads(
            max(snap.files.values(), key=lambda a: a["modificationTime"])
            ["stats"]
        )
        assert set(newest["minValues"]) == {phys_b}
