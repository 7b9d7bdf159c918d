"""Token-budget sequence packing (operators/packing.py): next-fit
semantics, determinism under shuffling, oversize docs, stats audit."""

import pytest
from pyspark.sql import functions as F

from mack_spark.operators.packing import pack_sequences, packing_stats


def _docs(spark, counts, group="g"):
    rows = [(group, i, "x " * int(n)) for i, n in enumerate(counts)]
    return spark.createDataFrame(rows, "src string, doc_id int, text string")


class TestPacking:
    def test_next_fit_walk(self, spark):
        # budget 10: [4,5,3,10,2] -> seq0:[4@0,5@4], seq1:[3@0], wait 3 fits
        # after 9? 9+3>10 -> seq1:[3@0], then 10 -> 3+10>10 -> seq2:[10@0],
        # then 2 -> 10+2>10 -> seq3:[2@0]
        df = _docs(spark, [4, 5, 3, 10, 2])
        out = {
            r["doc_id"]: (r["seq_id"], r["seq_offset"])
            for r in pack_sequences(df, ["src"], budget=10).collect()
        }
        assert out == {0: (0, 0), 1: (0, 4), 2: (1, 0), 3: (2, 0), 4: (3, 0)}

    def test_oversize_doc_gets_own_sequence(self, spark):
        df = _docs(spark, [3, 50, 3])
        out = {
            r["doc_id"]: (r["seq_id"], r["seq_offset"])
            for r in pack_sequences(df, ["src"], budget=10).collect()
        }
        assert out == {0: (0, 0), 1: (1, 0), 2: (2, 0)}

    def test_partition_independent(self, spark):
        df = _docs(spark, [7, 2, 9, 1, 5, 5, 4])
        a = sorted(
            map(tuple, pack_sequences(df, ["src"], budget=12).collect())
        )
        b = sorted(
            map(
                tuple,
                pack_sequences(df.repartition(7), ["src"], budget=12).collect(),
            )
        )
        assert a == b

    def test_groups_pack_independently(self, spark):
        rows = [("a", 0, "x x x"), ("b", 1, "x x x x"), ("a", 2, "x x")]
        df = spark.createDataFrame(rows, "src string, doc_id int, text string")
        out = {
            (r["src"], r["doc_id"]): (r["seq_id"], r["seq_offset"])
            for r in pack_sequences(df, ["src"], budget=5).collect()
        }
        assert out == {("a", 0): (0, 0), ("a", 2): (0, 3), ("b", 1): (0, 0)}

    def test_precomputed_counts_and_validation(self, spark):
        df = spark.createDataFrame(
            [("g", 1, 6), ("g", 2, 6)], "src string, doc_id int, ntok int"
        )
        out = pack_sequences(
            df, ["src"], budget=10, token_count_col="ntok"
        ).collect()
        assert {r["seq_id"] for r in out} == {0, 1}
        with pytest.raises(ValueError, match="group_cols"):
            pack_sequences(df, [], token_count_col="ntok")
        with pytest.raises(ValueError, match="budget"):
            pack_sequences(df, ["src"], budget=0, token_count_col="ntok")

    def test_stats_utilization(self, spark):
        df = _docs(spark, [8, 8, 4])  # budget 10 -> seqs [8],[8],[4]... no:
        # 8 -> seq0@0; 8 -> 8+8>10 seq1@0; 4 -> 8+4>10 seq2@0
        packed = pack_sequences(df, ["src"], budget=10)
        stats = packing_stats(packed, ["src"], budget=10).collect()[0]
        assert stats["n_sequences"] == 3 and stats["n_docs"] == 3
        assert stats["utilization"] == round((8 + 8 + 4) / 30, 6)
