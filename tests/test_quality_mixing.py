"""Tests for the round-5 pipeline additions: Gopher-style quality
gates (operators/quality.py), data mixing (operators/mixing.py),
training shards (operators/shard.py), and duplicated n-gram spans
(operators/dedup_text.py)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from mack_spark.operators.dedup_text import duplicated_ngram_spans
from mack_spark.operators.mixing import apply_mix, mix_allocation, mix_report
from mack_spark.operators.quality import gopher_quality_flags, quality_by_source
from mack_spark.operators.shard import (
    assign_shards,
    shard_manifest,
    write_training_shards,
)


def _docs(spark):
    rows = [
        # 25 words, mean len ok, has stopwords -> passes
        (0, " ".join(["the"] + ["word"] * 24), "s0"),
        # 5 words -> fails word count
        (1, "the quick brown fox jumps", "s0"),
        # 25 words but no stopwords -> fails stop ratio
        (2, " ".join(["word"] * 25), "s1"),
        # 25 single-char words: mean_word_len 1.0 -> fails mean len
        (3, " ".join(["a"] * 25), "s1"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


class TestGopherQuality:
    def test_flags_per_gate(self, spark):
        out = {
            r["doc_id"]: r
            for r in gopher_quality_flags(_docs(spark), min_words=20).collect()
        }
        assert out[0]["passes"] and out[0]["flag_word_count"]
        assert not out[1]["flag_word_count"] and not out[1]["passes"]
        assert not out[2]["flag_stop_ratio"] and not out[2]["passes"]
        # doc 3 is all 'a' (a stopword): stop gate passes, mean len fails
        assert out[3]["flag_stop_ratio"] and not out[3]["flag_mean_word_len"]
        assert not out[3]["passes"]

    def test_metric_values(self, spark):
        r = {
            x["doc_id"]: x
            for x in gopher_quality_flags(_docs(spark), min_words=20).collect()
        }
        assert r[1]["n_words"] == 5
        assert r[1]["mean_word_len"] == pytest.approx((3 + 5 + 5 + 3 + 5) / 5)
        assert r[1]["stop_ratio"] == pytest.approx(0.2)
        assert r[3]["mean_word_len"] == 1.0
        assert r[3]["stop_ratio"] == 1.0

    def test_rollup(self, spark):
        out = {
            r["source"]: r
            for r in quality_by_source(_docs(spark), min_words=20).collect()
        }
        assert out["s0"]["n_docs"] == 2 and out["s0"]["n_pass"] == 1
        assert out["s0"]["pass_rate"] == 0.5
        assert out["s1"]["n_pass"] == 0 and out["s1"]["pass_rate"] == 0.0

    def test_map_only_plan(self, spark):
        plan = gopher_quality_flags(_docs(spark))._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


def _mix_docs(spark):
    rows = []
    for i in range(100):
        src = f"s{i % 2}"
        rows.append((i, " ".join(["w"] * 10), src))
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


class TestMixing:
    def test_allocation_math(self, spark):
        docs = _mix_docs(spark)  # 1000 tokens, 500 per source
        plan = {
            r["source"]: r
            for r in mix_allocation(
                docs, {"s0": 3.0, "s1": 1.0}, budget_fraction=0.8
            ).collect()
        }
        # total 1000 * 0.8 = 800; s0 target 600 > 500 avail -> rate capped
        assert plan["s0"]["avail_tokens"] == 500
        assert plan["s0"]["target_tokens"] == 600
        assert plan["s0"]["rate"] >= 1.0 and plan["s0"]["threshold_hex"] == "g"
        assert plan["s1"]["target_tokens"] == 200
        assert 0 < plan["s1"]["rate"] < 1

    def test_weight_zero_source_dropped(self, spark):
        docs = _mix_docs(spark)
        plan = mix_allocation(docs, {"s0": 1.0})
        assert [r["source"] for r in plan.collect()] == ["s0"]
        kept = apply_mix(docs, plan, ["doc_id"])
        assert kept.filter("source = 's1'").count() == 0

    def test_apply_is_deterministic_across_partitioning(self, spark):
        docs = _mix_docs(spark)
        plan = mix_allocation(docs, {"s0": 1.0, "s1": 1.0}, budget_fraction=0.5)
        a = sorted(r["doc_id"] for r in apply_mix(docs, plan, ["doc_id"]).collect())
        b = sorted(
            r["doc_id"]
            for r in apply_mix(docs.repartition(7), plan, ["doc_id"]).collect()
        )
        assert a == b and len(a) > 0

    def test_keep_rule_matches_reference_md5(self, spark):
        docs = _mix_docs(spark)
        plan = mix_allocation(docs, {"s0": 1.0, "s1": 1.0}, budget_fraction=0.5)
        th = {r["source"]: r["threshold_hex"] for r in plan.collect()}
        kept = {r["doc_id"] for r in apply_mix(docs, plan, ["doc_id"]).collect()}
        for i in range(100):
            h = hashlib.md5(f"mix||{i}".encode()).hexdigest()[:8]
            assert (i in kept) == (h < th[f"s{i % 2}"])

    def test_report_totals(self, spark):
        docs = _mix_docs(spark)
        rep = mix_report(
            docs, {"s0": 1.0, "s1": 1.0}, ["doc_id"], budget_fraction=0.5
        ).collect()
        assert len(rep) == 2
        for r in rep:
            assert r["kept_tokens"] <= r["avail_tokens"]
            assert r["kept_docs"] * 10 == r["kept_tokens"]

    def test_errors(self, spark):
        docs = _mix_docs(spark)
        with pytest.raises(ValueError, match="non-empty"):
            mix_allocation(docs, {})
        with pytest.raises(ValueError, match="budget_fraction"):
            mix_allocation(docs, {"s0": 1.0}, budget_fraction=0.0)

    def test_broadcast_plan(self, spark):
        docs = _mix_docs(spark)
        plan = mix_allocation(docs, {"s0": 1.0, "s1": 1.0})
        phys = apply_mix(docs, plan, ["doc_id"])._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in phys


class TestShards:
    def test_assignment_deterministic_and_bounded(self, spark):
        docs = _mix_docs(spark)
        out = assign_shards(docs, ["doc_id"]).collect()
        for r in out:
            h = hashlib.md5(f"shard||{r['doc_id']}".encode()).hexdigest()
            assert r["shard_id"] == int(h[0], 16)
            assert r["order_key"] == h[1:9]

    def test_hex_digits_2(self, spark):
        docs = _mix_docs(spark)
        out = assign_shards(docs, ["doc_id"], hex_digits=2).collect()
        for r in out:
            h = hashlib.md5(f"shard||{r['doc_id']}".encode()).hexdigest()
            assert r["shard_id"] == int(h[:2], 16)
        with pytest.raises(ValueError, match="hex_digits"):
            assign_shards(docs, ["doc_id"], hex_digits=3)

    def test_manifest_counts(self, spark):
        docs = _mix_docs(spark)
        man = shard_manifest(docs, ["doc_id"]).collect()
        assert sum(r["n_docs"] for r in man) == 100
        assert sum(r["token_sum"] for r in man) == 1000
        for r in man:
            assert r["first_key"] <= r["last_key"]

    def test_write_roundtrip_sorted(self, spark, tmp_path):
        docs = _mix_docs(spark)
        path = str(tmp_path / "shards")
        write_training_shards(docs, path, ["doc_id"])
        back = spark.read.parquet(path)
        assert back.count() == 100
        # every shard's file order equals order_key order
        import pyarrow.parquet as pq
        import glob

        for f in glob.glob(f"{path}/shard_id=*/*.parquet"):
            keys = pq.read_table(f, columns=["order_key"])["order_key"].to_pylist()
            assert keys == sorted(keys)


class TestNgramSpans:
    def test_exact_spans(self, spark):
        rows = [
            (1, "a b c d e"),
            (2, "x a b c y"),
            (3, "a b c d z"),
            (4, "q r"),  # shorter than the span: emits nothing
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {
            r["span"]: (r["n_docs"], r["n_occurrences"])
            for r in duplicated_ngram_spans(df, span_words=3, min_docs=2).collect()
        }
        assert out["a b c"] == (3, 3)
        assert out["b c d"] == (2, 2)
        assert "c d e" not in out  # single doc
        assert "q r" not in out

    def test_occurrences_count_repeats_within_doc(self, spark):
        df = spark.createDataFrame(
            [(1, "p q p q p q"), (2, "p q z")], ["doc_id", "text"]
        )
        out = {
            r["span"]: (r["n_docs"], r["n_occurrences"])
            for r in duplicated_ngram_spans(df, span_words=2, min_docs=2).collect()
        }
        assert out["p q"] == (2, 4)  # 3 sliding occurrences in doc1 + 1 in doc2

    def test_top_limit_order(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c d"), (2, "a b c d"), (3, "b c d e"), (4, "b c d e"),
             (5, "b c d x")],
            ["doc_id", "text"],
        )
        rows = duplicated_ngram_spans(df, span_words=3, min_docs=2, top=1).collect()
        assert len(rows) == 1
        # "b c d" occurs in all 5 docs; the runner-up spans only in 2
        assert rows[0]["span"] == "b c d" and rows[0]["n_docs"] == 5

    def test_span_words_validation(self, spark):
        df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
        with pytest.raises(ValueError, match="span_words"):
            duplicated_ngram_spans(df, span_words=1)


class TestEmbeddingCentroids:
    def test_exact_means_and_order_independence(self, spark):
        from mack_spark.operators.similarity import embedding_centroids

        rows = [
            (1, [1.0, 2.0, 3.0], 0),
            (2, [3.0, 2.0, 1.0], 0),
            (3, [10.0, 0.0, -2.0], 1),
        ]
        df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
        out = {r["label"]: r for r in embedding_centroids(df).collect()}
        assert out[0]["n_vectors"] == 2
        assert out[0]["centroid"] == [2.0, 2.0, 2.0]
        assert out[1]["centroid"] == [10.0, 0.0, -2.0]
        # partitioning must not change a single bit of the result
        out2 = {
            r["label"]: r
            for r in embedding_centroids(df.repartition(5)).collect()
        }
        assert out2[0]["centroid"] == out[0]["centroid"]

    def test_negative_components_fixpoint(self, spark):
        from mack_spark.operators.similarity import embedding_centroids

        df = spark.createDataFrame(
            [(1, [-0.5], 0), (2, [0.25], 0)], ["vec_id", "embedding", "label"]
        )
        (r,) = embedding_centroids(df).collect()
        # floor(-0.5e6) + floor(0.25e6) = -500000 + 250000 -> -0.125
        assert r["centroid"] == [-0.125]


class TestPlanGuards:
    """Explain-output pins: de-optimizations of the new operators fail
    here instead of surfacing as a noisy bench regression."""

    def test_ngram_spans_no_global_sort(self, spark):
        df = spark.createDataFrame([(1, "a b c d e f g h i")], ["doc_id", "text"])
        plan = (
            duplicated_ngram_spans(df, span_words=3)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # top-N must ride TakeOrderedAndProject (per-partition top-k),
        # never a global Sort+Limit
        assert "TakeOrderedAndProject" in plan
        # the aggregation must have a map-side partial phase
        assert "partial_count" in plan

    def test_shard_manifest_partial_agg(self, spark):
        docs = _mix_docs(spark)
        plan = shard_manifest(docs, ["doc_id"])._jdf.queryExecution().executedPlan().toString()
        assert "partial_count" in plan  # 16 rows per map task cross the wire

    def test_centroids_partial_agg(self, spark):
        from mack_spark.operators.similarity import embedding_centroids

        df = spark.createDataFrame([(1, [1.0, 2.0], 0)], ["vec_id", "embedding", "label"])
        plan = embedding_centroids(df)._jdf.queryExecution().executedPlan().toString()
        assert "partial_sum" in plan


class TestMixingProperties:
    def test_allocation_sums_to_budget(self, spark):
        """Over a sweep of weightings, allocated targets must sum to the
        budget up to per-source floor error, and never exceed it."""
        docs = _mix_docs(spark)  # 1000 tokens total
        for weights, frac in [
            ({"s0": 1.0, "s1": 1.0}, 0.5),
            ({"s0": 5.0, "s1": 1.0}, 0.9),
            ({"s0": 0.3, "s1": 0.7}, 0.33),
            ({"s0": 2.5, "s1": 7.5}, 1.0),
        ]:
            plan = mix_allocation(docs, weights, budget_fraction=frac).collect()
            total_target = sum(r["target_tokens"] for r in plan)
            budget = int(frac * 1000)
            assert budget - len(plan) <= total_target <= budget

    def test_ngram_spans_vs_bruteforce(self, spark):
        """Random small corpora: the distributed census equals a pure
        Python sliding-window reference."""
        import itertools
        import random

        rng = random.Random(7)
        vocab = ["u", "v", "w", "x", "y"]
        for trial in range(5):
            docs = [
                (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12))))
                for i in range(8)
            ]
            n = 3
            expected = {}
            for i, text in docs:
                ws = text.split(" ")
                for j in range(len(ws) - n + 1):
                    span = " ".join(ws[j : j + n])
                    d, c = expected.get(span, (set(), 0))
                    d.add(i)
                    expected[span] = (d | {i}, c + 1)
            expected = {
                s: (len(d), c) for s, (d, c) in expected.items() if len(d) >= 2
            }
            df = spark.createDataFrame(docs, ["doc_id", "text"])
            got = {
                r["span"]: (r["n_docs"], r["n_occurrences"])
                for r in duplicated_ngram_spans(
                    df, span_words=n, min_docs=2, top=10_000
                ).collect()
            }
            assert got == expected, f"trial {trial}: {got} != {expected}"


class TestSpanStrip:
    def test_owner_keeps_others_stripped(self, spark):
        from mack_spark.operators.dedup_text import strip_duplicate_spans

        rows = [
            (1, "a b c d e f g h i"),          # owner of the 8-gram
            (2, "z a b c d e f g h w"),        # interior copy stripped
            (3, "a b c d e f g h"),            # fully covered -> empty
            (4, "q r s"),                      # too short, untouched
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {
            r["doc_id"]: (r["text_stripped"], r["n_removed"])
            for r in strip_duplicate_spans(df, span_words=8).collect()
        }
        assert out[1] == ("a b c d e f g h i", 0)
        assert out[2] == ("z w", 8)
        assert out[3] == ("", 8)
        assert out[4] == ("q r s", 0)

    def test_overlapping_coverage_union(self, spark):
        from mack_spark.operators.dedup_text import strip_duplicate_spans

        # doc 2 contains the duplicated 3-gram twice, overlapping once
        # ("x y x y x" covers via spans at pos0 and pos2)
        rows = [(1, "x y x"), (2, "x y x y x"), (3, "p q r")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {
            r["doc_id"]: (r["text_stripped"], r["n_removed"])
            for r in strip_duplicate_spans(df, span_words=3).collect()
        }
        assert out[1] == ("x y x", 0)  # owner
        assert out[2] == ("", 5)  # union of pos0-2 and pos2-4
        assert out[3] == ("p q r", 0)

    def test_validation(self, spark):
        from mack_spark.operators.dedup_text import strip_duplicate_spans

        df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
        with pytest.raises(ValueError, match="span_words"):
            strip_duplicate_spans(df, span_words=1)
        with pytest.raises(ValueError, match="min_docs"):
            strip_duplicate_spans(df, min_docs=1)


class TestClusterBalance:
    def test_shares_sum_to_one_and_kmeans_mode(self, spark):
        from mack_spark.operators.similarity import cluster_balance

        rows = [(i, [float(i % 4), float((i * 3) % 5), 1.0], 0) for i in range(40)]
        df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
        out = cluster_balance(df, n_cells=4).collect()
        assert sum(r["n_vectors"] for r in out) == 40
        assert abs(sum(r["share"] for r in out) - 1.0) < 1e-6
        # kmeans quantizer mode runs too (rows-only determinism)
        out2 = cluster_balance(df, n_cells=4, centroids="kmeans", seed=1).collect()
        assert sum(r["n_vectors"] for r in out2) == 40


class TestRetentionCohorts:
    def test_matrix(self, spark):
        import datetime as dt

        from mack_spark.operators.cohort import retention_cohorts

        mon = dt.datetime(2024, 1, 1)  # a Monday
        rows = []
        # cohort A: users 1,2 first seen week 0; user 1 returns week 1
        rows += [(1, mon), (2, mon + dt.timedelta(days=2))]
        rows += [(1, mon + dt.timedelta(days=8))]
        # cohort B: user 3 first seen week 1, returns weeks 2 and 3
        rows += [(3, mon + dt.timedelta(days=7 + i * 7)) for i in range(3)]
        df = spark.createDataFrame(rows, ["user_id", "ts"])
        out = {
            (str(r["cohort_week"]), r["weeks_since"]): r
            for r in retention_cohorts(df).collect()
        }
        a, b = "2024-01-01", "2024-01-08"
        assert out[(a, 0)]["n_active_users"] == 2
        assert out[(a, 0)]["retention"] == 1.0
        assert out[(a, 1)]["n_active_users"] == 1
        assert out[(a, 1)]["retention"] == 0.5
        assert out[(b, 0)]["cohort_size"] == 1
        assert out[(b, 2)]["retention"] == 1.0
        assert (a, 2) not in out  # nobody from cohort A in week 2

    def test_multiple_events_one_week_count_once(self, spark):
        import datetime as dt

        from mack_spark.operators.cohort import retention_cohorts

        mon = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [(1, mon), (1, mon + dt.timedelta(hours=5)), (1, mon + dt.timedelta(days=3))],
            ["user_id", "ts"],
        )
        (r,) = retention_cohorts(df).collect()
        assert r["n_active_users"] == 1 and r["weeks_since"] == 0


class TestNumericCorrelations:
    def test_known_values_and_partition_independence(self, spark):
        from mack_spark.operators.profile import numeric_correlations

        rows = [(float(i), float(2 * i), float(-i), 5.0) for i in range(50)]
        df = spark.createDataFrame(rows, ["a", "b", "c", "d"])
        out = {
            (r["col_a"], r["col_b"]): r["corr"]
            for r in numeric_correlations(df, ["a", "b", "c"]).collect()
        }
        assert out[("a", "b")] == 1.0
        assert out[("a", "c")] == -1.0
        out2 = {
            (r["col_a"], r["col_b"]): r["corr"]
            for r in numeric_correlations(
                df.repartition(7), ["a", "b", "c"]
            ).collect()
        }
        assert out == out2  # exact sums -> bit-identical under reshuffle

    def test_nulls_excluded_pairwise(self, spark):
        from mack_spark.operators.profile import numeric_correlations

        rows = [(1.0, 2.0), (2.0, None), (3.0, 6.0), (4.0, 8.0)]
        df = spark.createDataFrame(rows, "a double, b double")
        (r,) = numeric_correlations(df, ["a", "b"]).collect()
        assert r["n"] == 3 and r["corr"] == 1.0

    def test_validation(self, spark):
        from mack_spark.operators.profile import numeric_correlations

        df = spark.createDataFrame([(1.0,)], ["a"])
        with pytest.raises(ValueError, match="two columns"):
            numeric_correlations(df, ["a"])


class TestSpanStripProperty:
    def test_vs_python_reference_random_corpora(self, spark):
        """Random small corpora: the distributed strip equals a pure
        Python implementation of owner-keeps / coverage-union removal."""
        import random

        from mack_spark.operators.dedup_text import strip_duplicate_spans

        def reference(docs, k):
            spans = {}
            toks = {i: t.split(" ") for i, t in docs}
            for i, ws in toks.items():
                for j in range(len(ws) - k + 1):
                    spans.setdefault(" ".join(ws[j : j + k]), set()).add(i)
            dup = {s: min(d) for s, d in spans.items() if len(d) >= 2}
            out = {}
            for i, ws in toks.items():
                cov = set()
                for j in range(len(ws) - k + 1):
                    s = " ".join(ws[j : j + k])
                    if s in dup and dup[s] != i:
                        cov.update(range(j, j + k))
                kept = [w for j, w in enumerate(ws) if j not in cov]
                out[i] = (" ".join(kept), len(ws) - len(kept))
            return out

        rng = random.Random(99)
        vocab = ["u", "v", "w", "x"]
        for trial in range(4):
            docs = [
                (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 14))))
                for i in range(10)
            ]
            df = spark.createDataFrame(docs, ["doc_id", "text"])
            got = {
                r["doc_id"]: (r["text_stripped"], r["n_removed"])
                for r in strip_duplicate_spans(df, span_words=3).collect()
            }
            assert got == reference(docs, 3), f"trial {trial}"


class TestPercentilesMulti:
    def test_equals_single_column_version(self, spark):
        import random

        from mack_spark.operators.profile import (
            exact_percentiles,
            exact_percentiles_multi,
        )

        rng = random.Random(5)
        rows = [
            (float(rng.randint(0, 50)), float(rng.randint(0, 9)),
             rng.random() * 100 if rng.random() > 0.1 else None)
            for _ in range(500)
        ]
        df = spark.createDataFrame(rows, "a double, b double, c double")
        ps = (0.25, 0.5, 0.75, 0.9)
        multi = {
            (r["metric"], r["p"]): r["value"]
            for r in exact_percentiles_multi(df, ["a", "b", "c"], ps=ps).collect()
        }
        for col in ("a", "b", "c"):
            single = {
                r["p"]: float(r["value"])
                for r in exact_percentiles(df, col, ps=ps).collect()
            }
            for p in ps:
                assert multi[(col, p)] == single[p], (col, p)

    def test_empty_metric_omitted(self, spark):
        from mack_spark.operators.profile import exact_percentiles_multi

        df = spark.createDataFrame(
            [(1.0, None), (2.0, None)], "a double, b double"
        )
        out = exact_percentiles_multi(df, ["a", "b"], ps=(0.5,)).collect()
        assert {r["metric"] for r in out} == {"a"}
