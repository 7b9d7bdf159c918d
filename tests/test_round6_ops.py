"""Round-6 operators: banded cosine near-dup, IQR outlier fences,
equal-frequency histogram, event debounce."""

import pytest
from pyspark.sql import functions as F


class TestBandedNearDup:
    def test_recall_superset_of_single_table_and_exact_filter(self, spark):
        """Banded candidates OR over tables: with enough tables the
        banded form must recover pairs a single coarse table misses,
        and every reported pair must truly clear the threshold."""
        from mack_spark.operators.similarity import (
            brute_force_topk,
            embedding_near_dup_pairs_banded,
        )

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        got = embedding_near_dup_pairs_banded(
            emb, threshold=0.3, n_tables=3, bits_per_table=6
        )
        rows = got.collect()
        assert len(rows) > 0
        assert all(r.cos_sim >= 0.3 for r in rows)
        assert all(r.id_a < r.id_b for r in rows)
        # distinct pairs even when they collide in several tables
        assert len({(r.id_a, r.id_b) for r in rows}) == len(rows)

    def test_more_tables_more_recall(self, spark):
        from mack_spark.operators.similarity import embedding_near_dup_pairs_banded

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        one = embedding_near_dup_pairs_banded(
            emb, threshold=0.3, n_tables=1, bits_per_table=6
        ).count()
        three = embedding_near_dup_pairs_banded(
            emb, threshold=0.3, n_tables=3, bits_per_table=6
        ).count()
        assert three >= one

    def test_scale_aware_bits_default(self, spark):
        """bits_per_table=None derives from the corpus count."""
        from mack_spark.operators.similarity import embedding_near_dup_pairs_banded

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        out = embedding_near_dup_pairs_banded(emb, threshold=0.3, n_tables=2)
        assert out.count() >= 0  # 500 rows -> bits=1, still well-formed


class TestOutlierFences:
    def test_fences_on_known_distribution(self, spark):
        from mack_spark.operators.profile import numeric_outlier_fences

        # 1..100 plus two wild outliers
        df = spark.createDataFrame(
            [(float(i),) for i in range(1, 101)] + [(1000.0,), (-1000.0,)],
            "x double",
        )
        r = numeric_outlier_fences(df, ["x"]).collect()[0]
        # nearest-rank over the 102 sorted values [-1000, 1..100, 1000]:
        # q1 = 26th = 25.0, q3 = ceil(76.5)=77th = 76.0
        assert r.q1 == 25.0 and r.q3 == 76.0
        assert r.lo_fence == 25.0 - 1.5 * 51.0
        assert r.hi_fence == 76.0 + 1.5 * 51.0
        assert r.n_below == 1 and r.n_above == 1 and r.n_rows == 102

    def test_all_null_column_omitted(self, spark):
        from mack_spark.operators.profile import numeric_outlier_fences

        df = spark.createDataFrame(
            [(1.0, None), (2.0, None)], "x double, y double"
        )
        out = numeric_outlier_fences(df, ["x", "y"])
        assert [r.metric for r in out.collect()] == ["x"]


class TestEqualFrequencyHistogram:
    def test_uniform_buckets(self, spark):
        from mack_spark.operators.profile import equal_frequency_histogram

        df = spark.createDataFrame([(i,) for i in range(1, 101)], "v long")
        rows = equal_frequency_histogram(df, "v", 10).collect()
        assert [r.bucket for r in rows] == list(range(1, 11))
        assert all(r.n_rows == 10 for r in rows)
        # bucket 1 open-ended low, bucket 10 open-ended high
        assert rows[0].lo is None and rows[-1].hi is None
        assert rows[0].hi == 10.0 and rows[1].lo == 10.0

    def test_heavy_ties_stay_one_bucket(self, spark):
        from mack_spark.operators.profile import equal_frequency_histogram

        df = spark.createDataFrame(
            [(1,)] * 95 + [(i,) for i in range(2, 7)], "v long"
        )
        rows = equal_frequency_histogram(df, "v", 10).collect()
        by_bucket = {r.bucket: r for r in rows}
        # the tied value never splits: bucket 1 holds all 95 ones
        assert by_bucket[1].n_rows == 95
        assert by_bucket[1].min_value == 1.0 and by_bucket[1].max_value == 1.0


class TestEventDebounce:
    def test_burst_heads_and_counts(self, spark):
        from mack_spark.operators.sessionize import event_debounce

        rows = [
            # user 1, click burst of 3 within 300s, then a fresh one
            (1, 1, "click", "2024-01-01 10:00:00"),
            (2, 1, "click", "2024-01-01 10:02:00"),
            (3, 1, "click", "2024-01-01 10:04:00"),
            (4, 1, "click", "2024-01-01 11:00:00"),
            # same user, other type: independent
            (5, 1, "view", "2024-01-01 10:01:00"),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, ts string"
        ).withColumn("ts", F.to_timestamp("ts"))
        out = {r.event_id: r for r in event_debounce(df).collect()}
        assert set(out) == {1, 4, 5}
        assert out[1].n_suppressed == 2
        assert out[4].n_suppressed == 0
        assert out[5].n_suppressed == 0

    def test_gap_boundary_is_strict(self, spark):
        from mack_spark.operators.sessionize import event_debounce

        rows = [
            (1, 1, "click", "2024-01-01 10:00:00"),
            (2, 1, "click", "2024-01-01 10:05:00"),  # exactly 300s: same burst
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, ts string"
        ).withColumn("ts", F.to_timestamp("ts"))
        out = event_debounce(df, debounce_seconds=300).collect()
        assert len(out) == 1 and out[0].event_id == 1 and out[0].n_suppressed == 1


class TestNgramContainment:
    def test_subset_copy_scores_full_containment(self, spark):
        """A doc fully pasted inside a much larger doc: Jaccard dilutes,
        containment hits 1.0."""
        from mack_spark.operators.dedup_text import (
            ngram_containment_pairs,
            ngram_jaccard_pairs,
        )

        small = "alpha beta gamma delta epsilon zeta"
        big = small + " " + " ".join(f"w{i} x{i} y{i}" for i in range(30))
        df = spark.createDataFrame(
            [(1, small), (2, big)], "doc_id long, text string"
        )
        cont = ngram_containment_pairs(df, min_containment=0.9).collect()
        assert len(cont) == 1
        r = cont[0]
        assert (r.id_a, r.id_b) == (1, 2) and r.containment == 1.0
        jac = ngram_jaccard_pairs(df, min_jaccard=0.0).collect()[0]
        assert jac.jaccard < 0.1  # the dilution containment exists to fix

    def test_candidate_bounded(self, spark):
        from mack_spark.operators.dedup_text import ngram_containment_pairs

        df = spark.createDataFrame(
            [(1, "a b c d e f"), (2, "a b c d e f"), (3, "q r s t u v")],
            "doc_id long, text string",
        )
        cands = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        out = ngram_containment_pairs(df, candidates=cands).collect()
        assert {(r.id_a, r.id_b) for r in out} == {(1, 2)}


class TestLangSplitConsistency:
    def test_mixed_doc_flagged(self, spark):
        from mack_spark.operators.textstats import lang_split_consistency

        en = "the cat sat of the mat and the dog is in the house to stay"
        de = "der hund ist nicht das problem und die katze ist ein tier"
        df = spark.createDataFrame(
            [
                (1, en + " " + de),   # half en, half de -> mixed
                (2, en + " " + en),   # en throughout
                (3, "zz qq ww"),      # no stopwords -> und, never mixed
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in lang_split_consistency(df).collect()}
        assert out[1].is_mixed and out[1].lang_first == "en" and out[1].lang_second == "de"
        assert not out[2].is_mixed and out[2].lang_first == "en"
        assert not out[3].is_mixed and out[3].lang_first == "und"

    def test_empty_and_single_token(self, spark):
        from mack_spark.operators.textstats import lang_split_consistency

        df = spark.createDataFrame(
            [(1, ""), (2, "the")], "doc_id long, text string"
        )
        out = {r.doc_id: r for r in lang_split_consistency(df).collect()}
        # 1-token doc: first half empty (und), second half holds the token
        assert out[1].lang_first == "und" and not out[1].is_mixed
        assert out[2].lang_first == "und" and out[2].lang_second == "en"
        assert not out[2].is_mixed


class TestIndexAppend:
    def test_lsh_append_equals_rebuild(self, spark, tmp_path):
        """Probing after append_to_lsh_index == probing a full rebuild
        over corpus+batch (banding is per-doc; nothing goes stale)."""
        from mack_spark.operators.dedup_text import (
            append_to_lsh_index,
            build_lsh_index,
            lsh_pairs_against_index,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        base = docs.filter("doc_id % 5 IN (1, 2)")
        batch = docs.filter("doc_id % 5 = 3")
        probe = docs.filter("doc_id % 5 = 0")

        idx = build_lsh_index(base, str(tmp_path / "inc"))
        append_to_lsh_index(idx, batch)
        got = {
            (r.new_id, r.old_id, r.est_jaccard)
            for r in lsh_pairs_against_index(idx, probe).collect()
        }
        full = build_lsh_index(
            base.unionByName(batch), str(tmp_path / "full")
        )
        want = {
            (r.new_id, r.old_id, r.est_jaccard)
            for r in lsh_pairs_against_index(full, probe).collect()
        }
        assert got == want and len(want) > 0

    def test_ivf_append_equals_rebuild_with_frozen_centroids(self, spark, tmp_path):
        """'first' centroids come from the lowest ids, which live in the
        base corpus — so a rebuild over base+batch picks the SAME
        centroids and must agree with the appended index exactly."""
        from mack_spark.operators.similarity import (
            append_to_ivf_index,
            build_ivf_index,
            ivf_topk_from_index,
        )

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        base = emb.filter("vec_id < 400")
        batch = emb.filter("vec_id >= 400")
        queries = emb.filter("vec_id % 100 = 7")

        idx = build_ivf_index(
            base, str(tmp_path / "ivf_inc"), n_cells=4, centroids="first"
        )
        append_to_ivf_index(idx, batch)
        got = {
            (r.query_id, r.neighbor_id, r.rank)
            for r in ivf_topk_from_index(idx, queries, k=5).collect()
        }
        full = build_ivf_index(
            emb, str(tmp_path / "ivf_full"), n_cells=4, centroids="first"
        )
        want = {
            (r.query_id, r.neighbor_id, r.rank)
            for r in ivf_topk_from_index(full, queries, k=5).collect()
        }
        assert got == want and len(want) > 0


class TestPopulationStability:
    def test_identical_distributions_near_zero(self, spark):
        from mack_spark.operators.profile import population_stability

        df = spark.createDataFrame([(i % 100,) for i in range(1000)], "v long")
        out = population_stability(df, df, "v").collect()
        assert len(out) == 10
        # p == q exactly -> every term is exactly 0
        assert all(r.psi_term == 0.0 for r in out)

    def test_shifted_distribution_flags(self, spark):
        from mack_spark.operators.profile import population_stability

        expected = spark.createDataFrame([(i % 100,) for i in range(1000)], "v long")
        shifted = spark.createDataFrame(
            [(50 + i % 100,) for i in range(1000)], "v long"
        )
        out = population_stability(expected, shifted, "v").collect()
        total = sum(r.psi_term for r in out)
        assert total > 0.25, total  # a half-range shift is a loud alarm

    def test_empty_bucket_smoothing_finite(self, spark):
        from mack_spark.operators.profile import population_stability

        expected = spark.createDataFrame([(i,) for i in range(100)], "v long")
        actual = spark.createDataFrame([(999,)], "v long")  # all in last bucket
        out = population_stability(expected, actual, "v").collect()
        import math
        assert all(math.isfinite(r.psi_term) for r in out)


class TestDropNearDuplicates:
    def test_survivors_and_passthrough(self, spark):
        from mack_spark.operators.cluster import drop_near_duplicates, near_dup_clusters

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = drop_near_duplicates(docs)
        kept = {r.doc_id for r in out.select("doc_id").collect()}
        clusters = near_dup_clusters(docs).collect()
        losers = {r.doc_id for r in clusters if r.doc_id != r.cluster_id}
        survivors = {r.cluster_id for r in clusters}
        all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
        # exactly the corpus minus losers; every cluster keeps its min id
        assert kept == all_ids - losers
        assert survivors <= kept
        assert len(losers) > 0  # testdata has real near-dups
        # schema passes through untouched
        assert out.columns == docs.columns


class TestCountAnomalyWindows:
    def test_spike_flagged(self, spark):
        from mack_spark.operators.profile import count_anomaly_windows
        from pyspark.sql import functions as F

        # 30 quiet hours of 10 events + one 300-event spike
        rows = []
        eid = 0
        for h in range(30):
            for _ in range(10):
                rows.append((eid, "click", f"2024-01-01 {h % 24:02d}:00:00"))
                eid += 1
        rows += [(eid + i, "click", "2024-02-01 00:00:00") for i in range(300)]
        df = spark.createDataFrame(
            rows, "event_id long, event_type string, ts string"
        ).withColumn("ts", F.to_timestamp("ts"))
        out = count_anomaly_windows(df)
        anomalies = [r for r in out.collect() if r.is_anomaly]
        assert len(anomalies) == 1 and anomalies[0].n_events == 300
        assert anomalies[0].zscore > 3.0

    def test_constant_series_never_anomalous(self, spark):
        from mack_spark.operators.profile import count_anomaly_windows
        from pyspark.sql import functions as F

        rows = [(i, "view", f"2024-01-01 {i % 10:02d}:00:00") for i in range(100)]
        df = spark.createDataFrame(
            rows, "event_id long, event_type string, ts string"
        ).withColumn("ts", F.to_timestamp("ts"))
        out = count_anomaly_windows(df).collect()
        assert all(not r.is_anomaly and r.zscore == 0.0 for r in out)


class TestClusterSizes:
    # slow (~16 s): cross-operator consistency twin; each operator keeps its own default tests
    @pytest.mark.slow
    def test_histogram_consistent_with_clusters(self, spark):
        from mack_spark.operators.cluster import (
            near_dup_cluster_sizes,
            near_dup_clusters,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        hist = near_dup_cluster_sizes(docs).collect()
        clustered = near_dup_clusters(docs).count()
        assert sum(r.n_docs for r in hist) == clustered
        assert all(r.cluster_size >= 2 for r in hist)  # singletons never cluster


class TestConversionFunnel:
    def test_sequence_enforced(self, spark):
        from mack_spark.operators.sessionize import conversion_funnel
        from pyspark.sql import functions as F

        rows = [
            # user 1: full ordered funnel (view 10:00, click 10:05, buy 10:20)
            (1, 1, "view", "2024-01-01 10:00:00"),
            (2, 1, "click", "2024-01-01 10:05:00"),
            (3, 1, "purchase", "2024-01-01 10:20:00"),
            # user 2: purchased BEFORE viewing -> must NOT count as converted
            (4, 2, "purchase", "2024-01-01 09:00:00"),
            (5, 2, "view", "2024-01-01 10:00:00"),
            # user 3: view only
            (6, 3, "view", "2024-01-01 10:00:00"),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, ts string"
        ).withColumn("ts", F.to_timestamp("ts"))
        out = {r.step_name: r for r in conversion_funnel(df).collect()}
        assert out["view"].n_users == 3 and out["view"].conversion is None
        assert out["click"].n_users == 1
        assert out["click"].conversion == round(1 / 3, 6)
        assert out["click"].avg_delay_sec == 300.0
        assert out["purchase"].n_users == 1
        assert out["purchase"].avg_delay_sec == 900.0

    def test_same_timestamp_counts(self, spark):
        from mack_spark.operators.sessionize import conversion_funnel
        from pyspark.sql import functions as F

        rows = [
            (1, 1, "view", "2024-01-01 10:00:00"),
            (2, 1, "click", "2024-01-01 10:00:00"),  # t >= t_prev: counts
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, ts string"
        ).withColumn("ts", F.to_timestamp("ts"))
        out = {r.step_name: r for r in conversion_funnel(df).collect()}
        assert out["click"].n_users == 1 and out["click"].avg_delay_sec == 0.0


class TestGroupedPercentiles:
    def test_grouped_matches_rank_rule(self, spark):
        from mack_spark.operators.profile import grouped_exact_percentiles

        rows = [("a", v) for v in range(1, 101)] + [("b", v) for v in [10, 20, 30, 40]]
        df = spark.createDataFrame(rows, "g string, v long")
        out = {(r.g, r.p): r.value for r in grouped_exact_percentiles(df, "g", "v").collect()}
        # group a: ranks ceil(25)=25, ceil(50)=50, ceil(75)=75
        assert out[("a", 0.25)] == 25 and out[("a", 0.5)] == 50 and out[("a", 0.75)] == 75
        # group b (n=4): ranks 1, 2, 3
        assert out[("b", 0.25)] == 10 and out[("b", 0.5)] == 20 and out[("b", 0.75)] == 30

    def test_matches_single_column_machinery(self, spark):
        """One group == the distributed prefix-sum exact_percentiles."""
        from mack_spark.operators.profile import (
            exact_percentiles,
            grouped_exact_percentiles,
        )

        df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        g = df.withColumn("k", (df.o_orderkey * 0).cast("string"))
        got = {
            r.p: r.value
            for r in grouped_exact_percentiles(g, "k", "o_totalprice").collect()
        }
        want = {
            r.p: r.value
            for r in exact_percentiles(df, "o_totalprice", (0.25, 0.5, 0.75)).collect()
        }
        assert got == want


class TestEventGapPercentiles:
    def test_known_gaps(self, spark):
        from mack_spark.operators.sessionize import event_gap_percentiles
        from pyspark.sql import functions as F

        # gaps of 10, 20, 30, 40 seconds -> q1=10 (rank 1), med=20, q3=30
        times = [0, 10, 30, 60, 100]
        rows = [(i, "click", f"2024-01-01 00:{t // 60:02d}:{t % 60:02d}") for i, t in enumerate(times)]
        df = spark.createDataFrame(
            rows, "event_id long, event_type string, ts string"
        ).withColumn("ts", F.to_timestamp("ts"))
        out = {r.p: r.gap_seconds for r in event_gap_percentiles(df).collect()}
        assert out == {0.25: 10.0, 0.5: 20.0, 0.75: 30.0}


class TestSemanticDedupReport:
    def test_report_consistent_with_components(self, spark):
        from mack_spark.operators.cluster import semantic_dedup_report
        from mack_spark.operators.similarity import embedding_near_dup_pairs_banded
        from mack_spark.operators.cluster import connected_components

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        rep = semantic_dedup_report(
            emb, threshold=0.3, n_tables=3, bits_per_table=6
        ).collect()
        assert sum(r.n_vectors for r in rep) == 500
        pairs = embedding_near_dup_pairs_banded(
            emb, threshold=0.3, n_tables=3, bits_per_table=6
        )
        comp = connected_components(pairs.select("id_a", "id_b"))
        losers = comp.filter("node != component").count()
        assert sum(r.n_removed for r in rep) == losers
        assert all(0 <= r.keep_ratio <= 1 for r in rep)

    def test_no_pairs_means_full_keep(self, spark):
        from mack_spark.operators.cluster import semantic_dedup_report

        rows = [(1, [1.0, 0.0], 0), (2, [-1.0, 0.0], 0), (3, [0.0, 1.0], 1)]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label int"
        )
        rep = semantic_dedup_report(df, threshold=0.99, n_tables=2, bits_per_table=1, )
        out = {r.label: r for r in rep.collect()}
        assert all(r.n_removed == 0 and r.keep_ratio == 1.0 for r in out.values())
