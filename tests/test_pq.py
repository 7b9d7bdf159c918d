"""Product quantization (operators/pq.py): codebook determinism,
encoding shape/ties, ADC agreement with exact scoring on separable
data, and recall vs brute force on the real sf0.01 embeddings."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from mack_spark.operators.pq import (
    encode_pq,
    pq_search,
    pq_topk,
    train_pq_codebooks,
)

SF_DIR = "/root/testdata/sf0.01"


def _vec_df(spark, mat):
    rows = [(i, [float(x) for x in row]) for i, row in enumerate(mat)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


class TestPQ:
    def test_codebooks_deterministic(self, spark):
        rng = np.random.RandomState(7)
        df = _vec_df(spark, rng.randn(80, 16))
        a = train_pq_codebooks(df, dim=16, m=4, k=8)
        b = train_pq_codebooks(df, dim=16, m=4, k=8)
        assert np.array_equal(a, b)
        assert a.shape == (4, 8, 4)
        with pytest.raises(ValueError, match="not divisible"):
            train_pq_codebooks(df, dim=16, m=5, k=8)
        with pytest.raises(ValueError, match="< k"):
            train_pq_codebooks(df, dim=16, m=4, k=8, sample_fraction=0.01)

    def test_encode_exact_on_codebook_points(self, spark):
        """Vectors that ARE centroids must encode to their own index."""
        rng = np.random.RandomState(3)
        df = _vec_df(spark, rng.randn(64, 8))
        books = train_pq_codebooks(df, dim=8, m=2, k=4, normalize=False)
        # synth vectors assembled from centroid pairs (c0 of sub0, c3 of sub1)
        probe = np.concatenate([books[0, 1], books[1, 3]])
        pdf = _vec_df(spark, [probe])
        codes = encode_pq(pdf, books, normalize=False).collect()[0]["codes"]
        assert list(codes) == [1, 3]

    def test_adc_recovers_exact_neighbors_on_separable_clusters(self, spark):
        """Well-separated clusters: PQ top-k must agree with exact
        cosine top-k (quantization error << cluster separation)."""
        rng = np.random.RandomState(11)
        centers = rng.randn(4, 32) * 10
        mat = np.vstack([c + rng.randn(25, 32) * 0.05 for c in centers])
        df = _vec_df(spark, mat)
        out = pq_search(df, _vec_df(spark, mat[:4]), dim=32, k=5, m=4)
        got = {
            (r["query_id"], r["neighbor_id"]) for r in out.collect()
        }
        # every neighbor of query i must come from cluster i (ids 25i..25i+24)
        for q, n in got:
            assert n // 25 == q // 25, (q, n)

    def test_rank_contract(self, spark):
        rng = np.random.RandomState(5)
        df = _vec_df(spark, rng.randn(60, 16))
        out = pq_search(df, _vec_df(spark, rng.randn(3, 16)), dim=16, k=4, m=4)
        rows = out.collect()
        per_q = {}
        for r in rows:
            per_q.setdefault(r["query_id"], []).append((r["rank"], r["adc_dist"]))
        for q, rs in per_q.items():
            rs.sort()
            assert [x[0] for x in rs] == list(range(1, len(rs) + 1))
            dists = [x[1] for x in rs]
            assert dists == sorted(dists)


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="sf0.01 missing")
class TestPQRecall:
    @pytest.fixture(scope="class")
    def truth(self, spark):
        from mack_spark.operators import brute_force_topk

        corpus = spark.read.parquet(
            os.path.join(SF_DIR, "embeddings.parquet")
        ).cache()
        pairs = {
            (r[0], r[1])
            for r in brute_force_topk(corpus, corpus, k=10)
            .filter("cos_sim >= 0.3")
            .select("query_id", "neighbor_id")
            .collect()
        }
        assert len(pairs) > 100
        return corpus, pairs

    @staticmethod
    def _recall(approx, pairs):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in approx.select("query_id", "neighbor_id").collect()
        }
        return len(got & pairs) / len(pairs)

    def test_raw_adc_recall(self, truth):
        """Raw ADC at m=16, k=16 (16 bytes/vector, 16x compression):
        measured 0.572 on this fixture — the synthetic embeddings have
        high intrinsic dimension, so raw codes alone are a shortlist
        generator, not a final ranking. Pin >= 0.5 so codebook/encode
        regressions still fail loudly."""
        corpus, pairs = truth
        approx = pq_search(corpus, corpus, dim=64, k=10, m=16, n_centroids=16)
        recall = self._recall(approx, pairs)
        assert recall >= 0.5, f"raw ADC recall {recall:.3f} < 0.5"

    def test_rerank_recall_meets_bar(self, truth):
        """Done-bar: ADC shortlist (10x k) + exact re-rank recall@10
        >= 0.9 (measured 0.986) — the production PQ shape: compressed
        scan picks 100 candidates, exact scoring touches only those."""
        corpus, pairs = truth
        approx = pq_search(
            corpus, corpus, dim=64, k=10, m=16, n_centroids=16,
            rerank_shortlist=100,
        )
        recall = self._recall(approx, pairs)
        assert recall >= 0.9, f"reranked PQ recall {recall:.3f} < 0.9"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="sf0.01 missing")
class TestIVFPQ:
    def test_ivfpq_recall_and_pruning(self, spark, tmp_path):
        """IVF+PQ over a persisted index: probes read only (id, codes,
        cell) of the probed cells; recall@10 of the composed path must
        be >= 0.75 of brute-force truth at n_probe=8/16 cells with
        rerank (cell pruning costs some recall vs flat PQ; the knob is
        n_probe)."""
        from mack_spark.operators import brute_force_topk, build_ivf_index

        corpus = spark.read.parquet(
            os.path.join(SF_DIR, "embeddings.parquet")
        ).cache()
        idx = build_ivf_index(
            corpus, str(tmp_path / "ivfpq"), n_cells=16, centroids="kmeans",
            pq_m=16, pq_k=16,
        )
        assert "mack.pq.codebooks" in idx.detail()["properties"]
        from mack_spark.operators.pq import ivfpq_topk

        truth = {
            (r[0], r[1])
            for r in brute_force_topk(corpus, corpus, k=10)
            .filter("cos_sim >= 0.3")
            .select("query_id", "neighbor_id")
            .collect()
        }
        out = ivfpq_topk(idx, corpus, k=10, n_probe=8, shortlist=100)
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in out.select("query_id", "neighbor_id").collect()
        }
        recall = len(got & truth) / len(truth)
        assert recall >= 0.75, f"IVF+PQ recall {recall:.3f} < 0.75"

    def test_ivfpq_requires_pq_index(self, spark, tmp_path):
        from mack_spark.operators import build_ivf_index
        from mack_spark.operators.pq import ivfpq_topk

        corpus = spark.read.parquet(
            os.path.join(SF_DIR, "embeddings.parquet")
        )
        idx = build_ivf_index(corpus, str(tmp_path / "plain"), n_cells=4)
        with pytest.raises(ValueError, match="pq_m"):
            ivfpq_topk(idx, corpus.limit(2), k=3)


class TestBoundedTraining:
    """Round-6 scale fixes: no full-corpus collect on default paths."""

    def test_default_sample_is_bounded_by_256k(self, spark):
        """sample_fraction=None derives the fraction so the expected
        training sample is max_train_rows (default 256*k), not the
        corpus; on a corpus under the bound it degrades to 1.0 and
        matches explicit full-corpus training exactly."""
        rng = np.random.RandomState(5)
        df = _vec_df(spark, rng.randn(120, 16))
        a = train_pq_codebooks(df, dim=16, m=4, k=8)  # bound 2048 > 120
        b = train_pq_codebooks(df, dim=16, m=4, k=8, sample_fraction=1.0)
        assert np.array_equal(a, b)

    def test_max_train_rows_subsamples_deterministically(self, spark):
        rng = np.random.RandomState(9)
        df = _vec_df(spark, rng.randn(400, 16))
        a = train_pq_codebooks(df, dim=16, m=4, k=8, max_train_rows=64)
        b = train_pq_codebooks(df, dim=16, m=4, k=8, max_train_rows=64)
        full = train_pq_codebooks(df, dim=16, m=4, k=8, sample_fraction=1.0)
        assert np.array_equal(a, b)  # md5 gate: same corpus, same sample
        assert a.shape == (4, 8, 4)
        assert not np.array_equal(a, full)  # it actually subsampled

    def test_near_dup_bits_scale_with_corpus(self):
        from mack_spark.operators.similarity import near_dup_bits_for

        assert near_dup_bits_for(100) == 1          # tiny corpus: 2 buckets
        assert near_dup_bits_for(512_000) == 11     # 2^11 buckets ~ 250/bucket
        assert near_dup_bits_for(512_000_000) == 21
        # candidate volume ~ n * target stays linear: buckets double as n does
        assert near_dup_bits_for(1_024_000) == near_dup_bits_for(512_000) + 1
