"""Hot-bucket skew guard for the LSH candidate joins (VERDICT r6 #7).

``near_dup_bits_for`` / banded-LSH candidate bounds assume roughly
uniform buckets; an adversarial corpus (mirror crawl, shared
boilerplate) produces mega-buckets that alone turn the candidate join
quadratic. The guard excludes buckets over ``max_bucket_rows`` from
pair generation with loud overflow accounting, and
``lsh_hot_buckets`` reports them for inspection.
"""

import logging

import pytest
from pyspark.sql import functions as F

from mack_spark.operators import lsh_candidate_pairs, lsh_hot_buckets
from mack_spark.operators.similarity import embedding_near_dup_pairs_banded


def _skewed_corpus(spark, n_clones=40, n_distinct=10):
    """n_clones identical docs (the mega bucket) + n_distinct unrelated
    docs, two of which are near-duplicates of each other."""
    boiler = "all rights reserved copyright terms of service apply here " * 4
    rows = [(i, boiler) for i in range(n_clones)]
    rows += [
        (1000 + i, f"unique document number {i} about topic {i * 7} " * 3)
        for i in range(n_distinct)
    ]
    rows += [
        (2000, "the quick brown fox jumps over the lazy dog again and again"),
        (2001, "the quick brown fox jumps over the lazy dog again and again!"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_uncapped_mega_bucket_is_quadratic(spark):
    df = _skewed_corpus(spark)
    pairs = lsh_candidate_pairs(df)
    clone_pairs = pairs.filter((F.col("id_a") < 40) & (F.col("id_b") < 40))
    assert clone_pairs.count() == 40 * 39 // 2  # the quadratic blowup


def test_cap_bounds_candidate_volume_and_keeps_real_pairs(spark, caplog):
    df = _skewed_corpus(spark)
    with caplog.at_level(logging.WARNING, "mack_spark.operators.dedup_text"):
        pairs = lsh_candidate_pairs(df, max_bucket_rows=10).collect()
    # identical docs share EVERY band -> all their buckets are hot ->
    # zero clone pairs survive (graceful recall loss, not a crash)
    assert not [p for p in pairs if p["id_a"] < 40 and p["id_b"] < 40]
    # the genuine near-dup pair outside the mega bucket is untouched
    assert any(p["id_a"] == 2000 and p["id_b"] == 2001 for p in pairs)
    # loud overflow accounting
    assert any("hot bucket" in r.message for r in caplog.records)


def test_cap_noop_on_uniform_corpus(spark):
    rows = [(i, f"document body number {i} with words {i * 13} {i * 29}") for i in range(30)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    uncapped = sorted(map(tuple, lsh_candidate_pairs(df).collect()))
    capped = sorted(map(tuple, lsh_candidate_pairs(df, max_bucket_rows=25).collect()))
    assert capped == uncapped


def test_lsh_hot_buckets_reports_the_mega_bucket(spark):
    df = _skewed_corpus(spark)
    hot = lsh_hot_buckets(df, max_bucket_rows=10).collect()
    # the clone group is hot in all 4 bands, nothing else is
    assert len(hot) == 4
    assert all(r["n_docs"] == 40 for r in hot)
    assert sorted(r["band"] for r in hot) == [0, 1, 2, 3]
    assert not lsh_hot_buckets(df, max_bucket_rows=40).collect()


def test_embedding_banded_cap(spark, caplog):
    # 30 identical vectors + a handful of scattered ones
    base = [1.0] + [0.0] * 63
    rows = [(i, base) for i in range(30)]
    rows += [
        (100 + i, [0.0] * i + [1.0] + [0.0] * (63 - i)) for i in range(8)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    uncapped = embedding_near_dup_pairs_banded(
        df, threshold=0.99, n_tables=2, bits_per_table=4
    )
    assert uncapped.filter((F.col("id_a") < 30) & (F.col("id_b") < 30)).count() == 30 * 29 // 2
    with caplog.at_level(logging.WARNING, "mack_spark.operators.similarity"):
        capped = embedding_near_dup_pairs_banded(
            df, threshold=0.99, n_tables=2, bits_per_table=4, max_bucket_rows=10
        ).collect()
    assert not [p for p in capped if p["id_a"] < 30 and p["id_b"] < 30]
    assert any("hot bucket" in r.message for r in caplog.records)
