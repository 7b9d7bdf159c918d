"""Unit tests for chunking.chunk_documents / chunking.tfidf_top_terms."""

import math

import pytest
from pyspark.sql import functions as F

from mack_spark.operators.chunking import (
    chunk_dedup_stats,
    chunk_documents,
    tfidf_top_terms,
)


def _chunks(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        (r["doc_id"], r["chunk_idx"]): r
        for r in chunk_documents(df, **kw).collect()
    }


def test_chunk_boundaries_and_overlap(spark):
    text = "a" * 500  # size 256 / stride 192 -> starts 1, 193, 385
    out = _chunks(spark, [(1, text)], size=256, stride=192)
    assert sorted(out) == [(1, 0), (1, 1), (1, 2)]
    assert out[(1, 0)]["chunk_start"] == 1 and out[(1, 0)]["chunk_len"] == 256
    assert out[(1, 1)]["chunk_start"] == 193 and out[(1, 1)]["chunk_len"] == 256
    # last chunk truncated: 500 - 385 + 1 = 116
    assert out[(1, 2)]["chunk_start"] == 385 and out[(1, 2)]["chunk_len"] == 116


def test_chunk_short_null_and_exact_fit(spark):
    rows = [(1, "xy"), (2, None), (3, "b" * 192), (4, "c" * 193)]
    out = _chunks(spark, rows, size=192, stride=192)
    # doc 1: one short chunk; doc 2: dropped; doc 3: exactly one chunk;
    # doc 4: second chunk holds the single overflow char.
    assert sorted(out) == [(1, 0), (3, 0), (4, 0), (4, 1)]
    assert out[(1, 0)]["chunk_len"] == 2
    assert out[(3, 0)]["chunk_len"] == 192
    assert out[(4, 1)]["chunk_start"] == 193 and out[(4, 1)]["chunk_len"] == 1


def test_chunk_md5_matches_slice(spark):
    import hashlib

    text = "The quick brown fox jumps over the lazy dog" * 10
    df = spark.createDataFrame([(7, text)], "doc_id long, text string")
    for r in chunk_documents(df, size=100, stride=60).collect():
        start = r["chunk_start"] - 1
        expect = hashlib.md5(text[start : start + 100].encode()).hexdigest()
        assert r["chunk_md5"] == expect and r["chunk_len"] == len(
            text[start : start + 100]
        )


def test_chunk_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, size=0)
    with pytest.raises(ValueError):
        chunk_documents(df, stride=0)


def test_chunk_plan_has_no_shuffle(spark):
    df = spark.createDataFrame([(1, "x" * 300)], "doc_id long, text string")
    plan = chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only: generate + project


def test_chunk_carry_cols_pass_through(spark):
    df = spark.createDataFrame(
        [(1, "x" * 300, "web")], "doc_id long, text string, source string"
    )
    rows = chunk_documents(df, carry_cols=("source",)).collect()
    assert len(rows) == 2 and all(r["source"] == "web" for r in rows)


def test_chunk_dedup_stats_cross_group_duplicates(spark):
    # docs 1 (src a) and 2 (src b) share identical text -> every chunk
    # duplicated corpus-wide; doc 3 is unique.
    text = "z" * 400
    rows = [(1, text, "a"), (2, text, "b"), (3, "unique " * 40, "b")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r for r in chunk_dedup_stats(df, size=256, stride=192).collect()}
    assert out["a"]["n_chunks"] == 3 and out["a"]["n_dup_chunks"] == 3
    assert out["a"]["dup_ratio"] == 1.0
    # src b: 3 dup chunks from doc 2 + 2 unique chunks from doc 3
    assert out["b"]["n_chunks"] == 5 and out["b"]["n_dup_chunks"] == 3
    assert out["b"]["dup_ratio"] == 0.6


def test_tfidf_plan_tokenizes_once(spark):
    df = spark.createDataFrame(
        [(1, "a b c", "s")], "doc_id long, text string, source string"
    )
    plan = tfidf_top_terms(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Generate explode") == 1  # corpus tokenized exactly once


def test_tfidf_scores_and_ranking(spark):
    rows = [
        (1, "apple banana apple", "a"),
        (2, "banana cherry", "a"),
        (3, "cherry cherry dates", "b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        (r["source"], r["term"]): r
        for r in tfidf_top_terms(df, top_k=10).collect()
    }
    n = 3
    # apple: tf=2 in a, df=1
    r = out[("a", "apple")]
    assert r["tf"] == 2 and r["df"] == 1
    assert r["tfidf"] == pytest.approx(round(2 * math.log(n / 1), 6), abs=1e-9)
    # banana appears in 2 docs of source a -> tf=2, df=2
    r = out[("a", "banana")]
    assert r["tf"] == 2 and r["df"] == 2
    # cherry in both sources: df counts docs across the corpus (3 docs)
    assert out[("a", "cherry")]["df"] == 2 and out[("b", "cherry")]["df"] == 2
    assert out[("b", "cherry")]["tf"] == 2
    # ranks are contiguous from 1 within each source, ordered by score
    for src in ("a", "b"):
        rs = sorted(
            (r for k, r in out.items() if k[0] == src), key=lambda r: r["rnk"]
        )
        assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1))
        scores = [r["tfidf"] for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_tfidf_top_k_truncates(spark):
    words = " ".join(f"w{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, words, "s"), (2, "w0 w1", "s")],
        "doc_id long, text string, source string",
    )
    out = tfidf_top_terms(df, top_k=5)
    assert out.count() == 5
    assert out.agg(F.max("rnk")).collect()[0][0] == 5
