"""span_contamination: verbatim benchmark-leakage detection."""

import pytest

from mack_spark.operators.dedup_text import span_contamination


def test_span_contamination_counts(spark):
    w = lambda *xs: " ".join(xs)  # noqa: E731
    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota"
    corpus = [
        # contains the first 8-gram of the benchmark doc verbatim
        (1, "prefix words " + w(*bench_text.split()[:8]) + " suffix tail"),
        # contains the second 8-gram
        (2, "other stuff " + w(*bench_text.split()[1:9]) + " trailing"),
        (3, "completely unrelated text with eight words padding around here ok"),
    ]
    bench = [(100, bench_text), (101, "too short for any span")]
    out = {
        r["bench_id"]: r
        for r in span_contamination(
            spark.createDataFrame(corpus, "doc_id long, text string"),
            spark.createDataFrame(bench, "doc_id long, text string"),
        ).collect()
    }
    # bench 100 has 9 words -> 2 distinct 8-gram spans, both leaked,
    # each by a different corpus doc
    r = out[100]
    assert r["n_spans"] == 2 and r["n_leaked"] == 2
    assert r["leak_ratio"] == 1.0 and r["corpus_docs_hit"] == 2
    # bench 101: < 8 words -> no spans -> absent from the result
    assert 101 not in out


def test_span_contamination_clean_benchmark(spark):
    corpus = spark.createDataFrame(
        [(1, "one two three four five six seven eight nine ten")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9, "totally different words that never appear in the training corpus")],
        "doc_id long, text string",
    )
    rows = span_contamination(corpus, bench).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_leaked"] == 0 and r["leak_ratio"] == 0.0 and r["corpus_docs_hit"] == 0


def test_span_contamination_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        span_contamination(df, df, span_words=1)
