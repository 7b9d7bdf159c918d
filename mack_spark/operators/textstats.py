"""Text analysis over a document corpus: per-doc stats and rollups.

Pure built-in expressions (mack_spark.functions) + one aggregation —
map-side combinable, fully oracle-expressible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mack_spark import functions as mf


def doc_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document statistics: token count, char length, distinct-token
    ratio, language guess, quality score, content fingerprint."""
    toks = mf.tokens(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("n_chars_computed"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.round(
            F.size(F.array_distinct(toks)) / F.greatest(F.size(toks), F.lit(1)), 6
        ).alias("distinct_ratio"),
        mf.lang_id(F.col(text_col)).alias("lang_guess"),
        mf.quality_score(F.col(text_col)).alias("quality"),
        mf.doc_fingerprint(F.col(text_col)).alias("fingerprint"),
    )


def corpus_rollup(
    df: DataFrame, text_col: str = "text", lang_col: str = "lang", source_col: str = "source"
) -> DataFrame:
    """Corpus profile grouped by (lang, source): doc counts, token and
    char totals, mean quality.

    SCALE: a single groupBy with partial aggregation; token counting is
    per-row (no explode — ``size(split(...))`` never materializes the
    token rows in a shuffle).
    """
    toks = mf.tokens(F.col(text_col))
    return (
        df.select(
            F.col(lang_col).alias("lang"),
            F.col(source_col).alias("source"),
            F.size(toks).alias("n_tokens"),
            F.length(F.col(text_col)).alias("n_chars"),
            mf.quality_score(F.col(text_col)).alias("quality"),
        )
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
            F.round(F.avg("quality"), 6).alias("avg_quality"),
        )
    )
