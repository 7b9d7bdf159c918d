"""Rule-based corpus quality gates (Gopher-style heuristics).

Deterministic per-document quality signals of the kind large-scale
pretraining pipelines apply before any model-based filtering (Rae et
al., *Scaling Language Models: Gopher*, arXiv:2112.11446 §A1.1): word
count bounds, mean-word-length bounds, and a stopword-presence floor.
The reference library (mack) has no text surface; these extend the
rebuild's corpus-curation family (textstats.py) with the classic
hard-rule layer.

SCALE: every metric is a map-only JVM expression over the tokenized
text (``split`` + higher-order array functions) — no shuffle, no
Python, no UDF. The per-source rollup is a single hash aggregation on
the source key. At 100 TB this is a pure scan-bound pass that fuses
into whatever projection reads the corpus.

Determinism: ratios are single IEEE divisions followed by ``round(x,
4)`` — reproducible across engines; the DuckDB oracle mirrors the
exact expression tree.
"""

from __future__ import annotations

from typing import Iterable, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Default stopword set: function words present in any English-like
#: corpus. Gopher requires >= 2 of a similar small set; with
#: single-space text the presence *ratio* is the robust analogue.
DEFAULT_STOPWORDS: Tuple[str, ...] = ("a", "the", "of", "to", "in", "and")


def gopher_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    id_cols: Iterable[str] = ("doc_id",),
    stopwords: Iterable[str] = DEFAULT_STOPWORDS,
    min_words: int = 20,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_stop_ratio: float = 0.01,
) -> DataFrame:
    """Per-document quality metrics + pass/fail gate flags.

    Output columns: ``*id_cols, n_words, mean_word_len, stop_ratio,
    flag_word_count, flag_mean_word_len, flag_stop_ratio, passes`` —
    one row per input row, flags ``True`` when the gate PASSES.

    ``mean_word_len`` assumes single-space tokenization (sum of word
    lengths == ``length(text) - (n_words - 1)``); the identity keeps
    the metric a scalar expression instead of a per-word fold, and the
    tokenizer that produced the corpus guarantees it.
    """
    words = F.split(F.col(text_col), " ")
    n_words = F.size(words)
    stop_arr = F.array(*[F.lit(w) for w in stopwords])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w)))
    mean_wl = (F.length(F.col(text_col)) - (n_words - F.lit(1))).cast(
        "double"
    ) / n_words.cast("double")
    stop_ratio = n_stop.cast("double") / n_words.cast("double")

    out = df.select(
        *id_cols,
        n_words.alias("n_words"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
    )
    flag_wc = (F.col("n_words") >= min_words) & (F.col("n_words") <= max_words)
    flag_mwl = (F.col("mean_word_len") >= min_mean_word_len) & (
        F.col("mean_word_len") <= max_mean_word_len
    )
    flag_sr = F.col("stop_ratio") >= min_stop_ratio
    return out.select(
        "*",
        flag_wc.alias("flag_word_count"),
        flag_mwl.alias("flag_mean_word_len"),
        flag_sr.alias("flag_stop_ratio"),
        (flag_wc & flag_mwl & flag_sr).alias("passes"),
    )


def quality_by_source(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    **gate_kwargs,
) -> DataFrame:
    """Gate pass-rate rollup per source: ``source, n_docs, n_pass,
    pass_rate`` — the report a curation run reads to decide which
    crawls/feeds to keep. One shuffle (hash agg on the source key);
    the per-doc flags stay map-side."""
    flags = gopher_quality_flags(
        df, text_col=text_col, id_cols=(source_col,), **gate_kwargs
    )
    return flags.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("passes").cast("long")).alias("n_pass"),
        F.round(
            F.sum(F.col("passes").cast("long")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            4,
        ).alias("pass_rate"),
    )
