"""Document chunking and corpus-level term weighting.

Two pipeline primitives every LLM training/RAG corpus needs that the
rest of the operator family doesn't cover:

- :func:`chunk_documents` — split each document into fixed-size,
  overlapping character windows (the retrieval / context-packing
  chunker).  Map-only: ``sequence`` + ``posexplode`` + ``substring``
  generate every chunk without a shuffle, so at 100 TB the operator is
  a pure scan→scan stage that scales with input partitions.
- :func:`tfidf_top_terms` — per-group (e.g. per ``source``)
  distinctive terms by TF-IDF.  One explode pass feeds both the
  term-frequency and the document-frequency aggregates; both
  aggregations and their join share the same ``term`` hash
  partitioning, so Catalyst reuses one exchange instead of three.

No reference counterpart (MrPowers/mack has no text surface); these
follow the brief's training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mack_spark import functions as mf


def chunk_documents(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 256,
    stride: int = 192,
    carry_cols: tuple = (),
) -> DataFrame:
    """Fixed-size overlapping character chunks per document.

    Chunk *k* covers 1-based character positions
    ``[1 + k*stride, 1 + k*stride + size)``; the last chunk may be
    shorter.  A document of length ``L >= 1`` yields
    ``floor((L - 1) / stride) + 1`` chunks (every start position
    ``<= L``); empty/NULL documents yield none.

    Output: ``id_col, *carry_cols, chunk_idx (0-based), chunk_start
    (1-based), chunk_len, chunk_md5`` — ``carry_cols`` are doc-level
    attributes (source, lang, …) propagated to every chunk so callers
    don't re-join the corpus to recover them; the digest rather than
    the text keeps the
    result narrow for manifest-style consumption; callers that need
    the text re-slice with the offsets.

    SCALE: no shuffle anywhere.  ``sequence``/``posexplode`` are
    whole-stage-codegen row generators; output partitioning inherits
    the scan, so 100 TB chunks in one map stage.
    """
    if size < 1 or stride < 1:
        raise ValueError(f"size and stride must be >= 1, got {size}/{stride}")
    text = F.col(text_col)
    starts = F.sequence(F.lit(1), F.greatest(F.length(text), F.lit(1)), F.lit(stride))
    chunk = F.substring(text, F.col("chunk_start"), size)
    return (
        df.filter(text.isNotNull() & (F.length(text) >= 1))
        .select(
            F.col(id_col),
            *[F.col(c) for c in carry_cols],
            text,
            F.posexplode(starts).alias("chunk_idx", "chunk_start"),
        )
        .select(
            id_col,
            *carry_cols,
            "chunk_idx",
            "chunk_start",
            F.length(chunk).alias("chunk_len"),
            F.md5(chunk).alias("chunk_md5"),
        )
    )


def chunk_dedup_stats(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    size: int = 256,
    stride: int = 192,
) -> DataFrame:
    """Per-group chunk-level duplication: how much of each group's
    chunked payload is redundant at chunk granularity.

    A chunk is *duplicated* if its digest appears more than once in the
    WHOLE corpus (cross-group hits count — that's the contamination-
    aware definition a dedup-before-packing stage needs).  Output per
    group: ``n_chunks, n_dup_chunks, dup_ratio`` (6-dp).

    SCALE: chunks are generated map-only; the digest multiplicity is a
    window over ``chunk_md5`` (one shuffle on the digest — the same
    key a subsequent drop-duplicates pass would shuffle on), then one
    partial-final agg per group.  No joins, no second tokenize.
    """
    chunks = chunk_documents(
        df.select(id_col, group_col, text_col),
        text_col=text_col,
        id_col=id_col,
        size=size,
        stride=stride,
        carry_cols=(group_col,),
    )
    mult = F.count("*").over(Window.partitionBy("chunk_md5"))
    return (
        chunks.withColumn("mult", mult)
        .groupBy(F.col(group_col))
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.when(F.col("mult") > 1, 1).otherwise(0)).alias("n_dup_chunks"),
        )
        .withColumn(
            "dup_ratio",
            F.round(F.col("n_dup_chunks") / F.col("n_chunks"), 6),
        )
        .orderBy(group_col)
    )


def tfidf_top_terms(
    df: DataFrame,
    *,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 10,
) -> DataFrame:
    """Top-``top_k`` TF-IDF terms per group.

    ``tf(g, t)`` = occurrences of ``t`` in group ``g``; ``df(t)`` =
    number of distinct documents containing ``t``; ``N`` = corpus
    document count; score = ``tf * ln(N / df)`` rounded to 6 places
    (rounded *before* ranking so the ordering is engine-portable), ties
    broken by term.

    SCALE: the corpus is scanned and tokenized exactly ONCE.  Because
    ``group_col`` is a per-document attribute (each doc lives in one
    group), ``df(t)`` = Σ over groups of that group's distinct-doc
    count for ``t`` — so one ``groupBy(term, group)`` with a
    count-distinct produces the sufficient statistics for BOTH tf and
    df, and df folds in with a window over ``term`` (vocab-sized, not
    corpus-sized).  A naive tf⋈df formulation tokenizes the 100 TB
    corpus twice; this shape shuffles it once.  ``N`` is a 1-row
    broadcast; the rank window runs over the vocab×groups frame.
    """
    toks = df.filter(F.col(text_col).isNotNull()).select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("doc"),
        F.explode(mf.tokens(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy("term", "grp").agg(
        F.count("*").alias("tf"),
        F.countDistinct("doc").alias("docs_in_grp"),
    )
    n_docs = df.filter(F.col(text_col).isNotNull()).agg(
        F.count("*").alias("n_docs")
    )
    scored = (
        tf.withColumn("df", F.sum("docs_in_grp").over(Window.partitionBy("term")))
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6),
        )
    )
    w = Window.partitionBy("grp").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
        .select(
            F.col("grp").alias(group_col),
            F.col("rnk"),
            "term",
            "tf",
            "df",
            "tfidf",
        )
        .orderBy(group_col, "rnk")
    )
