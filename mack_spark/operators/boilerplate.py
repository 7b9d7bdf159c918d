"""Boilerplate line removal — the CCNet/CommonCrawl curation step:
lines that repeat across many documents (navigation chrome, cookie
banners, license footers) carry no training signal and get stripped
before token counting.

SCALE shape, all JVM-side:

1. explode lines once (``posexplode`` keeps the original order);
2. line document-frequency is a distinct + one map-side-combined
   aggregation — the shuffle carries one row per distinct line, not
   per occurrence;
3. stripping is an anti-join of the exploded lines against the
   frequent-line set (comfortably the small side after the frequency
   filter — AQE broadcasts it) and one regroup per document that
   reassembles the text in line order.

No Python anywhere; the whole pipeline is three shuffles at any corpus
size, each on a key with natural cardinality control.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def line_doc_frequency(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_sep: str = "\n",
) -> DataFrame:
    """Document frequency per distinct line: ``(line, n_docs)``.
    A line counts once per document regardless of repeats within it."""
    lines = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), line_sep)).alias("line")
    ).filter(F.col("line") != "")
    return (
        lines.distinct()
        .groupBy("line")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


def strip_boilerplate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    line_sep: str = "\n",
    output_col: str = "clean_text",
) -> DataFrame:
    """Remove every line that appears in >= ``min_docs`` documents;
    remaining lines are reassembled in their original order. Documents
    whose every line was boilerplate come back with an empty string
    (they're the rows a curation pipeline then drops).

    Returns ``(id_col, output_col, n_lines, n_kept)``.
    """
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), line_sep)).alias("pos", "line"),
    ).filter(F.col("line") != "")
    boiler = (
        lines.select(id_col, "line")
        .distinct()
        .groupBy("line")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= min_docs)
        .select("line")
    )
    kept = lines.join(boiler, "line", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            line_sep,
        ).alias(output_col),
        F.count("*").cast("long").alias("n_kept"),
    )
    totals = lines.groupBy(id_col).agg(F.count("*").cast("long").alias("n_lines"))
    base = df.select(id_col)
    return (
        base.join(totals, id_col, "left")
        .join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col(output_col), F.lit("")).alias(output_col),
            F.coalesce(F.col("n_lines"), F.lit(0)).alias("n_lines"),
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
        )
    )
