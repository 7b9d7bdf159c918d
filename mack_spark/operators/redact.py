"""PII redaction / scrubbing operators for training-data curation.

A 100 TB pretraining corpus must be scrubbed of emails, phone numbers,
IP addresses, SSNs, and raw URLs before use. All matching here is
JVM-side ``regexp_replace`` / ``regexp_extract_all`` over built-in
expressions — zero Python in the hot path, so the scrub runs inside
whole-stage codegen as a map-only stage: no shuffle, pushdown-friendly,
and trivially parallel at any corpus size. (The reference has no text
surface; rebuild-extension per SURVEY.md §2d.)

Patterns deliberately stick to the regex subset shared by Java
(``java.util.regex``, what Catalyst compiles) and RE2 (DuckDB/Go), so
every operator has an exact engine-independent oracle: character
classes, bounded repetition, alternation, ``\\b`` — no lookaround, no
backreferences.
"""

from __future__ import annotations

from typing import Iterable, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: URLs first (they may embed host digits that would otherwise
# half-match IP/phone), then the point formats. Order is part of the
# contract — redact_pii applies left to right.
PII_PATTERNS = {
    "url": r"https?://[A-Za-z0-9._~:/?#\[\]@!$&'()*+,;=%-]+",
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\(\d{3}\) \d{3}-\d{4}|\b\d{3}-\d{3}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}

DEFAULT_KINDS = tuple(PII_PATTERNS)


def _check_kinds(kinds: Iterable[str]) -> list:
    kinds = list(kinds)
    unknown = [k for k in kinds if k not in PII_PATTERNS]
    if unknown:
        raise ValueError(
            f"unknown PII kinds {unknown}; supported: {sorted(PII_PATTERNS)}"
        )
    return kinds


def redact_expr(text: Column, kinds: Iterable[str] = DEFAULT_KINDS) -> Column:
    """Column expression replacing each PII match with ``<KIND>``."""
    out = text
    for kind in _check_kinds(kinds):
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return out


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    kinds: Iterable[str] = DEFAULT_KINDS,
    output_col: Optional[str] = None,
) -> DataFrame:
    """Replace PII spans in ``text_col`` with ``<KIND>`` tokens.

    Map-only: one chained ``regexp_replace`` projection, no shuffle.
    """
    return df.withColumn(output_col or text_col, redact_expr(F.col(text_col), kinds))


def pii_counts(
    df: DataFrame,
    text_col: str = "text",
    kinds: Iterable[str] = DEFAULT_KINDS,
) -> DataFrame:
    """Per-row match counts: adds ``n_<kind>`` int columns plus
    ``n_pii_total``. Counting is ``size(regexp_extract_all(...))`` —
    still JVM-side, still map-only."""
    out = df
    total = F.lit(0)
    for kind in _check_kinds(kinds):
        n = F.size(F.regexp_extract_all(F.col(text_col), F.lit(PII_PATTERNS[kind]), 0))
        out = out.withColumn(f"n_{kind}", n)
        total = total + F.col(f"n_{kind}")
    return out.withColumn("n_pii_total", total)


def pii_rollup(
    df: DataFrame,
    text_col: str = "text",
    kinds: Iterable[str] = DEFAULT_KINDS,
    group_cols: Iterable[str] = (),
) -> DataFrame:
    """Corpus-level scrub audit: total matches per kind and the count of
    rows containing any PII, optionally per ``group_cols`` (e.g. per
    source). Partial aggregation makes the shuffle one row per group."""
    kinds = _check_kinds(kinds)
    counted = pii_counts(df, text_col, kinds)
    aggs = [F.count(F.lit(1)).alias("n_docs")] + [
        F.sum(f"n_{k}").cast("long").alias(f"total_{k}") for k in kinds
    ]
    aggs.append(
        F.sum((F.col("n_pii_total") > 0).cast("long")).alias("docs_with_pii")
    )
    group_cols = list(group_cols)
    if group_cols:
        return counted.groupBy(*group_cols).agg(*aggs)
    return counted.agg(*aggs)


def strip_urls(
    df: DataFrame, text_col: str = "text", output_col: Optional[str] = None
) -> DataFrame:
    """Remove raw URLs entirely (common curation step before token
    counting — URLs inflate token counts without adding signal)."""
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.col(text_col), PII_PATTERNS["url"], ""),
            r"  +",
            " ",
        )
    )
    return df.withColumn(output_col or text_col, cleaned)
