"""Data mixing: hit a target per-source token distribution with
deterministic hash sampling.

Pretraining corpora are *mixtures*: each source (crawl, code, books,
…) gets a target share of the token budget, and the pipeline must
downsample over-represented sources reproducibly. This module computes
the per-source allocation (available vs target tokens → keep rate) as
a single aggregation, then applies it with the same md5-prefix
decision rule as ``sampling.deterministic_sample`` — so the kept set
is a pure function of (doc key, salt, weights), stable across re-runs,
repartitions, and engines.

SCALE: the allocation plan is one hash aggregation producing one row
per source (tiny); applying it is a broadcast join of that plan onto
the corpus plus a map-only filter. No corpus-sized shuffle anywhere.

Determinism contract (mirrored verbatim by the DuckDB oracle):
``target_s = floor(budget_fraction * total_tokens * (w_s / W))``,
``rate_s = target_s / avail_s`` (IEEE doubles, this exact expression
order), keep iff ``rate_s >= 1`` or ``md5(salt||key)[:8] <
lpad(hex(floor(rate_s * 2^32)), 8, '0')`` (lexicographic compare of
fixed-width lowercase hex == numeric compare of the first 32 hash
bits).
"""

from __future__ import annotations

from typing import Dict, List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _token_count(text_col: str) -> F.Column:
    """Whitespace token count — the corpus token proxy used across the
    textstats family."""
    return F.size(F.split(F.col(text_col), " "))


def mix_allocation(
    df: DataFrame,
    weights: Dict[str, float],
    source_col: str = "source",
    text_col: str = "text",
    budget_fraction: float = 0.6,
    token_col: str | None = None,
) -> DataFrame:
    """Per-source sampling plan: ``source, avail_tokens, target_tokens,
    rate, threshold_hex``.

    ``weights`` maps source → relative target weight (sources absent
    from the map get weight 0 and are dropped entirely). The total
    budget is ``budget_fraction`` of the corpus's total tokens, split
    across sources by normalized weight; a source short of its target
    keeps everything (rate capped at 1 — no upsampling, matching how
    mixture builders treat scarce sources).

    ``token_col`` names a precomputed per-row token count to use
    instead of re-tokenizing ``text_col`` — pass it when the caller
    already carries counts (e.g. a pipeline that tokenized upstream),
    so the allocation scan stays narrow.
    """
    if not weights:
        raise ValueError("weights must be a non-empty {source: weight} map")
    if not 0.0 < budget_fraction <= 1.0:
        raise ValueError(f"budget_fraction must be in (0, 1], got {budget_fraction}")
    wsum = float(sum(weights.values()))
    if wsum <= 0:
        raise ValueError(f"weights must sum > 0: {weights}")

    tok = F.col(token_col) if token_col else _token_count(text_col)
    avail = df.groupBy(source_col).agg(F.sum(tok).alias("avail_tokens"))
    # total over ALL sources (including weight-0 ones): the budget is a
    # fraction of the whole corpus, not of the kept sources.
    total = avail.agg(F.sum("avail_tokens").alias("total_tokens"))
    w_expr = F.create_map(
        *[F.lit(x) for kv in weights.items() for x in (kv[0], float(kv[1]))]
    )
    plan = (
        avail.crossJoin(F.broadcast(total))
        .withColumn("__w", w_expr[F.col(source_col)])
        .filter(F.col("__w").isNotNull() & (F.col("__w") > 0))
        .withColumn(
            "target_tokens",
            F.floor(
                F.lit(budget_fraction)
                * F.col("total_tokens").cast("double")
                * (F.col("__w") / F.lit(wsum))
            ).cast("long"),
        )
        .withColumn(
            "rate",
            F.col("target_tokens").cast("double")
            / F.col("avail_tokens").cast("double"),
        )
        .withColumn(
            "threshold_hex",
            F.when(F.col("rate") >= 1.0, F.lit("g")).otherwise(  # 'g' > 'f…f'
                F.lpad(
                    F.lower(
                        F.hex(F.floor(F.col("rate") * F.lit(4294967296.0)).cast("long"))
                    ),
                    8,
                    "0",
                )
            ),
        )
        .select(source_col, "avail_tokens", "target_tokens", "rate", "threshold_hex")
    )
    return plan


def apply_mix(
    df: DataFrame,
    plan: DataFrame,
    key_cols: List[str],
    source_col: str = "source",
    salt: str = "mix",
) -> DataFrame:
    """Filter the corpus to the planned mixture: broadcast-join the
    per-source plan, keep rows whose 32-bit key-hash prefix falls under
    the source's threshold. Rows from sources not in the plan are
    dropped (weight 0). Map-only after the broadcast."""
    h = F.substring(
        F.md5(F.concat_ws("||", F.lit(salt), *[F.col(c) for c in key_cols])), 1, 8
    )
    joined = df.join(
        F.broadcast(plan.select(source_col, "threshold_hex")), source_col, "inner"
    )
    return joined.filter(h < F.col("threshold_hex")).drop("threshold_hex")


def mix_report(
    df: DataFrame,
    weights: Dict[str, float],
    key_cols: List[str],
    source_col: str = "source",
    text_col: str = "text",
    budget_fraction: float = 0.6,
    salt: str = "mix",
) -> DataFrame:
    """End-to-end mixture audit: plan + apply + per-source outcome —
    ``source, avail_tokens, target_tokens, kept_docs, kept_tokens``.
    ``kept_tokens`` lands within one document of ``target_tokens`` in
    expectation; the report is what a mixture run logs for the model
    card."""
    plan = mix_allocation(
        df,
        weights,
        source_col=source_col,
        text_col=text_col,
        budget_fraction=budget_fraction,
    )
    kept = apply_mix(df, plan, key_cols, source_col=source_col, salt=salt)
    outcome = kept.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("kept_docs"),
        F.sum(_token_count(text_col)).alias("kept_tokens"),
    )
    return (
        plan.select(source_col, "avail_tokens", "target_tokens")
        .join(outcome, source_col, "left")
        .select(
            source_col,
            "avail_tokens",
            "target_tokens",
            F.coalesce(F.col("kept_docs"), F.lit(0)).alias("kept_docs"),
            F.coalesce(F.col("kept_tokens"), F.lit(0)).alias("kept_tokens"),
        )
    )
