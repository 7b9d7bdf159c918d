"""Token-budget sequence packing — the step between a curated corpus
and a pretraining dataloader: concatenate documents into fixed-budget
sequences so attention windows are dense instead of padding-dominated.

Policy: greedy NEXT-FIT in ascending ``id_col`` order within each
``group_cols`` group — walk the docs, accumulate token counts, open a
new sequence when the next doc would overflow ``budget``. A doc longer
than the budget still gets its own sequence (chunk/truncate is the
tokenizer's job downstream). Deterministic: no RNG, the order is the
id order, so re-runs and engines agree row-for-row (the driver oracle
replays the same walk as a recursive CTE).

SCALE: packing is inherently sequential *within* a sequence, so the
unit of parallelism is the group: token counting runs JVM-side first
and only the narrow ``(group, id, n_tokens)`` rows enter the Python
stage, one Arrow batch stream per group. Choose ``group_cols`` that
shard the corpus (source, shard id, language) — each group's rows must
fit one task, which is exactly the contract a dataloader shard has
anyway. A global pack (no groups) would serialize into one task;
``pack_sequences`` refuses it rather than silently bottlenecking.
"""

from __future__ import annotations

from typing import Iterable, List, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from mack_spark import functions as mf


def pack_sequences(
    df: DataFrame,
    group_cols: List[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 2048,
    token_count_col: Optional[str] = None,
    tokenizer: str = "whitespace",
    bpe_merges=None,
) -> DataFrame:
    """Assign each document a ``(seq_id, seq_offset)`` within its group.

    ``seq_id`` numbers sequences from 0 per group in id order;
    ``seq_offset`` is the document's token offset inside its sequence.
    ``token_count_col`` supplies precomputed counts; otherwise tokens
    are counted with the engine tokenizer (:func:`mack_spark.functions
    .tokens`) JVM-side before the Python stage —
    ``tokenizer="bpe"`` counts with a trained byte-level BPE merge
    table instead (:mod:`mack_spark.operators.bpe`; pass
    ``bpe_merges`` from :func:`~mack_spark.operators.bpe
    .train_bpe_merges` or :func:`~mack_spark.operators.bpe
    .load_bpe_tokenizer`), which is what production packing keys on:
    real context budgets are BPE budgets, not whitespace ones.

    Returns ``(*group_cols, id_col, n_tokens, seq_id, seq_offset)``.
    """
    if tokenizer not in ("whitespace", "bpe"):
        raise ValueError(f"unknown tokenizer {tokenizer!r}")
    if tokenizer == "bpe":
        if token_count_col:
            raise ValueError(
                "pass either token_count_col or tokenizer='bpe', not both"
            )
        if bpe_merges is None:
            raise ValueError("tokenizer='bpe' needs bpe_merges")
        from mack_spark.operators.bpe import bpe_token_count

        df = bpe_token_count(
            df.select(*group_cols, id_col, text_col),
            bpe_merges, text_col=text_col, out_col="__bpe_n",
        )
        token_count_col = "__bpe_n"
    if not group_cols:
        raise ValueError(
            "pack_sequences requires group_cols: packing is sequential per "
            "group, so an ungrouped pack would serialize the corpus into "
            "one task — shard first (e.g. by source or a hash bucket)"
        )
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if token_count_col:
        counted = df.select(
            *group_cols, id_col, F.col(token_count_col).cast("long").alias("n_tokens")
        )
    else:
        counted = df.select(
            *group_cols,
            id_col,
            F.coalesce(
                F.size(mf.tokens(F.col(text_col))).cast("long"), F.lit(0)
            ).alias("n_tokens"),
        )
    schema = StructType(
        [counted.schema[c] for c in group_cols]
        + [
            counted.schema[id_col],
            StructField("n_tokens", LongType(), True),
            StructField("seq_id", LongType(), True),
            StructField("seq_offset", LongType(), True),
        ]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        seq_ids, offsets = [], []
        sid, acc = 0, 0
        for n in pdf["n_tokens"]:
            n = int(n or 0)
            if acc > 0 and acc + n > budget:
                sid += 1
                acc = 0
            seq_ids.append(sid)
            offsets.append(acc)
            acc += n
        pdf["seq_id"] = seq_ids
        pdf["seq_offset"] = offsets
        return pdf[[*group_cols, id_col, "n_tokens", "seq_id", "seq_offset"]]

    return counted.groupBy(*group_cols).applyInPandas(pack, schema)


def packing_stats(packed: DataFrame, group_cols: List[str], budget: int) -> DataFrame:
    """Packing-efficiency audit: per group, sequence count, token
    utilization (fill fraction of the budget), docs per sequence.
    One aggregation over the packed assignment — the number a data
    engineer checks before shipping a mix."""
    per_seq = packed.groupBy(*group_cols, "seq_id").agg(
        F.sum("n_tokens").alias("seq_tokens"),
        F.count("*").alias("n_docs"),
    )
    return per_seq.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("n_sequences"),
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.round(
            F.sum(F.least(F.col("seq_tokens"), F.lit(budget))).cast("double")
            / (F.count("*") * budget),
            6,
        ).alias("utilization"),
        F.round(F.avg("n_docs"), 6).alias("avg_docs_per_seq"),
    )
