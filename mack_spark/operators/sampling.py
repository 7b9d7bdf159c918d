"""Deterministic sampling — reproducible subsets for training-data
mixing.

``DataFrame.sample`` is seed-dependent *per partitioning*: the same
seed yields different rows after a repartition, and nothing matches
across engines. These operators derive the keep/drop decision from a
hash of the row's key, so the same row makes the same decision
everywhere, forever — the property data-mixing pipelines actually need
(re-runs, incremental runs, and audits all see the same subset).

SCALE: both are map-only or single-shuffle; no RNG state, no driver
coordination.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _hash_prefix(key_cols: List[str], salt: str) -> Column:
    """First 8 hex chars of md5(salt || key) — fixed-width lowercase
    hex, so LEXICOGRAPHIC comparison equals numeric comparison and any
    engine with md5() agrees."""
    return F.substring(
        F.md5(F.concat_ws("||", F.lit(salt), *[F.col(c) for c in key_cols])), 1, 8
    )


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    key_cols: List[str],
    salt: str = "",
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash: a row is kept iff
    the first 32 bits of ``md5(salt||key)`` fall below
    ``fraction * 2^32``. Change ``salt`` to draw an independent sample;
    identical (key, salt) always decides identically.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    cut = int(fraction * 2**32)
    if cut >= 2**32:
        return df  # fraction == 1.0: the 32-bit threshold would wrap
    threshold = format(cut, "08x")
    return df.filter(_hash_prefix(key_cols, salt) < F.lit(threshold))


def stratified_sample(
    df: DataFrame,
    group_cols: List[str],
    n_per_group: int,
    key_cols: List[str],
    salt: str = "",
) -> DataFrame:
    """Exactly ``n_per_group`` rows per group (fewer if the group is
    smaller), picked in key-hash order — a deterministic quota sample
    (the data-mixing "N docs per language/source" primitive). One
    shuffle on ``group_cols``."""
    w = Window.partitionBy(*group_cols).orderBy(
        _hash_prefix(key_cols, salt), *[F.col(c) for c in key_cols]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_group)
        .drop("__rn")
    )


def hash_split(
    df: DataFrame,
    key_cols: List[str],
    weights=(("train", 0.98), ("val", 0.01), ("test", 0.01)),
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: the row's key hash
    lands in one of the cumulative-weight buckets of ``[0, 2^32)``.
    Same (key, salt) → same split, across re-runs, repartitions, and
    engines (md5 everywhere) — the invariant that keeps a training
    corpus's held-out set held out forever. Map-only: no shuffle, no
    RNG, safe to recompute instead of storing.

    ``weights`` is an ordered (name, weight) sequence; weights are
    normalized, the last bucket absorbs rounding.
    """
    names = [n for n, _ in weights]
    ws = [float(w) for _, w in weights]
    if len(names) < 2:
        raise ValueError("need at least two splits")
    if any(w < 0 for w in ws) or sum(ws) <= 0:
        raise ValueError(f"weights must be non-negative and sum > 0: {ws}")
    total = sum(ws)
    h = _hash_prefix(key_cols, salt)
    expr = None
    acc = 0.0
    for name, w in zip(names[:-1], ws[:-1]):
        acc += w / total
        threshold = format(min(int(acc * 2**32), 2**32 - 1), "08x")
        clause = h < F.lit(threshold)
        expr = F.when(clause, F.lit(name)) if expr is None else expr.when(clause, F.lit(name))
    expr = expr.otherwise(F.lit(names[-1]))
    return df.withColumn(split_col, expr)
