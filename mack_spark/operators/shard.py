"""Training-shard assignment: deterministic global shuffle + sharding
for training-order export.

The last step of a data pipeline is writing the corpus as N shard
files in a reproducible pseudo-random order (so data loaders stream
shards sequentially yet see a well-mixed distribution). RNG-based
shuffles are partitioning-dependent; these operators derive both the
shard and the intra-shard order from the document key's md5, so the
training order is a pure function of (key, salt) — identical across
re-runs and engines, and auditable by any tool with md5().

SCALE: shard assignment is map-only. The manifest is one hash
aggregation with 16 (or 256) groups. The physical export is
``repartition(n_shards, shard_id)`` + ``sortWithinPartitions`` — one
shuffle, each output file written in final order, no global sort.
"""

from __future__ import annotations

from typing import Iterable, List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"


def assign_shards(
    df: DataFrame,
    key_cols: List[str],
    salt: str = "shard",
    hex_digits: int = 1,
) -> DataFrame:
    """Add ``shard_id`` (int in [0, 16^hex_digits)) and ``order_key``
    (8 lowercase hex chars) derived from ``md5(salt||key)``.

    ``hex_digits``: 1 → 16 shards, 2 → 256 shards. The shard comes
    from the hash's leading hex digits (mapped via position in the
    hex alphabet — no engine-specific hex→int cast), the order key
    from the following 8 — independent enough for mixing, and the
    engine-agnostic construction is the point.
    """
    if hex_digits not in (1, 2):
        raise ValueError(f"hex_digits must be 1 or 2, got {hex_digits}")
    h = F.md5(F.concat_ws("||", F.lit(salt), *[F.col(c) for c in key_cols]))
    d0 = F.instr(F.lit(_HEX), F.substring(h, 1, 1)) - F.lit(1)
    if hex_digits == 1:
        shard = d0
    else:
        d1 = F.instr(F.lit(_HEX), F.substring(h, 2, 1)) - F.lit(1)
        shard = d0 * F.lit(16) + d1
    return df.withColumn("shard_id", shard.cast("int")).withColumn(
        "order_key", F.substring(h, hex_digits + 1, 8)
    )


def shard_manifest(
    df: DataFrame,
    key_cols: List[str],
    text_col: str = "text",
    salt: str = "shard",
    hex_digits: int = 1,
) -> DataFrame:
    """Per-shard audit manifest: ``shard_id, n_docs, token_sum,
    first_key, last_key`` — what an export job records so loaders can
    verify shard completeness. ``first_key``/``last_key`` are the min
    and max ``order_key``, i.e. the shard's order range."""
    sharded = assign_shards(df, key_cols, salt=salt, hex_digits=hex_digits)
    return sharded.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.col(text_col), " "))).alias("token_sum"),
        F.min("order_key").alias("first_key"),
        F.max("order_key").alias("last_key"),
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    key_cols: List[str],
    salt: str = "shard",
    hex_digits: int = 1,
    payload_cols: Iterable[str] | None = None,
) -> None:
    """Export the corpus as shard-partitioned parquet, each shard file
    internally sorted by ``order_key`` (the training order). One
    shuffle: ``repartition(n_shards, shard_id)`` co-locates each shard
    in one task, ``sortWithinPartitions`` orders it without a global
    sort, and the partitioned layout lets loaders read shard K with a
    single pruned scan."""
    from mack_spark.sources import write_partitioned

    n_shards = 16**hex_digits
    sharded = assign_shards(df, key_cols, salt=salt, hex_digits=hex_digits)
    cols = list(payload_cols) if payload_cols is not None else df.columns
    write_partitioned(
        sharded.select("shard_id", "order_key", *cols)
        .repartition(n_shards, "shard_id")
        .sortWithinPartitions("shard_id", "order_key"),
        path,
        ["shard_id"],
    )
