"""Physical-layout operators: multi-dimensional clustering for data
skipping (OPTIMIZE ZORDER BY, rebuilt on open Spark primitives).

At 100 TB the scan is the query: parquet/Delta readers skip whole files
whose column min/max stats exclude the predicate. A table range-sorted
on ONE column skips beautifully on that column and not at all on any
other; interleaving the bits of several columns into one Z-order key
and range-partitioning on it gives every clustered column
locality — each file covers a narrow range of EVERY dimension, so
filters on any of them prune files.

Everything here is plain DataFrame expressions + ``repartitionByRange``:
the z-key is built from JVM bitwise ops (shiftleft / bitwise OR) inside
whole-stage codegen, the range partitioner does one sampled shuffle,
and the sink is any parquet/bucketed writer.
"""

from __future__ import annotations

from functools import reduce
from typing import List

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BITS = 16  # per-dimension resolution: 65536 buckets is plenty for file-level skipping


def _normalize_to_int(c: Column, lo: Column, hi: Column) -> Column:
    """Scale a numeric/date column to [0, 2^16) using its min/max."""
    span = (hi.cast("double") - lo.cast("double"))
    frac = F.when(span <= 0, F.lit(0.0)).otherwise(
        (c.cast("double") - lo.cast("double")) / span
    )
    scaled = F.floor(frac * F.lit((1 << _BITS) - 1)).cast("bigint")
    return F.greatest(F.lit(0), F.least(F.lit((1 << _BITS) - 1), scaled))


def zorder_key(norm_cols: List[Column]) -> Column:
    """Interleave the low ``_BITS`` bits of each normalized column into
    one Z-order (Morton) key — bit i of dim d lands at position
    ``i * ndims + d``. Pure shiftleft/OR expression tree, fully
    codegen'd; no UDF."""
    n = len(norm_cols)
    parts = []
    for d, col in enumerate(norm_cols):
        for i in range(_BITS):
            bit = F.shiftright(col, i).bitwiseAND(F.lit(1))
            parts.append(F.shiftleft(bit, i * n + d))
    return reduce(lambda a, b: a.bitwiseOR(b), parts).alias("__zkey")


def cluster_by_zorder(
    df: DataFrame,
    cols: List[str],
    num_files: int = 64,
) -> DataFrame:
    """Return ``df`` re-clustered so that writing it yields files whose
    min/max stats are narrow in EVERY column of ``cols``.

    Plan: one tiny min/max aggregate per clustered column (broadcast
    back as literals via crossJoin — a single-row build side), z-key
    synthesis, ``repartitionByRange(num_files, zkey)`` (sampled range
    boundaries — one shuffle), and a within-partition sort so row
    groups inside each file are clustered too. The key column is
    dropped before the write.

    Size ``num_files`` so each output file lands near the target file
    size (128-512 MB parquet); at 100 TB that is tens of thousands of
    files, which the range partitioner handles the same way.
    """
    bounds = df.agg(
        *[F.min(c).alias(f"__lo_{c}") for c in cols],
        *[F.max(c).alias(f"__hi_{c}") for c in cols],
    )
    with_key = df.crossJoin(F.broadcast(bounds)).withColumn(
        "__zkey",
        zorder_key(
            [
                _normalize_to_int(
                    F.col(c), F.col(f"__lo_{c}"), F.col(f"__hi_{c}")
                )
                for c in cols
            ]
        ),
    )
    return (
        with_key.repartitionByRange(num_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey", *[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols])
    )


# ---------------------------------------------------------------------------
# Optimized writes (delta-spark's optimizeWrite): derive the output file
# COUNT from the data's estimated size, not from however many partitions
# the incoming plan happens to carry. A 3 MB commit arriving in 32
# shuffle partitions would otherwise write 32 ~100 KB files, and every
# downstream consumer (snapshot replay, merge pruning, per-file stream
# partitions, footer-stats collection) pays per-file cost forever.
#
# Gate: the table property ``delta.autoOptimize.optimizeWrite`` when
# present (per-table, delta semantics), else the session conf below —
# enabled by mack_spark.session.get_session, absent (off) in bare test
# sessions so layout-sensitive fixtures keep their explicit
# ``repartition(k)`` file counts.
# ---------------------------------------------------------------------------

OPTIMIZE_WRITE_CONF = "spark.mack.delta.optimizeWrite.enabled"
_TARGET_MAX = 128 * 1024 * 1024  # files at most ~128 MB (guide §6)
_TARGET_MIN = 4 * 1024 * 1024    # don't split below ~4 MB per task


def optimize_write_partitions(
    df: DataFrame, config=None, method: str = "coalesce",
    size_hint: int | None = None,
) -> DataFrame:
    """Coalesce ``df`` for writing so output files land between ~4 MB
    and ~128 MB (estimated). Never *increases* the partition count
    (``coalesce`` is a no-op when the plan already has fewer), so a
    properly-partitioned 100 TB write is untouched; only accidentally
    over-partitioned small commits shrink. Scale-adaptive by
    construction: ``n = max(ceil(est / 128 MB), min(parallelism,
    est // 4 MB), 1)`` grows linearly with the data.

    ``size_hint`` (bytes) lets callers that already KNOW the write's
    volume — rewrites of known files (merge/update/delete sum the
    snapshot ``add.size`` of the touched set), COPY INTO (source file
    sizes) — skip the per-write plan probe entirely. The probe costs a
    full driver-side analyzer+optimizer pass of the frame (measured
    11-16 ms on simple frames, 35-50 ms on merge-shaped joins, per
    write), and on join plans its row estimate is multiplicative
    garbage anyway (a 60 MB rewrite estimated at 40 GB); the snapshot
    stats are both free and closer to the truth. Hinted callers decide
    ``method`` themselves (they know whether their frame evaluates
    Python — DV scans, identity stamping).

    ``method="repartition"`` sizes through a real exchange instead
    (delta optimizeWrite's actual shape). Callers use it when the
    frame's tail contains expensive per-row work (e.g. Arrow identity
    stamping): ``coalesce`` has no stage boundary, so it would pull
    that work into the reduced task count, serializing it."""
    spark = df.sparkSession
    prop = (config or {}).get("delta.autoOptimize.optimizeWrite")
    if prop is not None:
        enabled = str(prop).lower() == "true"
    else:
        enabled = (
            str(spark.conf.get(OPTIMIZE_WRITE_CONF, "false")).lower()
            == "true"
        )
    if not enabled:
        return df
    if size_hint is not None and size_hint > 0:
        est = int(size_hint)
    else:
        try:
            est = int(
                df._jdf.queryExecution().optimizedPlan()
                .stats().sizeInBytes()
            )
        except Exception:
            return df
    if est <= 0 or est > (1 << 50):  # unknown/absurd estimate: leave as-is
        return df
    par = spark.sparkContext.defaultParallelism
    n = max(
        1,
        min(par, est // _TARGET_MIN),
        -(-est // _TARGET_MAX),  # ceil
    )
    if method != "repartition" and n < par:
        # Auto-upgrade to exchange-sizing when the plan evaluates
        # Python anywhere: coalesce has no stage boundary, so it would
        # chain every upstream partition through ONE sequential Python
        # worker round-trip (~140 ms each, measured) instead of
        # running them in parallel. The scan reads the ANALYZED plan:
        # analysis is already done eagerly for every DataFrame, so
        # this is one toString round trip (~1-2 ms), not an optimizer
        # pass — and the Python batch operators (MapInPandas /
        # MapInArrow / FlatMapGroupsInPandas) render identically in
        # analyzed and optimized logical plans. Skipped when the sized
        # count keeps the session's full width (n >= parallelism
        # cannot squeeze Python below the core count).
        try:
            plan_str = df._jdf.queryExecution().analyzed().toString()
            if any(
                m in plan_str
                for m in (
                    "MapInPandas", "MapInArrow",
                    "FlatMapGroupsInPandas", "PythonUDF",
                )
            ):
                method = "repartition"
        except Exception:
            pass
    if method == "repartition":
        return df.repartition(int(n))
    return df.coalesce(int(n))
