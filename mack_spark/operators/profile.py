"""Data-profiling operators: column stats, histograms, exact quantiles.

The reference's key-discovery functions (mack/__init__.py:415-456,
:558-586) are narrow profiling — column-set uniqueness. This module
generalizes to the profiling a 100 TB ingest actually runs first:
null/distinct counts per column, value histograms, and quantiles.

Scale notes per operator are on the functions; the short version:
``column_profile`` and ``numeric_histogram`` are single-pass
partial-final aggregations (embarrassingly parallel), while
``exact_percentiles`` needs a global value order by definition — it
rolls up by DISTINCT value first so the ordered pass sees one row per
value, and the production path at full scale is ``approx_percentile``
(t-digest sketch, mergeable, one pass) with this as the audit.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def column_profile(df: DataFrame, cols: List[str] | None = None) -> DataFrame:
    """Per-column row/null/distinct counts, one output row per column.

    One scan: every column's three counts are computed in a single
    aggregate row (count_distinct over k columns makes Catalyst plan an
    Expand — k rows per input row — which is the standard exact
    multi-distinct strategy and still one pass over the files), then
    unpivoted driver-free with ``stack``.
    """
    cols = cols or df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"__rows_{c}"),
            F.count(F.col(c)).alias(f"__nonnull_{c}"),
            F.count_distinct(F.col(c)).alias(f"__distinct_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __rows_{c}, __rows_{c} - __nonnull_{c}, __distinct_{c}"
        for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS (column, n_rows, n_nulls, n_distinct)"
    ).orderBy("column")


def numeric_histogram(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    num_buckets: int = 20,
) -> DataFrame:
    """Fixed-width value histogram via ``width_bucket``: bucket index,
    inclusive-exclusive bounds, and row count per non-empty bucket.

    SCALE: bucket assignment is a pure row-local expression and the
    rollup is a partial-final aggregate on ≤ num_buckets+2 keys — no
    sort, no window, one shuffle of at most a few hundred tiny rows.
    Bounds are caller-provided (one prior min/max pass or domain
    knowledge) so the histogram itself stays single-pass.
    """
    width = (hi - lo) / num_buckets
    b = F.width_bucket(F.col(col), F.lit(lo), F.lit(hi), F.lit(num_buckets))
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(b.alias("bucket"))
        .agg(F.count("*").alias("n_rows"))
        .withColumn(
            "bucket_lo", F.lit(lo) + (F.col("bucket") - 1) * F.lit(width)
        )
        .withColumn("bucket_hi", F.lit(lo) + F.col("bucket") * F.lit(width))
        .select("bucket", "bucket_lo", "bucket_hi", "n_rows")
        .orderBy("bucket")
    )


def exact_percentiles(
    df: DataFrame,
    col: str,
    ps: Sequence[float] = (0.25, 0.5, 0.75, 0.95, 0.99),
    num_range_partitions: int = 32,
) -> DataFrame:
    """Exact discrete percentiles: for each p, the smallest value whose
    cumulative row count reaches ``ceil(p * n)`` — pure integer-rank
    arithmetic, so the result is engine-independent (no interpolation
    float hazards).

    SCALE: rows collapse to (value, count) by a partial-final groupBy
    FIRST, so ordered work runs over distinct values, not rows, and the
    global cumulative count is computed WITHOUT a single-partition
    sort — the classic distributed prefix-sum with the rank lookup
    fused into the offsets pass, so no stage ever cumsums the full
    value domain and nothing collapses to a single partition.

    The whole lookup is ONE lazy, driver-free plan (r16): the value
    domain is split into ``num_range_partitions`` buckets by
    ``width_bucket`` between the observed min/max — a DETERMINISTIC
    pure function of the row, unlike ``repartitionByRange``'s sampled
    boundaries — and the prefix-sum offsets arithmetic that previous
    revisions did on the driver (two blocking collects + an eager
    checkpoint of every distinct value, ~4 sequential jobs of mostly
    fixed per-job cost) now runs as a tiny window over the ≤
    ``num_range_partitions`` bucket sums inside the same plan. The
    count aggregation's exchange is consumed three times (ranges,
    bucket sums, probe scan) and reused, so the scan still runs once.
    Equal-WIDTH buckets can be population-skewed where equal-FREQUENCY
    ranges would not be, but only probed buckets are ever cumsummed,
    and the bucket count is the caller's knob.
    """
    spark = df.sparkSession
    nb = int(num_range_partitions)
    counts = (
        df.filter(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("value"))
        .agg(F.count("*").alias("cnt"))
    )
    # ranges consumes ALL of (value, cnt) — `total` is genuinely used
    # downstream, so column pruning cannot specialize this consumer's
    # copy of the count aggregate and break the exchange reuse that
    # keeps the scan single-execution
    ranges = counts.agg(
        F.min("value").cast("double").alias("lo"),
        F.max("value").cast("double").alias("hi"),
        F.sum("cnt").alias("total"),
    )
    # bucket index ascends with value (monotonic cast + monotonic
    # width_bucket); value == max lands in nbk+1, clamp it back.
    # nbk = least(nb, total): never more buckets than rows — and the
    # bucket expression thereby consumes `total`, keeping every copy
    # of the ranges subtree identical for exchange reuse.
    nbk = F.least(F.lit(nb).cast("long"), F.col("total"))
    parts = counts.crossJoin(F.broadcast(ranges)).withColumn(
        "pid",
        F.when(
            F.col("hi") > F.col("lo"),
            F.least(
                nbk,
                F.width_bucket(
                    F.col("value").cast("double"),
                    F.col("lo"), F.col("hi"), nbk,
                ),
            ),
        ).otherwise(F.lit(1)).cast("int"),  # single value (or NaN bound)
    ).select("value", "cnt", "pid", "total")
    bsum = parts.groupBy("pid").agg(
        F.sum("cnt").alias("s"), F.max("total").alias("total")
    )
    w_before = (
        Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = bsum.select(
        "pid", "s", "total",
        F.coalesce(F.sum("s").over(w_before), F.lit(0)).alias("cum_before"),
    )
    ps_df = spark.createDataFrame([(float(p),) for p in ps], "p double")
    # smallest value whose cumulative count reaches ceil(p*n); the
    # double multiply + ceil matches the driver/oracle arithmetic
    probes = (
        offs.crossJoin(F.broadcast(ps_df))
        .withColumn(
            "rank",
            F.greatest(
                F.lit(1).cast("long"),
                F.ceil(F.col("p") * F.col("total").cast("double")),
            ),
        )
        .filter(
            (F.col("cum_before") < F.col("rank"))
            & (F.col("rank") <= F.col("cum_before") + F.col("s"))
        )
        .select(
            "pid", "p", (F.col("rank") - F.col("cum_before")).alias("local_rank")
        )
    )
    # per-(pid, p) window: a bucket probed by several percentiles is
    # duplicated by the join, so each p cumsums its own copy
    w = (
        Window.partitionBy("pid", "p")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        parts.join(F.broadcast(probes), "pid")
        .withColumn("cum_local", F.sum("cnt").over(w))
        .filter(F.col("cum_local") >= F.col("local_rank"))
        .groupBy("p")
        .agg(F.min("value").alias("value"))
        .orderBy("p")
    )


def grouped_robust_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    mad_k: float = 3.0,
) -> DataFrame:
    """Per-group robust statistics via grouped-map ``applyInPandas``:
    median, MAD (median absolute deviation), and the count of
    ``|x - median| > mad_k * MAD`` outliers.

    The grouped-map pattern: one Arrow batch per group key, numpy doing
    the two nested medians no single SQL aggregate expresses. Right
    when groups are few and fat (languages, sources, shards) — each
    group must fit one executor's memory. For high-cardinality keys use
    the window/rank formulation instead; for a global median at 100 TB
    use ``approx_percentile``.
    """
    import numpy as np
    import pandas as pd

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[value_col].to_numpy(dtype=np.float64)
        med = float(np.median(x))
        dev = np.abs(x - med)
        mad = float(np.median(dev))
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "median": [round(med, 4)],
                "mad": [round(mad, 4)],
                "n": [len(x)],
                "n_outliers": [int((dev > mad_k * mad).sum())],
            }
        )

    out_schema = (
        f"{group_col} string, median double, mad double, n long, n_outliers long"
    )
    return (
        df.select(group_col, value_col)
        .groupBy(group_col)
        .applyInPandas(stats, out_schema)
        .orderBy(group_col)
    )


def numeric_correlations(
    df: DataFrame,
    cols: List[str],
    fix_scale: int = 10_000,
    round_corr: int = 6,
    group_cols: List[str] | None = None,
) -> DataFrame:
    """Pearson correlation for every unordered column pair, computed
    from EXACT fix-point sums so the result is order-independent.

    Naive ``corr()`` aggregates float products whose sum depends on
    partitioning; here each value is fixed to ``floor(x * fix_scale)``
    and the five sufficient statistics (Sx, Sy, Sxy, Sxx, Syy) are
    summed as ``decimal(38,0)`` — exact 128-bit integers — with the
    final correlation one mirrored IEEE expression over them. Any
    engine with exact integer sums replays it bit-for-bit.

    One pass: all k(k-1)/2 pairs' statistics live in a single aggregate
    row (map-side combinable); the output is k(k-1)/2 tiny rows.
    Rows where either column is NULL are excluded per pair (SQL corr
    semantics). ``group_cols`` computes the same matrix per group (one
    aggregate row per group, same single scan).
    """
    if len(cols) < 2:
        raise ValueError("need at least two columns")
    # Project every fix-point value, square, and pairwise product ONCE
    # per row (decimal ops run on the BigDecimal slow path — evaluating
    # them inside each aggregate repeated the per-row multiplies ~3x;
    # measured 2.7s -> 1.6s at sf0.1 for 4 columns). NULL propagation
    # through the products gives pairwise deletion for free; the
    # residual cost is the 6·k(k-1)/2 exact decimal SUMs, which is the
    # price of a bit-reproducible statistic.
    proj = [
        F.floor(F.col(c).cast("double") * F.lit(float(fix_scale)))
        .cast("decimal(38,0)")
        .alias(f"fx_{c}")
        for c in cols
    ]
    prods = [
        (F.col(f"fx_{c}") * F.col(f"fx_{c}")).alias(f"sq_{c}") for c in cols
    ]
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            tag = f"{a}__{b}"
            prods.append(
                (F.col(f"fx_{a}") * F.col(f"fx_{b}")).alias(f"p_xy_{tag}")
            )
    gcols = list(group_cols or [])
    fixed = df.select(*[F.col(g) for g in gcols], *proj).select("*", *prods)
    aggs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            # per-pair masks implement pairwise deletion; the square
            # columns are shared across every pair a column appears in
            mask_a = F.col(f"fx_{a}").isNotNull()
            mask_b = F.col(f"fx_{b}").isNotNull()
            tag = f"{a}__{b}"
            aggs += [
                F.count(F.col(f"p_xy_{tag}")).alias(f"n_{tag}"),
                F.sum(F.when(mask_b, F.col(f"fx_{a}"))).alias(f"sx_{tag}"),
                F.sum(F.when(mask_a, F.col(f"fx_{b}"))).alias(f"sy_{tag}"),
                F.sum(F.col(f"p_xy_{tag}")).alias(f"sxy_{tag}"),
                F.sum(F.when(mask_b, F.col(f"sq_{a}"))).alias(f"sxx_{tag}"),
                F.sum(F.when(mask_a, F.col(f"sq_{b}"))).alias(f"syy_{tag}"),
            ]
    row = fixed.groupBy(*gcols).agg(*aggs) if gcols else fixed.agg(*aggs)
    structs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            tag = f"{a}__{b}"
            n = F.col(f"n_{tag}").cast("double")
            sx = F.col(f"sx_{tag}").cast("double")
            sy = F.col(f"sy_{tag}").cast("double")
            sxy = F.col(f"sxy_{tag}").cast("double")
            sxx = F.col(f"sxx_{tag}").cast("double")
            syy = F.col(f"syy_{tag}").cast("double")
            corr = (n * sxy - sx * sy) / (
                F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
            )
            structs.append(
                F.struct(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    F.col(f"n_{tag}").alias("n"),
                    F.round(corr, round_corr).alias("corr"),
                )
            )
    # single explode over the aggregate row(s) — the scan runs ONCE,
    # not once per pair
    return row.select(
        *gcols, F.explode(F.array(*structs)).alias("p")
    ).select(*gcols, "p.*")


def exact_percentiles_multi(
    df: DataFrame,
    cols: List[str],
    ps: Sequence[float] = (0.25, 0.5, 0.75),
    num_range_partitions: int = 32,
) -> DataFrame:
    """Exact discrete percentiles for SEVERAL columns in one pass:
    ``(metric, p, value)`` with the same rank rule as
    :func:`exact_percentiles` (smallest value whose cumulative count
    reaches ``ceil(p * n_metric)``, NULLs excluded per metric).

    The multi-metric twin of the distributed prefix-sum: the columns
    are stacked to ``(metric, value)`` rows map-side, collapse to
    per-(metric, value) counts, and range-partition on the COMPOSITE
    ``(metric, value)`` key — each metric's value domain stays
    contiguous and ordered across partitions, so one offsets job and
    one probe job serve every metric at once (k columns cost one scan
    + 2 jobs, not k scans + 2k jobs). Values are cast to DOUBLE for the
    uniform stack; exact for the integer/decimal ranges this profiles.
    """
    import math

    spark = df.sparkSession
    # (The old under-partitioned-input probe is gone: df.rdd forces a
    # full physical planning pass — measured 0.8 s — and load_table now
    # delivers inputs already spread; callers with a single-partition
    # frame still work, just on fewer map tasks.)
    stacked = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("metric"),
                        F.col(c).cast("double").alias("value"),
                    )
                    for c in cols
                ]
            )
        ).alias("s")
    ).select("s.metric", "s.value").filter(F.col("value").isNotNull())
    counts = stacked.groupBy("metric", "value").agg(F.count("*").alias("cnt"))
    # repartitionByRange runs a SEPARATE range-boundary sampling job
    # over its child, recomputing the stack + aggregation; persisting
    # the counts lets the sampler and the shuffle share one execution
    counts = counts.persist()
    try:
        parts = (
            counts.repartitionByRange(num_range_partitions, "metric", "value")
            .withColumn("pid", F.spark_partition_id())
            .localCheckpoint(eager=True)
        )
    finally:
        counts.unpersist(False)
    sums = {
        (r["pid"], r["metric"]): r["s"]
        for r in parts.groupBy("pid", "metric")
        .agg(F.sum("cnt").alias("s"))
        .collect()
    }
    totals: dict = {}
    for (_pid, m), s in sums.items():
        totals[m] = totals.get(m, 0) + s
    probes = []
    for m in cols:
        if totals.get(m, 0) == 0:
            continue
        bounds, acc = [], 0
        for pid in sorted(p for p, mm in sums if mm == m):
            acc += sums[(pid, m)]
            bounds.append((pid, acc))
        for p in ps:
            rank = max(1, math.ceil(float(p) * float(totals[m])))
            lo = 0
            for pid, cum_through in bounds:
                if rank <= cum_through:
                    probes.append((m, float(p), pid, rank - lo))
                    break
                lo = cum_through
    if not probes:
        return spark.createDataFrame([], "metric string, p double, value double")
    probe_df = spark.createDataFrame(
        probes, "metric string, p double, pid int, local_rank long"
    )
    needed = sorted({pid for _, _, pid, _ in probes})
    w = (
        Window.partitionBy("pid", "metric")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        parts.filter(F.col("pid").isin(needed))
        .withColumn("cum_local", F.sum("cnt").over(w))
        .join(F.broadcast(probe_df), ["pid", "metric"])
        .filter(F.col("cum_local") >= F.col("local_rank"))
        .groupBy("metric", "p")
        .agg(F.min("value").alias("value"))
        .orderBy("metric", "p")
    )


def numeric_outlier_fences(
    df: DataFrame,
    cols: List[str],
    k: float = 1.5,
    num_range_partitions: int = 32,
) -> DataFrame:
    """Tukey IQR outlier audit per numeric column: exact Q1/Q3 (nearest-
    rank, via the distributed prefix-sum in
    :func:`exact_percentiles_multi`), fences at ``Q1 - k*IQR`` /
    ``Q3 + k*IQR``, and the count of rows beyond each fence — the
    standard pre-ingest range sanity check next to
    :func:`column_profile`.

    Returns one row per column: ``(metric, q1, q3, lo_fence, hi_fence,
    n_rows, n_below, n_above, outlier_ratio)``.

    Determinism contract (oracle-checked): quartiles are exact data
    values under the integer-rank rule; the fences are the IEEE double
    expression ``q1 - k*(q3-q1)`` evaluated identically in both
    engines; counting compares raw column doubles against those exact
    fence doubles — no interpolation anywhere.

    SCALE: the quartile pass is the prefix-sum machinery (distinct
    values only, never a full sort); the counting pass is ONE map-only
    full scan with 3 conditional sums per column (partial aggregation,
    single result row), exploded driver-free into per-column rows.
    """
    quarts = {
        (r["metric"], r["p"]): float(r["value"])
        for r in exact_percentiles_multi(
            df, cols, (0.25, 0.75), num_range_partitions
        ).collect()
    }
    agg_exprs, structs = [], []
    for c in cols:
        if (c, 0.25) not in quarts:
            continue  # all-NULL column: no quartiles, no row
        q1, q3 = quarts[(c, 0.25)], quarts[(c, 0.75)]
        lo = q1 - k * (q3 - q1)
        hi = q3 + k * (q3 - q1)
        v = F.col(c).cast("double")
        agg_exprs += [
            F.count(F.when(v.isNotNull(), 1)).alias(f"__n_{c}"),
            F.sum(F.when(v < F.lit(lo), 1).otherwise(0))
            .cast("long")
            .alias(f"__b_{c}"),
            F.sum(F.when(v > F.lit(hi), 1).otherwise(0))
            .cast("long")
            .alias(f"__a_{c}"),
        ]
        structs.append(
            F.struct(
                F.lit(c).alias("metric"),
                F.lit(q1).alias("q1"),
                F.lit(q3).alias("q3"),
                F.lit(lo).alias("lo_fence"),
                F.lit(hi).alias("hi_fence"),
                F.col(f"__n_{c}").alias("n_rows"),
                F.col(f"__b_{c}").alias("n_below"),
                F.col(f"__a_{c}").alias("n_above"),
                F.round(
                    (F.col(f"__b_{c}") + F.col(f"__a_{c}"))
                    / F.col(f"__n_{c}").cast("double"),
                    6,
                ).alias("outlier_ratio"),
            )
        )
    if not structs:
        return df.sparkSession.createDataFrame(
            [],
            "metric string, q1 double, q3 double, lo_fence double, "
            "hi_fence double, n_rows long, n_below long, n_above long, "
            "outlier_ratio double",
        )
    one = df.agg(*agg_exprs)
    return one.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


def equal_frequency_histogram(
    df: DataFrame,
    col: str,
    n_buckets: int = 10,
    num_range_partitions: int = 32,
) -> DataFrame:
    """Equal-frequency (quantile-bucket) histogram: exact nearest-rank
    cutpoints at ``i/n_buckets`` split the column into ``n_buckets``
    value ranges; each bucket reports its population and value span —
    the frequency-balanced complement of the equal-width
    :func:`numeric_histogram` (which starves on skewed columns).

    Bucket rule (deterministic, tie-stable): bucket ``i`` holds values
    in ``(cut[i-1], cut[i]]``; values equal to a cutpoint land in the
    lower bucket, so buckets at a heavy tie may be fatter than n/k —
    the honest behavior for discrete data (a row never splits).

    Returns ``(bucket, lo, hi, n_rows, min_value, max_value)`` with
    ``lo/hi`` the enclosing cutpoints (NULL at the open ends).

    SCALE: cutpoints via the distributed prefix-sum (distinct values,
    no full sort, ≤ ``n_buckets-1`` tiny probes); bucketing is ONE
    map-only CASE over the scan + a partial-final aggregate on at most
    ``n_buckets`` groups. A global ``ntile`` would total-sort the
    table for the same answer.
    """
    ps = [i / float(n_buckets) for i in range(1, n_buckets)]
    cuts = [
        float(r["value"])
        for r in exact_percentiles(df, col, ps, num_range_partitions)
        .orderBy("p")
        .collect()
    ]
    v = F.col(col).cast("double")
    bucket = F.lit(len(cuts) + 1)
    for i in range(len(cuts) - 1, -1, -1):
        bucket = F.when(v <= F.lit(cuts[i]), F.lit(i + 1)).otherwise(bucket)
    lo_expr = F.lit(None).cast("double")
    hi_expr = F.lit(None).cast("double")
    for i in range(len(cuts)):
        lo_expr = F.when(F.col("bucket") == i + 2, F.lit(cuts[i])).otherwise(lo_expr)
        hi_expr = F.when(F.col("bucket") == i + 1, F.lit(cuts[i])).otherwise(hi_expr)
    return (
        df.filter(v.isNotNull())
        .select(bucket.alias("bucket"), v.alias("v"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("v").alias("min_value"),
            F.max("v").alias("max_value"),
        )
        .select(
            F.col("bucket").cast("int").alias("bucket"),
            lo_expr.alias("lo"),
            hi_expr.alias("hi"),
            "n_rows",
            "min_value",
            "max_value",
        )
        .orderBy("bucket")
    )


def population_stability(
    df_expected: DataFrame,
    df_actual: DataFrame,
    col: str,
    n_buckets: int = 10,
    num_range_partitions: int = 32,
) -> DataFrame:
    """Population Stability Index between two corpus snapshots — the
    standard ingest-drift alarm (PSI < 0.1 stable, 0.1-0.25 drifting,
    > 0.25 shifted): bucket BOTH sides at the EXPECTED side's exact
    decile cutpoints, compare the share of each bucket.

    Per bucket: ``psi_term = (q - p) * ln(q / p)`` with
    ``p = (n_exp + 0.5) / (total_exp + 0.5 * n_buckets)`` (and likewise
    q) — Laplace-smoothed so an empty bucket on either side stays
    finite and the formula is a pure function both engines replay.
    Total PSI = sum of the terms.

    Returns ``(bucket, n_expected, n_actual, p_expected, p_actual,
    psi_term)`` — one row per bucket, shares and terms rounded to 6.

    SCALE: cutpoints via the distributed prefix-sum over the expected
    side only; both bucketing passes are map-only CASE + an
    ``n_buckets``-group aggregate; the bucket join is trivially
    broadcast. Nothing rescans either corpus twice.
    """
    ps = [i / float(n_buckets) for i in range(1, n_buckets)]
    cuts = [
        float(r["value"])
        for r in exact_percentiles(df_expected, col, ps, num_range_partitions)
        .orderBy("p")
        .collect()
    ]

    def _bucketed(df: DataFrame, out: str) -> DataFrame:
        v = F.col(col).cast("double")
        bucket = F.lit(len(cuts) + 1)
        for i in range(len(cuts) - 1, -1, -1):
            bucket = F.when(v <= F.lit(cuts[i]), F.lit(i + 1)).otherwise(bucket)
        return (
            df.filter(v.isNotNull())
            .select(bucket.cast("int").alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(out))
        )

    a = _bucketed(df_expected, "n_expected")
    b = _bucketed(df_actual, "n_actual")
    # materialize the (≤ n_buckets)-row bucket frame once: both the
    # totals aggregate and the final projection read it, and without
    # the checkpoint each consumer would re-bucket (re-scan) BOTH
    # corpora — the one place this plan could scan data twice
    joined = (
        a.join(b, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("n_expected", F.lit(0)).alias("n_expected"),
            F.coalesce("n_actual", F.lit(0)).alias("n_actual"),
        )
        .localCheckpoint(eager=True)
    )
    smooth = 0.5 * (len(cuts) + 1)
    tot = joined.agg(
        F.sum("n_expected").alias("ta"), F.sum("n_actual").alias("tb")
    )
    p = (F.col("n_expected") + F.lit(0.5)) / (F.col("ta") + F.lit(smooth))
    q = (F.col("n_actual") + F.lit(0.5)) / (F.col("tb") + F.lit(smooth))
    return (
        joined.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "n_expected",
            "n_actual",
            F.round(p, 6).alias("p_expected"),
            F.round(q, 6).alias("p_actual"),
            F.round((q - p) * F.log(q / p), 6).alias("psi_term"),
        )
        .orderBy("bucket")
    )


def count_anomaly_windows(
    df: DataFrame,
    ts_col: str = "ts",
    series_col: str = "event_type",
    window: str = "hour",
    z_threshold: float = 3.0,
) -> DataFrame:
    """Volume-anomaly detection per series: truncate timestamps to
    ``window``, count events per (series, window), and flag windows
    whose count exceeds ``mean + z * stddev`` of that series' windows —
    the standard ops alarm for traffic spikes / ingestion storms.

    Exactly engine-replayable by construction: counts are integers, so
    the per-series sufficient statistics (n, Σc, Σc²) are EXACT integer
    sums (no float-order hazard); mean/σ derive from them in one fixed
    IEEE expression tree (population σ, ``sqrt((Σc² - (Σc)²/n)/n)``),
    and only the final z-score is rounded. Σc² accumulates in
    ``decimal(38,0)`` (cast BEFORE the square): window counts above
    ~3e9 would silently wrap a long product under non-ANSI Spark while
    the DuckDB twin promotes to HUGEINT — decimal keeps both engines
    exact and identical at any realistic count.

    Returns ``(series, window_start, n_events, series_mean, series_std,
    zscore, is_anomaly)`` — one row per observed window.

    SCALE: one shuffle to the (series, window) counts (map-side
    combinable); the per-series statistics are a window aggregation
    over the counts frame (series-cardinality × windows rows, tiny);
    nothing rescans the events.
    """
    counts = (
        df.select(
            F.col(series_col).alias("series"),
            F.date_trunc(window, F.col(ts_col).cast("timestamp")).alias(
                "window_start"
            ),
        )
        .groupBy("series", "window_start")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = Window.partitionBy("series")
    n = F.count(F.lit(1)).over(w)
    s1 = F.sum("n_events").over(w)
    c_dec = F.col("n_events").cast("decimal(19,0)")
    s2 = F.sum(c_dec * c_dec).over(w)
    mean = s1.cast("double") / n.cast("double")
    var = (
        s2.cast("double") - s1.cast("double") * s1.cast("double") / n.cast("double")
    ) / n.cast("double")
    std = F.sqrt(var)
    z = F.when(std > 0, (F.col("n_events").cast("double") - mean) / std).otherwise(
        F.lit(0.0)
    )
    return counts.select(
        "series",
        "window_start",
        "n_events",
        F.round(mean, 6).alias("series_mean"),
        F.round(std, 6).alias("series_std"),
        F.round(z, 6).alias("zscore"),
        (z > F.lit(float(z_threshold))).alias("is_anomaly"),
    ).orderBy("series", "window_start")


def grouped_exact_percentiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ps: Sequence[float] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Exact nearest-rank percentiles PER GROUP: ``(group, p, value)``
    with the shared rank rule (smallest value whose cumulative count
    reaches ``ceil(p * n_group)``, NULLs excluded).

    The windowed member of the percentile family: rows collapse to
    per-(group, value) counts first, then ONE group-partitioned
    cumulative window ranks each group's distinct values. Right when
    groups are many and each group's distinct-value domain is modest
    (event types, sources, shards) — the window sort is per-group, so
    no global order and no single-partition stage. For ONE giant group
    use :func:`exact_percentiles` (distributed prefix-sum); for few
    fat groups needing medians-of-deviations use
    :func:`grouped_robust_stats`.
    """
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(group_col).alias("grp"), F.col(value_col).alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_cum = (
        Window.partitionBy("grp")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("grp")
    cum = counts.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
        "total", F.sum("cnt").over(w_all)
    )
    spark = df.sparkSession
    ps_df = F.broadcast(
        spark.createDataFrame([(float(p),) for p in ps], "p double")
    )
    return (
        cum.crossJoin(ps_df)
        .filter(F.col("cum") >= F.ceil(F.col("p") * F.col("total")))
        .groupBy(F.col("grp").alias(group_col), "p")
        .agg(F.min("value").alias("value"))
        .orderBy(group_col, "p")
    )
