"""Relational analytics queries over the star schema (flagship/bench).

Conventions for oracle-stable results (the driver hash-compares these
against DuckDB, SURVEY §5):

* every aggregate over doubles goes through an explicit
  ``DECIMAL(18,2)`` cast — decimal addition is associative, so Spark's
  partial aggregation and DuckDB's single-node sum produce the *same*
  value regardless of row order; the final cast back to DOUBLE is a
  correctly-rounded conversion in both engines;
* every computed column is aliased (driver compares by column name);
* top-k uses row_number with a full tie-break, never bare LIMIT.

SCALE: dimension joins (region/nation/customer/supplier/part) are
broadcast — at TPC-H shape only lineitem/orders are big. Filters are
literal conjunctions on scan columns so they reach the parquet reader
(PushedFilters); aggregations are partial-final.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _dec_sum(col, alias: str):
    """Order-stable double sum: fix-point the value with ``floor(x*1e4)``
    (pure binary double arithmetic — identical in every IEEE engine,
    unlike a double→decimal cast, which Spark rounds via the shortest
    string representation and DuckDB via the binary value), sum exactly
    as a wide decimal, then one final double division."""
    return (
        (
            F.sum(F.floor(col * F.lit(10000.0)).cast("decimal(38,0)")).cast("double")
            / F.lit(10000.0)
        ).alias(alias)
    )


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from mack_spark.sources import load_table

    return load_table(spark, sf_dir, name)


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary over lineitem.

    One scan, grouped partial-final aggregation; the discount filter is
    pushed to parquet.
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_discount") <= 0.08)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum(F.col("l_quantity"), "sum_qty"),
            _dec_sum(F.col("l_extendedprice"), "sum_base_price"),
            _dec_sum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                "sum_disc_price",
            ),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by region/nation: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈
    region with every dimension broadcast (no shuffle on the dims)."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = F.broadcast(load(spark, sf_dir, "customer"))
    nation = F.broadcast(load(spark, sf_dir, "nation"))
    region = F.broadcast(load(spark, sf_dir, "region"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            _dec_sum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                "revenue",
            ),
            F.count("*").alias("n_items"),
        )
        .orderBy("region", "nation")
    )


def shipping_priority(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """TPC-H Q3-shaped shipping priority: revenue of unshipped order
    lines for one market segment — both date filters and the segment
    filter push to the parquet scans; customer is broadcast; the only
    big shuffle is lineitem ⋈ orders on the order key."""
    cutoff = "1998-06-01"
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    customer = F.broadcast(
        load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    )
    agg = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _dec_sum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                "revenue",
            )
        )
    )
    w = Window.orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "rank",
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
            "revenue",
        )
        .orderBy("rank")
    )


def returned_revenue(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """TPC-H Q10-shaped returned-item report: revenue lost to returns
    per customer, top-k. The returnflag filter pushes to the lineitem
    scan; customer/nation broadcast."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load(spark, sf_dir, "orders")
    customer = F.broadcast(load(spark, sf_dir, "customer"))
    nation = F.broadcast(load(spark, sf_dir, "nation"))
    agg = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("n_name").alias("nation"),
        )
        .agg(
            _dec_sum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                "lost_revenue",
            ),
            F.count("*").alias("n_returned_items"),
        )
    )
    w = Window.orderBy(F.col("lost_revenue").desc(), F.col("custkey").asc())
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("rank", "custkey", "name", "nation", "lost_revenue", "n_returned_items")
        .orderBy("rank")
    )


def top_customers(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Top-k customers by order revenue — deterministic tie-break on key."""
    orders = load(spark, sf_dir, "orders")
    customer = F.broadcast(load(spark, sf_dir, "customer"))
    revenue = (
        orders.groupBy("o_custkey")
        .agg(
            _dec_sum(F.col("o_totalprice"), "revenue"),
            F.count("*").alias("n_orders"),
        )
    )
    w = Window.orderBy(F.col("revenue").desc(), F.col("o_custkey").asc())
    return (
        revenue.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("rank"),
            F.col("o_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("c_mktsegment").alias("mktsegment"),
            F.col("revenue"),
            F.col("n_orders"),
        )
        .orderBy("rank")
    )


def order_priority_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped order-priority check: count orders (recent window)
    with at least one returned line — a LEFT SEMI join, so the probe side
    never multiplies rows and needs no post-join dedup; the returnflag
    filter pushes to the lineitem scan. SCALE: semi join ships only the
    join key of the filtered lineitem side through the shuffle."""
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "1997-01-01")
    returned = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy(F.col("o_orderpriority").alias("orderpriority"))
        .agg(
            F.count("*").alias("n_orders"),
            _dec_sum(F.col("o_totalprice"), "total_price"),
        )
        .orderBy("orderpriority")
    )


def quiet_customers_anti(
    spark: SparkSession, sf_dir: str, threshold: float = 480000.0
) -> DataFrame:
    """Customers with NO high-value order — a LEFT ANTI join (NOT EXISTS)
    against the filtered orders key set, grouped by market segment.
    SCALE: the anti side is filtered before the shuffle and only its key
    column survives pruning."""
    customer = load(spark, sf_dir, "customer")
    big = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > threshold)
        .select("o_custkey")
    )
    return (
        customer.join(big, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count("*").alias("n_customers"),
            _dec_sum(F.col("c_acctbal"), "total_acctbal"),
        )
        .orderBy("mktsegment")
    )


def order_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days between consecutive orders per customer (lag window with a
    full tie-break), averaged per market segment. One shuffle for the
    window on o_custkey; customer dim broadcast."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        load(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_orderdate")
        .withColumn("prev_date", F.lag("o_orderdate").over(w))
        .filter(F.col("prev_date").isNotNull())
        .withColumn("gap_days", F.datediff("o_orderdate", "prev_date"))
    )
    customer = F.broadcast(load(spark, sf_dir, "customer"))
    return (
        gaps.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count("*").alias("n_gaps"),
            F.sum("gap_days").alias("sum_gap_days"),
            F.round(F.sum("gap_days") / F.count("*"), 6).alias("avg_gap_days"),
        )
        .orderBy("mktsegment")
    )


def brand_part_rank(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Top-k parts by revenue within each brand — rank() over a
    partitioned window with a full tie-break (deterministic). The
    per-part aggregation happens BEFORE the part join, so the broadcast
    join sees one row per part, not one per lineitem."""
    rev = load(spark, sf_dir, "lineitem").groupBy("l_partkey").agg(
        _dec_sum(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), "revenue"
        )
    )
    part = F.broadcast(load(spark, sf_dir, "part"))
    w = Window.partitionBy("p_brand").orderBy(
        F.col("revenue").desc(), F.col("p_partkey").asc()
    )
    return (
        rev.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .withColumn("rank", F.rank().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("p_brand").alias("brand"),
            "rank",
            F.col("p_partkey").alias("partkey"),
            F.col("p_name").alias("part_name"),
            "revenue",
        )
        .orderBy("brand", "rank")
    )


def _user_days(spark: SparkSession, sf_dir: str, event_type: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == event_type)
        .select("user_id", F.to_date("ts").alias("day"))
    )


def click_without_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user, day) pairs with a click but no purchase — EXCEPT DISTINCT
    set difference (Spark ``subtract``). SCALE: both sides are pruned to
    two columns before the set-op shuffle."""
    clicks = _user_days(spark, sf_dir, "click")
    purchases = _user_days(spark, sf_dir, "purchase")
    return clicks.subtract(purchases).orderBy("user_id", "day")


def click_and_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user, day) pairs with both a click and a purchase — INTERSECT
    DISTINCT."""
    clicks = _user_days(spark, sf_dir, "click")
    purchases = _user_days(spark, sf_dir, "purchase")
    return clicks.intersect(purchases).orderBy("user_id", "day")


def revenue_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue at three explicit grouping granularities in ONE pass —
    GROUPING SETS ((returnflag, linestatus), (returnflag), ()) — instead
    of three scans + a union. Partial aggregation applies per set."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            _dec_sum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                "revenue",
            ),
            F.count("*").alias("n_rows"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling one-hour aggregation of the event stream (batch view of
    the streaming tumbling-window operator)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            _dec_sum(F.col("value"), "total_value"),
            F.count_distinct(F.col("user_id")).alias("n_users"),
        )
        .orderBy("hour", "event_type")
    )


def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped: for each part, the supplier(s) offering the
    minimum extended price.

    The correlated scalar subquery (``price = (SELECT min(price) ...
    WHERE partkey = outer.partkey)``) is expressed as a window min over
    the part key — ONE shuffle on ``l_partkey``, no self-join, no
    re-scan of the fact table. ``min`` over doubles is exact (no
    summation), so the equality filter is engine-stable. SCALE: the
    window and the distinct reuse the same hash partitioning on
    ``l_partkey``; part/supplier dims are broadcast.
    """
    li = load(spark, sf_dir, "lineitem")
    part = F.broadcast(load(spark, sf_dir, "part"))
    supplier = F.broadcast(load(spark, sf_dir, "supplier"))
    w = Window.partitionBy("l_partkey")
    return (
        li.select("l_partkey", "l_suppkey", "l_extendedprice")
        .withColumn("min_price", F.min("l_extendedprice").over(w))
        .filter(F.col("l_extendedprice") == F.col("min_price"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("p_name").alias("part_name"),
            F.col("l_suppkey").alias("suppkey"),
            F.col("s_name").alias("supp_name"),
            F.col("min_price"),
        )
        .distinct()
        .orderBy("partkey", "suppkey")
    )


def supplier_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11/Q15-shaped: suppliers whose revenue exceeds 1.05× the
    per-supplier average, with their share of total revenue.

    The global scalar (total revenue and supplier count) is an
    unpartitioned window over the ALREADY-AGGREGATED per-supplier frame
    — that frame has only #suppliers rows, so the single-partition
    window costs nothing, and the 100 TB fact table is scanned exactly
    ONCE (an aggregate-subquery formulation would re-scan it for the
    total). Both the per-supplier and the global sums use the fix-point
    decimal idiom so the threshold comparison is bit-identical across
    engines.
    """
    li = load(spark, sf_dir, "lineitem")
    supplier = F.broadcast(load(spark, sf_dir, "supplier"))
    rev_expr = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    rev = li.groupBy("l_suppkey").agg(_dec_sum(rev_expr, "revenue"))
    w = Window.partitionBy()
    rev = rev.withColumn(
        "total_revenue",
        F.sum(F.floor(F.col("revenue") * F.lit(10000.0)).cast("decimal(38,0)")).over(w).cast("double")
        / F.lit(10000.0),
    ).withColumn("n_suppliers", F.count("*").over(w))
    return (
        rev.filter(
            F.col("revenue")
            > F.lit(1.05) * F.col("total_revenue") / F.col("n_suppliers")
        )
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("l_suppkey").alias("suppkey"),
            F.col("s_name").alias("supp_name"),
            F.col("revenue"),
            F.round(F.col("revenue") / F.col("total_revenue"), 6).alias("share"),
        )
        .orderBy("suppkey")
    )


def large_volume_orders(
    spark: SparkSession, sf_dir: str, min_qty: float = 200.0
) -> DataFrame:
    """TPC-H Q18-shaped: orders whose total quantity exceeds a
    threshold (GROUP BY + HAVING), joined back to order/customer attrs.

    SCALE: the HAVING filter runs on the aggregated (small) side before
    the joins; customer is broadcast; orders joins on the already
    aggregated order keys.
    """
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = F.broadcast(load(spark, sf_dir, "customer"))
    sums = (
        li.groupBy("l_orderkey")
        .agg(_dec_sum(F.col("l_quantity"), "total_qty"))
        .filter(F.col("total_qty") > min_qty)
    )
    return (
        sums.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_totalprice").alias("totalprice"),
            F.col("total_qty"),
        )
        .orderBy(F.col("total_qty").desc(), "orderkey")
    )


def parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped: distinct-supplier counts per part attribute,
    excluding flagged suppliers (NOT IN → broadcast anti join).

    SCALE: the exclusion list is tiny (negative-balance suppliers) and
    broadcast; ``count_distinct`` runs partial-final on the
    (brand, type, size) grouping.
    """
    li = load(spark, sf_dir, "lineitem")
    part = F.broadcast(load(spark, sf_dir, "part"))
    excl = F.broadcast(
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(excl, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .select(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("type"),
            F.col("p_size").alias("size"),
            "supplier_cnt",
        )
        .orderBy(F.col("supplier_cnt").desc(), "brand", "type", "size")
    )


def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped: customers with above-average positive balance
    and no recent orders (none since 2001-01-01), rolled up by market
    segment.

    Scalar subquery (global average positive balance, fix-point stable)
    via broadcast cross join + anti join against order customer keys.
    """
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    avg_row = customer.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(
                F.floor(F.col("c_acctbal") * F.lit(10000.0)).cast("decimal(38,0)")
            ).cast("double")
            / F.lit(10000.0)
            / F.count("*")
        ).alias("avg_pos_bal")
    )
    return (
        customer.crossJoin(F.broadcast(avg_row))
        .filter(F.col("c_acctbal") > F.col("avg_pos_bal"))
        .join(
            orders.filter(
                F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
            ).select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            _dec_sum(F.col("c_acctbal"), "total_acctbal"),
        )
        .select(
            F.col("c_mktsegment").alias("mktsegment"),
            "n_customers",
            "total_acctbal",
        )
        .orderBy("mktsegment")
    )
