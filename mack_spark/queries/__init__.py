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

def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped forecast-revenue-change: one lineitem scan with
    every predicate (ship-year range, discount band, quantity cap)
    pushed to the parquet reader; a single global partial-final sum.

    SCALE: no shuffle at all beyond the final 1-row reduce; the scan
    reads only the four referenced columns (ReadSchema pruning).
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _dec_sum(
                F.col("l_extendedprice") * F.col("l_discount"), "revenue_increase"
            ),
            F.count("*").alias("n_lines"),
        )
    )


def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped bilateral trade volume: revenue shipped between
    two nations (either direction) per ship year.

    SCALE: both dimension chains (supplier→nation, orders→customer→
    nation) hang off broadcast joins; the only big shuffle is
    lineitem ⋈ orders on the order key. The pair filter applies after
    the broadcasts, before aggregation.
    """
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    supplier = F.broadcast(load(spark, sf_dir, "supplier"))
    customer = F.broadcast(load(spark, sf_dir, "customer"))
    n1 = F.broadcast(
        load(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        load(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
        )
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("s_nkey"))
        .join(n2, F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            _dec_sum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                "volume",
            )
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped national market share: NATION_5 suppliers' share
    of ECONOMY-part revenue sold to customers of region 1, per year.

    SCALE: conditional aggregation (share numerator as a CASE inside
    the same partial-final agg) — one pass, no self-join; all five
    dimensions broadcast.
    """
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    part = F.broadcast(
        load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    )
    supplier = F.broadcast(load(spark, sf_dir, "supplier"))
    customer = F.broadcast(load(spark, sf_dir, "customer"))
    sn = F.broadcast(
        load(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
        )
    )
    cn = F.broadcast(
        load(spark, sf_dir, "nation")
        .filter(F.col("n_regionkey") == 1)
        .select(F.col("n_nationkey").alias("c_nkey"))
    )
    vol = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(sn, F.col("s_nationkey") == F.col("s_nkey"))
        .join(cn, F.col("c_nationkey") == F.col("c_nkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            _dec_sum(
                F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(F.lit(0.0)),
                "nation_volume",
            ),
            _dec_sum(vol, "total_volume"),
        )
        .withColumn(
            "mkt_share",
            F.round(F.col("nation_volume") / F.col("total_volume"), 6),
        )
        .orderBy("o_year")
    )


def product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped product profit: per supplier nation and order
    year, profit on parts whose name contains 'widget', where profit =
    revenue minus a retail-price-based supply cost (the synthetic
    schema has no partsupp, so ps_supplycost ≡ 10% of p_retailprice).

    SCALE: the name filter prunes part before broadcast; profit is a
    pure column expression inside one partial-final agg.
    """
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    part = F.broadcast(
        load(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    )
    supplier = F.broadcast(load(spark, sf_dir, "supplier"))
    nation = F.broadcast(load(spark, sf_dir, "nation"))
    profit = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) - F.lit(
        0.1
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(_dec_sum(profit, "sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


def late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped late-shipment accounting: lines shipped more
    than 90 days after the order date, grouped by ship month and split
    by order priority into critical (1-URGENT / 2-HIGH) and
    non-critical counts — the group key is orthogonal to the CASE key,
    so the split carries information per group (unlike grouping by the
    priority itself, where one of the two sums is always zero; the
    synthetic lineitem has no l_shipmode, so month is the group key).

    SCALE: the lateness predicate is evaluated on the joined row (needs
    both sides) but the join itself is a plain equi shuffle on the
    order key; counts are conditional sums in one partial-final agg.
    """
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    late = F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)
    critical = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(late)
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            F.sum(F.when(critical, 1).otherwise(0)).alias("critical_late"),
            F.sum(F.when(~critical, 1).otherwise(0)).alias("normal_late"),
            F.count("*").alias("late_lines"),
        )
        .orderBy("ship_month")
    )


def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped order-count distribution: how many customers
    placed exactly N non-urgent orders, including the zero-order bucket
    (left outer join).

    SCALE: two shuffles by construction (orders per customer, then
    customers per count) — the classic double aggregation; the second
    input is already tiny (one row per customer).
    """
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        customer.join(
            orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer"
        )
        .groupBy("c_custkey")
        .agg(F.count(F.col("o_orderkey")).alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped promo share: percentage of one ship-month's
    revenue coming from PROMO-type parts.

    SCALE: month filter pushes to the lineitem scan; part is broadcast;
    numerator is a CASE inside the same single-row agg (no second
    pass).
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    part = F.broadcast(load(spark, sf_dir, "part"))
    vol = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            _dec_sum(
                F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0.0)),
                "promo_volume",
            ),
            _dec_sum(vol, "total_volume"),
        )
        .withColumn(
            "promo_share",
            F.round(F.lit(100.0) * F.col("promo_volume") / F.col("total_volume"), 6),
        )
    )


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped small-order revenue: for Brand#1 parts, revenue
    of lines ordering less than half the part's average quantity.

    SCALE: the per-part average is computed once on the already
    brand-filtered lineitem slice and broadcast back — a broadcast of
    one row per qualifying part, never a correlated per-row subquery.
    """
    part = F.broadcast(
        load(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").join(
        part, F.col("l_partkey") == F.col("p_partkey")
    )
    per_part = F.broadcast(
        li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
            (
                F.sum(
                    F.floor(F.col("l_quantity") * F.lit(10000.0)).cast(
                        "decimal(38,0)"
                    )
                ).cast("double")
                / F.lit(10000.0)
                / F.count("*")
            ).alias("avg_qty")
        )
    )
    return (
        li.join(per_part, F.col("l_partkey") == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.lit(0.5) * F.col("avg_qty"))
        .agg(
            _dec_sum(F.col("l_extendedprice"), "small_qty_revenue"),
            F.count("*").alias("n_lines"),
        )
    )


def discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped disjunctive-predicate revenue: three OR'd
    brand/size/quantity branches evaluated in one joined pass.

    SCALE: the part-side conjuncts (brand, size) prune the broadcast
    build side; the common l_quantity bounds push to the lineitem scan
    even though the full predicate is disjunctive.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 40)
    )
    part = F.broadcast(load(spark, sf_dir, "part"))
    branch = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size").between(1, 10))
            & (F.col("l_quantity").between(1, 11))
        )
        | (
            (F.col("p_brand") == "Brand#5")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(10, 20))
        )
        | (
            (F.col("p_brand") == "Brand#9")
            & (F.col("p_size").between(1, 25))
            & (F.col("l_quantity").between(20, 40))
        )
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(branch)
        .agg(
            _dec_sum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                "disc_revenue",
            ),
            F.count("*").alias("n_lines"),
        )
    )


def waiting_suppliers(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """TPC-H Q21-shaped blame analysis: on finished multi-supplier
    orders, the unique supplier whose line shipped last "kept the order
    waiting"; count such orders per supplier.

    SCALE: all per-order facts (latest ship date, #distinct suppliers,
    #distinct suppliers at the latest date) come from ONE window pass
    partitioned by order key — no self-joins of lineitem against
    itself; supplier names arrive by broadcast at the very end.
    """
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load(spark, sf_dir, "lineitem").join(
        orders.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey")
    )
    w = Window.partitionBy("l_orderkey")
    facts = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .withColumn("max_ship", F.max("l_shipdate").over(w))
        .withColumn("n_supps", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "late_supps",
            F.size(
                F.collect_set(
                    F.when(F.col("l_shipdate") == F.col("max_ship"), F.col("l_suppkey"))
                ).over(w)
            ),
        )
    )
    blamed = (
        facts.filter(
            (F.col("n_supps") >= 2)
            & (F.col("late_supps") == 1)
            & (F.col("l_shipdate") == F.col("max_ship"))
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    supplier = F.broadcast(load(spark, sf_dir, "supplier"))
    counted = (
        blamed.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("s_name").alias("supplier"))
        .agg(F.count("*").alias("numwait"))
    )
    rw = Window.orderBy(F.col("numwait").desc(), F.col("supplier").asc())
    return (
        counted.withColumn("rank", F.row_number().over(rw))
        .filter(F.col("rank") <= k)
        .select("supplier", "numwait", "rank")
    )


def salted_event_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resilient aggregation: events has only 5 event_type keys, so
    a naive groupBy lands the whole table on 5 reducers. Phase 1 salts
    each row into (event_type, hash(event_id) % 64) and partially
    aggregates; phase 2 folds the ≤ 5×64 salted partials into final
    per-type totals.

    The sum is floor-fix-pointed per ROW before any aggregation, so the
    two-phase decimal arithmetic is exactly associative and the result
    is bit-identical to a single-phase sum (and to the oracle's).

    SCALE: this is the salting pattern for power-law keys — the wide
    shuffle distributes over keys×64 buckets; the second shuffle moves
    only ~320 tiny rows. On a uniform synthetic table the plan shape is
    identical to the skewed case, which is the point of the test.
    """
    ev = load(spark, sf_dir, "events")
    salted = (
        ev.withColumn("salt", F.pmod(F.hash("event_id"), F.lit(64)))
        .groupBy("event_type", "salt")
        .agg(
            F.count("*").alias("pc"),
            F.sum(
                F.floor(F.col("value") * F.lit(10000.0)).cast("decimal(38,0)")
            ).alias("pv"),
        )
    )
    return (
        salted.groupBy("event_type")
        .agg(
            F.sum("pc").alias("n_events"),
            (F.sum("pv").cast("double") / F.lit(10000.0)).alias("total_value"),
        )
        .orderBy("event_type")
    )
