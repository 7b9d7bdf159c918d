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
