"""Sources/sinks: explicit-schema readers, partition-pruned writes, and
the bucketed-table co-located join (the zero-shuffle fact⋈fact path)."""

import io
import os
import re
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from mack_spark.sources import (
    load_table,
    read_csv,
    read_jsonl,
    write_bucketed,
    write_partitioned,
)

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_read_csv_requires_schema_and_round_trips(spark, tmp_path):
    nation = load_table(spark, SF_DIR, "nation")
    csv_dir = str(tmp_path / "nation_csv")
    nation.write.option("header", "true").csv(csv_dir)
    with pytest.raises(TypeError, match="explicit schema"):
        read_csv(spark, csv_dir, None)
    back = read_csv(
        spark, csv_dir, "n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT"
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_read_jsonl_round_trips(spark, tmp_path):
    region = load_table(spark, SF_DIR, "region")
    json_dir = str(tmp_path / "region_json")
    region.write.json(json_dir)
    back = read_jsonl(spark, json_dir, region.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, region.collect()))


def test_write_partitioned_prunes_partitions(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders")
    out = str(tmp_path / "orders_by_priority")
    write_partitioned(orders, out, ["o_orderpriority"])
    # one directory per priority value
    dirs = [d for d in os.listdir(out) if d.startswith("o_orderpriority=")]
    assert len(dirs) == 5
    pruned = spark.read.parquet(out).filter(F.col("o_orderpriority") == "5-LOW")
    plan = _plan(pruned)
    # partition filter handled at listing time, not as a data filter
    assert "PartitionFilters: [isnotnull(o_orderpriority" in plan
    assert pruned.count() == orders.filter("o_orderpriority = '5-LOW'").count()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    try:
        li = load_table(spark, SF_DIR, "lineitem").select(
            "l_orderkey", "l_quantity"
        )
        orders = load_table(spark, SF_DIR, "orders").select(
            "o_orderkey", "o_totalprice"
        )
        write_bucketed(li, "li_bucketed", ["l_orderkey"], 8, ["l_orderkey"])
        write_bucketed(orders, "orders_bucketed", ["o_orderkey"], 8, ["o_orderkey"])
        joined = spark.table("li_bucketed").join(
            spark.table("orders_bucketed"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        # bucketing satisfies the join distribution on BOTH sides
        assert not re.search(r"\(\d+\) Exchange", plan)
        assert "SelectedBucketsCount: 8 out of 8" in plan
        expected = li.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        ).count()
        assert joined.count() == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_orc_round_trips(spark, tmp_path):
    from mack_spark.sources import read_orc, write_orc

    supplier = load_table(spark, SF_DIR, "supplier")
    out = str(tmp_path / "supplier_orc")
    write_orc(supplier, out)
    back = read_orc(spark, out)
    assert back.schema == supplier.schema
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, supplier.collect())
    )
