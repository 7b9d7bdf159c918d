"""Z-order clustering: per-file min/max stats must be narrow in EVERY
clustered dimension (that narrowness is exactly what file-level data
skipping prunes on)."""

import glob
import os

from pyspark.sql import functions as F

from mack_spark.layout import cluster_by_zorder
from mack_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def _avg_file_span(spark, path, col):
    """Mean (max-min) of `col` per parquet file, normalized by the
    global span — 1.0 means every file covers the whole domain (no
    skipping possible), ~1/n_files means perfect clustering."""
    files = glob.glob(os.path.join(path, "*.parquet"))
    df = spark.read.parquet(path).withColumn(
        "__file", F.input_file_name()
    )
    per_file = (
        df.groupBy("__file")
        .agg(
            (F.max(col).cast("double") - F.min(col).cast("double")).alias("span")
        )
        .agg(F.avg("span").alias("avg_span"))
        .collect()[0]["avg_span"]
    )
    g = df.agg(
        (F.max(col).cast("double") - F.min(col).cast("double")).alias("s")
    ).collect()[0]["s"]
    assert len(files) > 1
    return per_file / g


def test_zorder_narrows_every_dimension(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders")
    naive = str(tmp_path / "naive")
    zord = str(tmp_path / "zorder")
    # naive baseline: rows in source order, same file count
    orders.repartition(16).write.parquet(naive)
    cluster_by_zorder(
        orders, ["o_custkey", "o_totalprice"], num_files=16
    ).write.parquet(zord)

    for col in ["o_custkey", "o_totalprice"]:
        z = _avg_file_span(spark, zord, col)
        n = _avg_file_span(spark, naive, col)
        # a z-ordered file covers a fraction of the domain in BOTH
        # dimensions at once (ideal for 16 files ≈ 0.25 per dim; z-curve
        # seam files cost a bit more); the naive layout covers
        # essentially all of it in every dimension
        assert z < 0.6, f"{col}: z-span {z}"
        assert n > 0.9, f"{col}: naive span {n}"
        assert z < n / 1.6

    # contents identical
    a = sorted(map(tuple, spark.read.parquet(zord).collect()))
    b = sorted(map(tuple, orders.collect()))
    assert a == b


def test_zorder_constant_column_is_safe(spark):
    df = spark.range(100).withColumn("k", F.lit(7))
    out = cluster_by_zorder(df, ["id", "k"], num_files=4)
    assert out.count() == 100
    assert set(out.columns) == {"id", "k"}
