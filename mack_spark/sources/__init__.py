"""Source readers for the engine's star-schema inputs.

Centralizes the one genuinely fiddly input: ``events.parquet`` stores
``ts`` as parquet TIMESTAMP(NANOS), which Spark's vectorized reader
rejects outright. We flip ``spark.sql.legacy.parquet.nanosAsLong`` and
rebuild a microsecond timestamp with integer arithmetic
(``ts DIV 1000``) — same truncation DuckDB applies when it narrows ns
to its µs TIMESTAMP, so both engines observe identical instants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NANO_TS_TABLES = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table; timestamps normalized to µs precision."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name in NANO_TS_TABLES:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        for c in NANO_TS_TABLES[name]:
            # Integer DIV, not `/`: double division can round the µs up.
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} DIV 1000)"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def stream_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Streaming twin of :func:`load_table`: ``readStream`` over the same
    parquet with the same ns→µs timestamp normalization, so streaming
    operators see the exact instants the batch/oracle side sees."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/{name}.parquet"
    if name in NANO_TS_TABLES:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    # File streaming sources need a directory; the fixtures are single
    # files, so stream the parent dir with a glob pinned to this table.
    df = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", f"{name}.parquet")
        .parquet(sf_dir)
    )
    for c in NANO_TS_TABLES.get(name, []):
        df = df.withColumn(c, F.expr(f"timestamp_micros({c} DIV 1000)"))
    return df
