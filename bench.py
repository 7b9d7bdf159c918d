"""Benchmark runner: executes every declared query end-to-end and prints
ONE JSON line ``{"metric", "value", "unit", "queries", "sf"}``.

* data dir: $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
* parallelism: local[$SPARK_GRAFT_CPUS] (default 32)
* sink: ``noop`` format — full plan execution without driver collect,
  so timings measure the distributed work, not result serialization.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from mack_spark.session import get_session


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_session("mack_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/executors so query 1 doesn't pay session startup.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    timings: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        start = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - start, 3)

    print(
        json.dumps(
            {
                "metric": "total_wall_seconds_all_queries",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
