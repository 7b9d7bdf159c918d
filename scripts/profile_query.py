"""Per-query profiling harness for the optimization rounds.

For each named query: time the *builder* phase (calling ``fn(spark,
sf_dir)`` — for the delta/streaming fixture queries this is where CTAS,
merges and microbatches run as eager actions) separately from the
*plan-execution* phase (the noop write of the returned DataFrame), and
optionally dump ``explain("formatted")`` to a file.

Usage:
    python scripts/profile_query.py [--sf DIR] [--explain OUTDIR]
                                    [--reps N] [--cprofile] query ...

Timing methodology matches bench.py (noop sink, min over reps) so the
builder/exec split sums to a number comparable with BENCH_LOCAL.json.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from mack_spark.session import get_session


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    explain_dir = None
    reps = 2
    use_cprofile = False
    names = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif a == "--explain":
            explain_dir = args[i + 1]; i += 2
        elif a == "--reps":
            reps = int(args[i + 1]); i += 2
        elif a == "--cprofile":
            use_cprofile = True; i += 1
        else:
            names.append(a); i += 1

    spark = get_session("mack_spark-profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)
    if not names:
        names = list(qs)

    # one warm pass at the smallest SF (codegen + python worker pool)
    warm = "/root/testdata/sf0.001"
    for n in names:
        try:
            qs[n](spark, warm).write.format("noop").mode("overwrite").save()
        except Exception:
            pass

    for n in names:
        fn = qs[n]
        best = None
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"profile:{n}:build")
            t0 = time.perf_counter()
            if use_cprofile:
                import cProfile, pstats
                pr = cProfile.Profile()
                pr.enable()
                df = fn(spark, sf_dir)
                pr.disable()
                pstats.Stats(pr).sort_stats("cumulative").print_stats(25)
            else:
                df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"profile:{n}:exec")
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            spark.sparkContext.setJobDescription(None)
            cur = (t1 - t0, t2 - t1, t2 - t0)
            if best is None or cur[2] < best[2]:
                best = cur
        b, e, tot = best
        print(f"{n}: build={b:.3f}s exec={e:.3f}s total={tot:.3f}s",
              flush=True)
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(explain_dir, f"{n}.txt"), "w") as f:
                f.write(txt)


if __name__ == "__main__":
    main()
