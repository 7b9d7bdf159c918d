"""Scaling bench: the headline queries at sf0.1 vs sf1 (10x data) in
one session, best-of-2 per (query, sf). Writes SCALING.json with
per-query wall-clock and the sf1/sf0.1 ratio — the evidence behind the
"scales by construction" claims (VERDICT r6 #6 / r8 #1).

Usage: python scripts/bench_scaling.py [sf1_dir]
(default /tmp/sf1-synth; sf0.1 side reads /root/testdata/sf0.1)

A ratio near 10 = linear in data. Ratios well under 10 mean the query
is overhead-dominated at sf0.1 (fixed costs amortize); ratios over ~12
flag superlinear work (shuffle growth, candidate blow-up) and get
named in BASELINE.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from mack_spark.session import get_session  # noqa: E402

HEADLINE = [
    # classic scan/agg/join
    "pricing_summary", "regional_revenue", "salted_join_revenue",
    "totalprice_percentiles", "numeric_outliers",
    # events
    "sessionize", "events_hourly_rollup",
    # reference core + protocol merge
    "type_2_scd_upsert", "delta_scd2_merge", "kill_duplicates",
    "delta_kill_duplicates", "delta_append_without_duplicates",
    # text dedup family
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_ngram_jaccard", "dedup_incremental_lsh", "dedup_clusters",
    # embedding family
    "dedup_embedding_banded", "dedup_embedding_scaled",
    "knn_brute_force", "knn_lsh", "knn_ivf", "knn_ivf_kmeans",
    "knn_pq_adc", "knn_ivfpq",
    # text analysis
    "tfidf_top_terms", "lang_confusion",
    # round-10 CDF family (change feed, CDF-driven rollup, protocol
    # constraint append, streaming change-feed read)
    "delta_cdf_changes", "delta_incremental_rollup",
    "delta_constraint_append", "streaming_cdf_source",
    # round-11 interop family (DV writes, CDF-driven streaming SCD2,
    # column-mapping id reads / name writes, v2 checkpoints, ICT)
    "delta_dv_delete", "streaming_scd2_cdf", "delta_id_mode_read",
    "delta_mapped_append", "delta_v2_checkpoint_read",
    "delta_ict_commits", "delta_timestamp_read", "delta_reorg_purge",
    "delta_txn_idempotent", "delta_rename_column",
    # round-12 family (v2 checkpoint writes, identity columns, row
    # tracking, liquid clustering, shallow clone)
    "delta_v2_checkpoint_write", "delta_identity_append",
    "delta_row_tracking", "delta_liquid_cluster",
    "delta_shallow_clone",
    # round-13 family (identity merge, deep clone, log compaction,
    # metadata cleanup)
    "delta_identity_merge", "delta_deep_clone",
    "delta_log_compaction", "delta_log_cleanup",
]


def main() -> None:
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1-synth"
    sf01_dir = "/root/testdata/sf0.1"
    spark = get_session("mack_spark-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    names = [n for n in HEADLINE if n in queries]
    skipped = [n for n in HEADLINE if n not in queries]
    if skipped:
        print(f"# skipped (not declared): {skipped}", file=sys.stderr)

    # warm-up at sf0.001: JIT/codegen/python-worker spin-up
    warm = "/root/testdata/sf0.001"
    for n in names:
        try:
            queries[n](spark, warm).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as exc:  # surface loudly, keep benching the rest
            print(f"# warmup {n}: {exc}", file=sys.stderr)

    def run(n, d):
        reps = []
        for _ in range(2):
            t0 = time.perf_counter()
            queries[n](spark, d).write.format("noop").mode(
                "overwrite"
            ).save()
            reps.append(time.perf_counter() - t0)
        if max(reps) > 1.5 * min(reps):
            t0 = time.perf_counter()
            queries[n](spark, d).write.format("noop").mode(
                "overwrite"
            ).save()
            reps.append(time.perf_counter() - t0)
        return round(min(reps), 3)

    out = {"sf0.1": {}, "sf1": {}, "ratio": {}}
    for n in names:
        a = run(n, sf01_dir)
        b = run(n, sf1_dir)
        out["sf0.1"][n] = a
        out["sf1"][n] = b
        out["ratio"][n] = round(b / a, 2) if a > 0 else None
        print(f"{n}: sf0.1={a}s sf1={b}s ratio={out['ratio'][n]}",
              flush=True)
    out["total_sf0.1"] = round(sum(out["sf0.1"].values()), 2)
    out["total_sf1"] = round(sum(out["sf1"].values()), 2)
    out["total_ratio"] = round(out["total_sf1"] / out["total_sf0.1"], 2)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"total_sf0.1": out["total_sf0.1"],
                      "total_sf1": out["total_sf1"],
                      "total_ratio": out["total_ratio"]}))


if __name__ == "__main__":
    main()
