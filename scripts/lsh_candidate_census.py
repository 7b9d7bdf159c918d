#!/usr/bin/env python
"""LSH candidate-pair census across scale factors (VERDICT r12 #7).

``dedup_ngram_jaccard``'s wall-clock scales with CANDIDATE PAIRS, not
corpus rows — its sf0.1→sf1 ratio drifted 5.23×→6.68× across rounds,
which is only acceptable if the pair volume actually grew that much
(pair count is quadratic in per-bucket membership, so a corpus with
more near-dups legitimately super-scales). This script MEASURES it:
for each scale dir it counts documents, uncapped candidate pairs,
capped pairs under the default hot-bucket guard (256), and the hot
buckets the guard would drop — so the scaling ratio has a denominator
and "the guard engages at sf1" is observed, not assumed.

Usage: python scripts/lsh_candidate_census.py [sf_dir ...]
Writes SCALING_LSH_r13.json at the repo root.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_DIRS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1",
                "/tmp/sf1-synth"]
CAP = 256  # the default hot-bucket guard (lsh_hot_buckets' default)


def main():
    from pyspark.sql import functions as F

    from mack_spark.operators.dedup_text import (
        lsh_candidate_pairs,
        lsh_hot_buckets,
    )
    from mack_spark.session import get_session

    dirs = sys.argv[1:] or [d for d in DEFAULT_DIRS if os.path.isdir(d)]
    spark = get_session("lsh-census")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"cap": CAP, "scales": []}
    for d in dirs:
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        n_docs = docs.count()
        t0 = time.monotonic()
        uncapped = lsh_candidate_pairs(docs).count()
        t_uncapped = time.monotonic() - t0
        t0 = time.monotonic()
        capped = lsh_candidate_pairs(docs, max_bucket_rows=CAP).count()
        t_capped = time.monotonic() - t0
        hot = lsh_hot_buckets(docs, max_bucket_rows=CAP).agg(
            F.count(F.lit(1)).alias("n_hot"),
            F.coalesce(F.max("n_docs"), F.lit(0)).alias("max_bucket"),
            F.coalesce(F.sum("n_docs"), F.lit(0)).alias("hot_members"),
        ).collect()[0]
        row = {
            "sf_dir": d,
            "n_docs": n_docs,
            "candidate_pairs_uncapped": uncapped,
            "candidate_pairs_capped": capped,
            "pairs_per_doc_uncapped": round(uncapped / max(n_docs, 1), 3),
            "pairs_per_doc_capped": round(capped / max(n_docs, 1), 3),
            "hot_buckets_over_cap": hot["n_hot"],
            "max_bucket_rows_seen": hot["max_bucket"],
            "hot_bucket_members": hot["hot_members"],
            "sec_uncapped": round(t_uncapped, 2),
            "sec_capped": round(t_capped, 2),
        }
        out["scales"].append(row)
        print(json.dumps(row))
    # the headline ratios the verdict asked for
    if len(out["scales"]) >= 2:
        a, b = out["scales"][-2], out["scales"][-1]
        out["docs_ratio"] = round(b["n_docs"] / max(a["n_docs"], 1), 2)
        out["pair_ratio_uncapped"] = round(
            b["candidate_pairs_uncapped"]
            / max(a["candidate_pairs_uncapped"], 1), 2,
        )
        out["pair_ratio_capped"] = round(
            b["candidate_pairs_capped"]
            / max(a["candidate_pairs_capped"], 1), 2,
        )
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "SCALING_LSH_r13.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "scales"}))


if __name__ == "__main__":
    main()
