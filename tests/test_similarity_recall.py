"""Multi-probe LSH recall, measured against brute-force ground truth on
the real sf0.01 embeddings (VERDICT r1 item 5: at 100 TB, recall at
fixed ``bits`` is the weak point of kNN-LSH; flip-1-bit probing is the
recall knob that doesn't grow corpus-side state).

Ground truth: every brute-force neighbor pair with cos_sim >= 0.3.
Done-bar from the verdict: multi-probe recall >= 0.9 at that threshold.
"""

import os

import pytest

# slow (~210 s): statistical recall bars against brute-force ground
# truth. Correctness of the ANN operators is pinned by the
# deterministic index/probe tests (test_ivf_index, test_lsh_index,
# test_pq) in the default set.
pytestmark = pytest.mark.slow

from mack_spark.operators import (
    brute_force_topk,
    lsh_bucketed_topk,
    lsh_multitable_topk,
)

SF_DIR = "/root/testdata/sf0.01"
K = 10
THRESHOLD = 0.3
BITS = 8
DIM = 64


@pytest.fixture(scope="module")
def corpus(spark):
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"{SF_DIR} missing")
    return spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).cache()


@pytest.fixture(scope="module")
def truth(corpus):
    """(query_id, neighbor_id) pairs from exact top-K with cos >= 0.3."""
    rows = (
        brute_force_topk(corpus, corpus, k=K)
        .filter(f"cos_sim >= {THRESHOLD}")
        .select("query_id", "neighbor_id")
        .collect()
    )
    pairs = {(r[0], r[1]) for r in rows}
    assert len(pairs) > 100, "ground truth too small to measure recall"
    return pairs


def _recall(approx_df, truth_pairs):
    got = {
        (r[0], r[1])
        for r in approx_df.select("query_id", "neighbor_id").collect()
    }
    return len(got & truth_pairs) / len(truth_pairs)


def test_multiprobe_improves_recall_at_fixed_bits(corpus, truth):
    single = _recall(
        lsh_bucketed_topk(corpus, corpus, k=K, bits=BITS, dim=DIM, n_probe=1),
        truth,
    )
    multi = _recall(
        lsh_bucketed_topk(corpus, corpus, k=K, bits=BITS, dim=DIM, n_probe=4),
        truth,
    )
    # Flip-1-bit probing must buy real recall without touching corpus
    # state; the 0.9 bar needs OR-amplification (next test) because at
    # cos 0.3 (θ≈70°) per-bit collision is only ~0.6.
    assert multi > single, (single, multi)


def test_multitable_recall_meets_bar(corpus, truth):
    """The round-1 verdict's done-bar: measured recall >= 0.9 at
    threshold 0.3 vs brute_force_topk ground truth (sf0.01)."""
    approx = lsh_multitable_topk(
        corpus, corpus, k=K, bits=8, dim=DIM, n_tables=12, m_probe=4
    )
    recall = _recall(approx, truth)
    assert recall >= 0.9, f"multi-table recall {recall:.3f} < 0.9"


def test_multiprobe_subsumes_single_probe(corpus):
    """Every single-probe candidate survives under multi-probe (the
    exact bucket is always probe #1), so n_probe only ever adds recall."""
    single = lsh_bucketed_topk(corpus, corpus, k=K, bits=BITS, dim=DIM, n_probe=1)
    multi = lsh_bucketed_topk(corpus, corpus, k=K, bits=BITS, dim=DIM, n_probe=3)
    s = {(r[0], r[1]) for r in single.select("query_id", "neighbor_id").collect()}
    m = {(r[0], r[1]) for r in multi.select("query_id", "neighbor_id").collect()}
    # top-k may reshuffle ranks as candidates grow, but the candidate
    # sets are nested, so any lost pair must have been outranked by a
    # strictly better neighbor the extra probes surfaced. Pairs at
    # rank <= k in multi that were absent in single are the recall win;
    # pairs in single must not vanish unless outranked.
    assert len(m) >= len(s)


def test_ivf_kmeans_recall_at_equal_candidate_budget(corpus, truth):
    """VERDICT r2 item 8 done-bar: k-means IVF recall >= LSH multi-table
    recall at (approximately) equal candidate budget.

    Budget accounting on this fixture: LSH multi-table at 12 tables x
    2^4 subset probes over 8-bit buckets scans ~54% of the pair space
    (measured, see lsh_multitable_topk docstring). IVF probing 34 of 64
    k-means cells examines ~53% (measured offline on this fixture).
    Equal candidate spend; the k-means cells adapt to the data's
    angular structure, so per candidate examined IVF must not lose.
    The coarse grid matters: at 16 cells IVF needs ~62% of the corpus
    for the same recall — finer quantization is what buys the win.
    """
    from mack_spark.operators import ivf_topk

    lsh = lsh_multitable_topk(
        corpus, corpus, k=K, bits=8, dim=DIM, n_tables=12, m_probe=4
    )
    lsh_recall = _recall(lsh, truth)

    ivf = ivf_topk(
        corpus, corpus, k=K, n_cells=64, n_probe=34, centroids="kmeans", seed=42
    )
    ivf_recall = _recall(ivf, truth)

    print(f"\nrecall @ cos>={THRESHOLD}: lsh_multitable={lsh_recall:.3f} "
          f"ivf_kmeans={ivf_recall:.3f}")
    assert ivf_recall >= lsh_recall, (
        f"IVF k-means recall {ivf_recall:.3f} < LSH multi-table {lsh_recall:.3f}"
    )


def test_ivf_kmeans_beats_first_centroids(corpus, truth):
    """The quantizer upgrade must actually buy recall over the
    deterministic lowest-id centroids at identical (n_cells, n_probe)."""
    from mack_spark.operators import ivf_topk

    first = _recall(
        ivf_topk(corpus, corpus, k=K, n_cells=16, n_probe=3, centroids="first"),
        truth,
    )
    km = _recall(
        ivf_topk(corpus, corpus, k=K, n_cells=16, n_probe=3, centroids="kmeans"),
        truth,
    )
    print(f"\nivf recall: first={first:.3f} kmeans={km:.3f}")
    assert km >= first, (first, km)
