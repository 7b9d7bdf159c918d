"""embedding_diversity: exact identity vs brute-force pairwise cosine."""

import itertools
import math

from mack_spark.operators.similarity import embedding_diversity


def _brute_force_fixed(vectors, scale=1_000_000):
    """Mean pairwise cosine of the fix-pointed unit vectors — the exact
    quantity the operator defines."""
    fixed = []
    for v in vectors:
        nrm = math.sqrt(sum(x * x for x in v))
        fixed.append([math.floor(x / nrm * scale) for x in v])
    n = len(fixed)
    tot = 0
    for a, b in itertools.permutations(range(n), 2):
        tot += sum(x * y for x, y in zip(fixed[a], fixed[b]))
    return round(tot / (n * (n - 1)) / (scale * scale), 6)


def test_diversity_matches_brute_force(spark):
    groups = {
        "tight": [[1.0, 0.1, 0.0], [1.0, 0.0, 0.1], [0.9, 0.1, 0.1]],
        "spread": [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0], [-1.0, 0.0, 0.0]],
    }
    rows = [
        (g, [float(x) for x in v])
        for g, vs in groups.items()
        for v in vs
    ]
    df = spark.createDataFrame(rows, "label string, embedding array<float>")
    out = {r["label"]: r for r in embedding_diversity(df).collect()}
    for g, vs in groups.items():
        # recompute from the float32-rounded values Spark actually sees
        f32 = [[float(__import__("numpy").float32(x)) for x in v] for v in vs]
        assert out[g]["n_vectors"] == len(vs)
        assert out[g]["mean_pairwise_cos"] == _brute_force_fixed(f32)
    assert out["tight"]["mean_pairwise_cos"] > out["spread"]["mean_pairwise_cos"]


def test_diversity_excludes_zero_vectors_and_singletons(spark):
    rows = [
        ("a", [0.0, 0.0]),        # zero vector: dropped, not NaN-poisoning
        ("a", [1.0, 0.0]),
        ("a", [0.0, 1.0]),
        ("b", [1.0, 1.0]),        # singleton group -> NULL score
    ]
    df = spark.createDataFrame(rows, "label string, embedding array<float>")
    out = {r["label"]: r for r in embedding_diversity(df).collect()}
    assert out["a"]["n_vectors"] == 2 and out["a"]["mean_pairwise_cos"] == 0.0
    assert out["b"]["n_vectors"] == 1 and out["b"]["mean_pairwise_cos"] is None
