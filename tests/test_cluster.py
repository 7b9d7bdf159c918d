"""connected_components: multi-round propagation on chains, separate
components, empty input."""

import pytest

from mack_spark.operators import connected_components


def test_chain_and_separate_components(spark):
    # chain 1-2-3-4-5 (diameter forces several rounds) + pair 10-11
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (4, 5), (10, 11)], ["id_a", "id_b"]
    )
    out = {
        (r["node"], r["component"]) for r in connected_components(edges).collect()
    }
    assert out == {(1, 1), (2, 1), (3, 1), (4, 1), (5, 1), (10, 10), (11, 10)}


def test_empty_edges(spark):
    edges = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(edges).count() == 0


def test_non_convergence_raises(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["id_a", "id_b"])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=1)
