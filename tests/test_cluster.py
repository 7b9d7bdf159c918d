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
        # driver_max_edges=0 forces the distributed loop (union-find
        # always converges, so the cap only guards the iterative path)
        connected_components(edges, max_iter=1, driver_max_edges=0)


def test_long_chain_converges_under_default_cap(spark):
    """A 120-node chain (diameter 119) must converge well inside the
    default max_iter — pointer doubling makes rounds O(log diameter),
    where plain neighbor-min propagation would need 119 rounds."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(119)], ["id_a", "id_b"]
    )
    out = connected_components(edges).collect()
    assert len(out) == 120
    assert {r["component"] for r in out} == {0}


def test_two_long_chains_stay_separate(spark):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(40)]
        + [(1000 + i, 1001 + i) for i in range(40)],
        ["id_a", "id_b"],
    )
    out = connected_components(edges).collect()
    comps = {}
    for r in out:
        comps.setdefault(r["component"], set()).add(r["node"])
    assert set(comps) == {0, 1000}
    assert comps[0] == set(range(41))
    assert comps[1000] == set(range(1000, 1041))


def test_driver_and_distributed_paths_agree(spark):
    """Union-find (small-graph path) and pointer-doubling (distributed
    path) must produce identical min-labelings on the same graph."""
    import random

    rng = random.Random(7)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    fast = sorted(tuple(r) for r in connected_components(df).collect())
    dist = sorted(
        tuple(r) for r in connected_components(df, driver_max_edges=0).collect()
    )
    assert fast == dist


def test_distributed_long_chain_converges(spark):
    """The distributed loop (forced) still converges in O(log diameter)
    rounds on a 120-node chain."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(119)], ["id_a", "id_b"]
    )
    before = spark.conf.get("spark.sql.shuffle.partitions")
    comp = connected_components(edges, driver_max_edges=0)
    rows = comp.collect()
    assert len(rows) == 120
    assert all(r["component"] == 0 for r in rows)
    # the loop must not touch session state (shuffles are sized with
    # explicit repartition, not a conf override)
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
