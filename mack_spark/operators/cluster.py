"""Connected components over near-duplicate pair graphs.

Pair generators (minhash-LSH, simhash, embedding-cosine) emit edges;
real dedup pipelines then need the transitive closure — "A~B and B~C
means A, B, C are one group, keep one" — which is connected components.
This is the one genuinely iterative algorithm in the engine: min-label
propagation, a driver loop of join+aggregate rounds.

SCALE: each round is a bounded number of narrow-key shuffles
(neighbor-min join, label-of-label shortcut self-join, hooking
groupBy+join). Rounds needed = O(log n)-class: the shortcut halves the
distance a minimum still has to travel and the hooking step collapses
label chains from the root side (measured: a sparse 200-node random
graph needs 22 rounds with the shortcut alone, 9 with shortcut+hook —
same 9 as a 120-node path graph). Near-dup clusters are dense (tiny
diameters), so 2-4 rounds is typical regardless of corpus size.
``localCheckpoint`` after every round truncates lineage, and
``_rebase`` resets the checkpoint's inherited size ESTIMATE — without
the first the plan tree grows exponentially, without the second
Catalyst's size-in-bytes product compounds into a multi-megabit
BigInteger and planning alone takes minutes per round by round ~12.
Both failure modes kill the job on planning long before data size
matters.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)


def _rebase(df: DataFrame) -> DataFrame:
    """Re-wrap a checkpoint-materialized frame as a brand-new scan so
    Catalyst's size estimate resets.

    ``localCheckpoint`` truncates LINEAGE but the resulting scan node
    keeps the ORIGINAL plan's *estimated* statistics. In an iterative
    join loop those estimates compound multiplicatively — each round's
    size-in-bytes is a product over the previous round's — so the
    BigInteger Catalyst multiplies during join stats estimation roughly
    triples in bit length every round. By round ~12 it has millions of
    bits and a single planning pass spends minutes inside BigInteger
    Toom-Cook multiplication (measured: 0.5 s/round flat for rounds
    1-9, then 0.9 → 2.7 → 12.7 → 60 s). Re-wrapping the materialized
    RDD as a fresh DataFrame resets the estimate to the session
    default, keeping every round's planning cost constant. JVM-side
    only — rows never cross into Python.
    """
    spark = df.sparkSession
    jdf = spark._jsparkSession.createDataFrame(
        df._jdf.javaRDD(), df._jdf.schema()
    )
    return DataFrame(jdf, spark)


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    driver_max_edges: int = 500_000,
) -> DataFrame:
    """Label every node of the undirected pair graph with the minimum
    node id reachable from it (= a canonical component id).

    Returns ``(node, component)`` for every node appearing in ``edges``.
    Raises ``RuntimeError`` if not converged within ``max_iter`` rounds
    (returning a half-propagated labeling would be silently wrong); at
    the O(log diameter) convergence rate the default cap covers any
    graph that fits on a cluster, so hitting it means a logic error,
    not a big input.

    Two physical strategies behind one contract:

    * ``≤ driver_max_edges`` distinct symmetric edge rows: collect the
      edge list and run union-find with path compression on the driver
      (O(E·α), microseconds per thousand edges). A near-dup pair graph
      is usually TINY relative to the corpus, and the distributed loop
      pays ~2 Spark jobs per round regardless of data — measured 6-9 s
      for a 2k-edge graph where union-find takes 0.01 s. The collect is
      bounded by ``driver_max_edges`` (≈16 MB at the default), the same
      bounded-collect contract the PQ/k-means training paths use.
    * larger graphs: distributed min-label propagation with pointer
      doubling (O(log diameter) rounds). Shuffle sizing is the
      planner's + AQE coalescing — session state is never mutated, so
      concurrent jobs on the same SparkSession are unaffected, and the
      graphs small enough for fixed partition counts to matter take
      the driver path anyway.

    NULL node ids are dropped before either path runs (an edge with a
    NULL endpoint carries no linkage information, and NULL would break
    both Python ordering in union-find and min-label semantics). The
    driver path additionally assumes Python ``<`` agrees with Spark's
    ``F.min`` ordering for the id type — true for the int/string ids
    every pair generator in this package emits.
    """
    import math

    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).union(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    )
    sym = sym.filter(F.col("u").isNotNull() & F.col("v").isNotNull())
    sym = sym.localCheckpoint(eager=True)
    n_sym = sym.count()
    spark = edges.sparkSession
    if n_sym <= 2 * driver_max_edges:
        node_type = sym.schema["u"].dataType
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for r in sym.toLocalIterator():
            u, v = r["u"], r["v"]
            ru, rv = find(u), find(v)
            if ru != rv:
                # union by MIN root so the final relabel pass is exact
                if rv < ru:
                    ru, rv = rv, ru
                parent[rv] = ru
            parent.setdefault(u, ru)
            parent.setdefault(v, ru)
        rows = [(n, find(n)) for n in parent]
        from pyspark.sql.types import StructField, StructType

        schema = StructType(
            [
                StructField("node", node_type, False),
                StructField("component", node_type, False),
            ]
        )
        n_parts = max(1, math.ceil(len(rows) / 500_000))
        return spark.createDataFrame(rows, schema).repartition(n_parts)
    # distributed path: min-label propagation with a label-of-label
    # shortcut AND a hooking step (the owner of each label learns the
    # min candidate of its members) — shortcut alone degrades toward
    # O(diameter) on sparse random graphs (measured 22 rounds where
    # shortcut+hook takes 9 on the same 200-node graph). Shuffle
    # sizing is left to the planner plus AQE coalescing — session
    # state is NEVER mutated (a conf.set here would leak to
    # concurrent jobs sharing the SparkSession), tiny shuffles
    # coalesce at runtime, and a web-scale graph keeps the session's
    # full parallelism. Graphs small enough for fixed-partition-count
    # overhead to matter take the driver union-find path above.
    comp = _rebase(
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for rounds in range(1, max_iter + 1):
        nbr_min = (
            comp.join(sym, comp["node"] == sym["u"])
            .groupBy("v")
            .agg(F.min("component").alias("nbr_component"))
            .withColumnRenamed("v", "node")
        )
        # shortcut: also jump to the label OF my label — labels are
        # node ids, so comp[comp[node]] is one self-join.
        hop = (
            comp.alias("a")
            .join(
                comp.alias("b"),
                F.col("a.component") == F.col("b.node"),
                "left",
            )
            .select(
                F.col("a.node").alias("node"),
                F.coalesce("b.component", "a.component").alias(
                    "hop_component"
                ),
            )
        )
        # carry the previous label through the checkpoint so the
        # convergence probe is a filter on materialized data, not
        # another join against the old labeling
        cand = (
            comp.join(nbr_min, "node", "left")
            .join(hop, "node")
            .select(
                "node",
                F.col("component").alias("prev_component"),
                F.least(
                    F.col("component"),
                    F.coalesce("nbr_component", F.col("component")),
                    F.col("hop_component"),
                ).alias("cand"),
            )
        )
        # hooking: every label owner learns the minimum candidate of
        # the nodes that pointed at it last round. A candidate label
        # is always an id inside the member's own component, and the
        # owner is in that same component (min-label invariant), so
        # the assignment is safe — and it is what collapses long
        # label chains in O(log) rounds instead of O(chain length).
        hook_min = cand.groupBy(
            F.col("prev_component").alias("hook_root")
        ).agg(F.min("cand").alias("hook_component"))
        staged = _rebase(
            cand.join(
                hook_min,
                cand["node"] == hook_min["hook_root"],
                "left",
            )
            .select(
                "node",
                "prev_component",
                F.least(
                    F.col("cand"),
                    F.coalesce("hook_component", F.col("cand")),
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            staged.filter(F.col("component") != F.col("prev_component"))
            .limit(1)
            .count()
        )
        comp = staged.select("node", "component")
        if changed == 0:
            logger.info(
                "connected_components converged in %d rounds", rounds
            )
            return comp
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def near_dup_clusters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_est_jaccard: float = 0.5,
) -> DataFrame:
    """Cluster documents whose minhash-LSH estimated Jaccard is >=
    ``min_est_jaccard``; ``cluster_id`` is the minimum doc id in the
    cluster (the canonical survivor for keep-one dedup).

    Returns ``(doc_id, cluster_id)`` for every clustered document.
    """
    from mack_spark.operators.dedup_text import lsh_candidate_pairs

    # threshold applied INSIDE the call so the eager candidate
    # checkpoint there materializes the filtered pair set, not the raw
    # banding candidates
    pairs = lsh_candidate_pairs(
        df, text_col, id_col, min_est_jaccard=min_est_jaccard
    )
    return connected_components(pairs).select(
        F.col("node").alias(id_col), F.col("component").alias("cluster_id")
    )


def drop_with_clusters(
    df: DataFrame, clusters: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Collapse every cluster of a ``(id, cluster_id)`` labeling to its
    survivor: documents whose id differs from their cluster_id are
    dropped, everything else passes through. The act half of keep-one
    dedup, shared by the direct and persisted-index paths."""
    losers = clusters.filter(F.col(id_col) != F.col("cluster_id")).select(id_col)
    return df.join(losers, id_col, "left_anti")


def clusters_to_sizes(clusters: DataFrame) -> DataFrame:
    """Cluster-size histogram ``(cluster_size, n_clusters, n_docs)`` of
    a ``(id, cluster_id)`` labeling — the report half of
    :func:`near_dup_cluster_sizes`, shared with the persisted-index
    path. Two tiny aggregations, bounded by clustered docs."""
    per_cluster = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        per_cluster.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters"))
            .cast("long")
            .alias("n_docs"),
        )
        .orderBy("cluster_size")
    )


def semantic_report_from_labels(
    corpus: DataFrame,
    clusters: DataFrame,
    group_col: str = "label",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-group removal profile of a ``(id, cluster_id)`` labeling —
    the report half of :func:`semantic_dedup_report`, shared with the
    persisted-index path: one left join of the corpus against the loser
    ids + a group-cardinality aggregation."""
    losers = clusters.filter(F.col(id_col) != F.col("cluster_id")).select(id_col)
    flagged = corpus.join(losers.withColumn("__loser", F.lit(1)), id_col, "left")
    return (
        flagged.groupBy(F.col(group_col))
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum(F.coalesce(F.col("__loser"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
        .select(
            group_col,
            "n_vectors",
            "n_removed",
            F.round(
                F.lit(1.0)
                - F.col("n_removed").cast("double")
                / F.col("n_vectors").cast("double"),
                6,
            ).alias("keep_ratio"),
        )
        .orderBy(group_col)
    )


def drop_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_est_jaccard: float = 0.5,
) -> DataFrame:
    """THE end-to-end near-dup dedup: return the corpus with every
    near-duplicate cluster collapsed to its min-id survivor — the
    content-keyed twin of the reference's keep-one ``drop_duplicates``
    (mack/__init__.py:262, column-equality there, minhash-LSH estimated
    Jaccard >= ``min_est_jaccard`` here). Composes the whole pipeline a
    user otherwise wires by hand: LSH banding → candidate pairs →
    connected components → survivor anti-join.

    Unclustered documents (no near-dup) pass through untouched;
    clustered documents survive iff they ARE their cluster's id. The
    survivor rule is deterministic (min id), so output is a pure
    function of the corpus.

    SCALE: inherits the banded-LSH candidate bound (no pair blowup),
    the O(log diameter) pointer-doubling of connected_components, and
    finishes with ONE left-anti join of the corpus against the small
    non-survivor id set (clusters are rare relative to the corpus; the
    anti-join side carries ids only, broadcastable in practice).
    """
    clusters = near_dup_clusters(df, text_col, id_col, min_est_jaccard)
    return drop_with_clusters(df, clusters, id_col)


def near_dup_cluster_sizes(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_est_jaccard: float = 0.5,
) -> DataFrame:
    """Cluster-size histogram over :func:`near_dup_clusters`:
    ``(cluster_size, n_clusters, n_docs)`` — the shape report a dedup
    operator publishes before destructive removal (a fat head of
    100-doc clusters means boilerplate or a mirror crawl, not organic
    duplication, and usually wants different handling than pair dups).

    SCALE: two tiny aggregations over the clusters frame (bounded by
    clustered docs, not the corpus).
    """
    clusters = near_dup_clusters(df, text_col, id_col, min_est_jaccard)
    return clusters_to_sizes(clusters)


def semantic_dedup_report(
    corpus: DataFrame,
    threshold: float = 0.9,
    n_tables: int = 3,
    bits_per_table: int | None = None,
    group_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic dedup, reported per group BEFORE any
    destructive removal: banded-LSH cosine pairs → connected
    components → min-id survivors, rolled up to ``(group, n_vectors,
    n_removed, keep_ratio)``. The per-topic removal profile is the
    input a mixture builder inspects first — semantic dup rates differ
    wildly by source/topic, and uniform removal quotas over-prune the
    clean groups.

    SCALE: inherits the banded candidate bound (linear in n at
    scale-aware bits), pointer-doubling components (O(log diameter)
    rounds over the PAIR graph, which is far smaller than the corpus),
    and finishes with one left join of the corpus against the loser id
    set + a group-cardinality aggregation.
    """
    from mack_spark.operators.similarity import embedding_near_dup_pairs_banded

    pairs = embedding_near_dup_pairs_banded(
        corpus,
        threshold=threshold,
        n_tables=n_tables,
        bits_per_table=bits_per_table,
        id_col=id_col,
        vec_col=vec_col,
    )
    comp = connected_components(pairs.select("id_a", "id_b")).select(
        F.col("node").alias(id_col), F.col("component").alias("cluster_id")
    )
    return semantic_report_from_labels(corpus, comp, group_col, id_col)
