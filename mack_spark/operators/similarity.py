"""Approximate-nearest-neighbor search over an embedding column.

Two plans over ``embeddings(vec_id, embedding: array<float>, label)``:

* :func:`brute_force_topk` — exact cosine top-k. The query side is
  broadcast; the corpus is scanned once; per-partition top-k is taken
  before the final shuffle (the window ranks only k*queries rows per
  partition... in practice Spark's TakeOrderedAndProject handles the
  final cut). Baseline and verification oracle.
* :func:`lsh_bucketed_topk` — random-hyperplane LSH (deterministic,
  md5-seeded hyperplanes): corpus and queries are bucketed by sign
  pattern; only same-bucket pairs are scored. The scale path: bucket
  count grows 2^bits, so the per-bucket join is ~n/2^bits of the corpus.

SCALE (100 TB / billions of vectors): brute force is one broadcast of
the query block (must stay ≤ ~1 GB) and a full corpus scan per query
batch — use it for reranking. The LSH plan shards the corpus by bucket
id (a plain repartition key), making each executor's candidate set
bucket-local; recall is tuned by ``bits`` (fewer bits = more recall,
bigger buckets) and by probing neighboring buckets (multi-probe not
implemented in round 1). An IVF variant (k-means coarse quantizer via
Spark ML, then in-cell brute force) is the natural next step; the
bucket-join skeleton here is identical.

No Python UDFs: dot products are ``zip_with`` + ``aggregate`` folds —
JVM-side, codegen'd. For very high dims a pandas_udf with numpy BLAS
would win; at dim=64 the expression path avoids Arrow transfer cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mack_spark import functions as mf


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_scores: int = 4,
) -> DataFrame:
    """Exact cosine top-k: for each query vector the k nearest corpus
    vectors (self-matches excluded).

    Returns ``(query_id, neighbor_id, cos_sim, rank)`` — scores rounded
    so downstream equality checks are float-stable.
    """
    # Norms are computed ONCE per row on each side before the pair
    # join, so each of the n*q scored pairs folds one array (the dot),
    # not three. FP-identical to mf.cosine: same dot, same sqrt, same
    # multiply-then-divide order.
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            mf.l2_norm(F.col(vec_col)).alias("qn"),
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        mf.l2_norm(F.col(vec_col)).alias("cn"),
    )
    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (mf.dot(F.col("qvec"), F.col("cvec")) / (F.col("qn") * F.col("cn"))).alias(
                "cos"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos", round_scores).alias("cos_sim"),
            "rank",
        )
    )


def hyperplane_components(seed: int, dim: int) -> list:
    """Deterministic pseudo-random hyperplane: component j is +1/-1 by
    the first hex digit of md5('hp<seed>:<j>'). Computed driver-side
    (tiny) so both Spark and any SQL oracle can inline the same
    literals instead of evaluating md5 per row."""
    import hashlib

    return [
        1.0 if hashlib.md5(f"hp{seed}:{j}".encode()).hexdigest()[0] in "01234567" else -1.0
        for j in range(dim)
    ]


def _hyperplane(seed: int, dim: int):
    return F.array(*[F.lit(c) for c in hyperplane_components(seed, dim)])


def lsh_bucket(vec: F.Column, bits: int, dim: int) -> F.Column:
    """Sign-pattern bucket id of a vector under ``bits`` fixed random
    hyperplanes — a ``bits``-char '0'/'1' string."""
    return F.concat(
        *[
            F.when(mf.dot(vec, _hyperplane(b, dim)) >= 0, F.lit("1")).otherwise(
                F.lit("0")
            )
            for b in range(bits)
        ]
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    bits: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_scores: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: unordered ``(id_a < id_b)``
    pairs whose cosine similarity is ≥ ``threshold``, candidate-limited
    to pairs sharing a hyperplane-LSH bucket.

    The scale path for near-dup dedup over embeddings (reference has no
    equivalent; LLM-pipeline extension per SURVEY §7 phase 5): the
    self-join is bucket-local — each of the 2^bits buckets joins only
    with itself (~n/2^bits rows per side), never the full O(n²) cross
    product. High-similarity pairs land in the same bucket with
    probability (1 - θ/π)^bits, so recall is tuned by ``bits`` (fewer
    bits = higher recall, bigger buckets).

    Returns ``(id_a, id_b, cos_sim)``.
    """
    bucketed = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        mf.l2_norm(F.col(vec_col)).alias("nrm"),
        lsh_bucket(F.col(vec_col), bits, dim).alias("bucket"),
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            (
                mf.dot(F.col("a.vec"), F.col("b.vec"))
                / (F.col("a.nrm") * F.col("b.nrm"))
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", round_scores).alias("cos_sim"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_scores: int = 4,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus into ``n_cells``
    inverted lists, probe the ``n_probe`` closest lists per query, and
    brute-force only inside the probed lists.

    The coarse quantizer is deterministic — centroids are the
    ``n_cells`` lowest-id corpus vectors — so any SQL engine can
    reproduce the exact cell assignment (no k-means randomness). At
    scale the interesting properties hold regardless of centroid
    quality: assignment is one broadcast (centroids) + map-side argmax
    (partial aggregation collapses the n_cells candidate rows per
    vector before any shuffle), and the candidate join shuffles on the
    cell id, so each executor scores ~``n_probe/n_cells`` of the
    corpus per query block instead of all of it. Swap the centroid
    seed for Spark-ML k-means centers in production; the plan shape is
    unchanged.

    Returns ``(query_id, neighbor_id, cos_sim, rank)`` — same contract
    as :func:`brute_force_topk` (self-matches excluded).
    """
    cents = F.broadcast(
        corpus.orderBy(id_col)
        .limit(n_cells)
        .select(
            F.col(id_col).alias("cid"),
            F.col(vec_col).alias("cvec"),
            mf.l2_norm(F.col(vec_col)).alias("cnrm"),
        )
    )

    def assign(df: DataFrame, out_id: str, out_vec: str, top: int) -> DataFrame:
        scored = df.select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).alias(out_vec),
            mf.l2_norm(F.col(vec_col)).alias("vnrm"),
        ).join(cents, how="cross").select(
            out_id,
            out_vec,
            "vnrm",
            "cid",
            (
                mf.dot(F.col(out_vec), F.col("cvec"))
                / (F.col("vnrm") * F.col("cnrm"))
            ).alias("cc"),
        )
        w = Window.partitionBy(out_id).orderBy(F.col("cc").desc(), F.col("cid").asc())
        return (
            scored.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= top)
            .select(out_id, out_vec, F.col("vnrm"), F.col("cid").alias("cell"))
        )

    # Corpus side: exact argmax per vector via one aggregation — the
    # struct max picks highest cosine, then lowest cid on ties; first()
    # is safe because every row in an id-group carries the same vector.
    corpus_scored = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec_full"),
        mf.l2_norm(F.col(vec_col)).alias("nnrm"),
    ).join(cents, how="cross").select(
        "neighbor_id",
        "cvec_full",
        "nnrm",
        (
            mf.dot(F.col("cvec_full"), F.col("cvec"))
            / (F.col("nnrm") * F.col("cnrm"))
        ).alias("cc"),
        F.col("cid"),
    )
    lists = corpus_scored.groupBy("neighbor_id").agg(
        F.max(F.struct(F.col("cc"), (-F.col("cid")).alias("negcid"))).alias("best"),
        F.first("cvec_full").alias("nvec"),
        F.first("nnrm").alias("nnrm"),
    ).select("neighbor_id", "nvec", "nnrm", (-F.col("best.negcid")).alias("cell"))

    probes = assign(queries, "query_id", "qvec", n_probe)

    cand = probes.join(lists, "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    # A query probing n_probe cells can see a neighbor at most once
    # (each corpus vector lives in exactly one list) — no dedup needed.
    scored = cand.select(
        "query_id",
        "neighbor_id",
        (
            mf.dot(F.col("qvec"), F.col("nvec")) / (F.col("vnrm") * F.col("nnrm"))
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos", round_scores).alias("cos_sim"),
            "rank",
        )
    )


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_err: int = 6,
) -> DataFrame:
    """Symmetric int8 quantization of an embedding column — the storage
    scale path (4× smaller than float32, 8× than float64; int8 dot
    kernels are also what production ANN serving uses).

    Per vector: ``scale = max(|x|)``; ``q_i = floor(x_i/scale*127 +
    0.5)`` — the floor(+0.5) form is spelled out so every engine rounds
    identically (no half-even vs half-away ambiguity). Map-only: no
    shuffle, no explode; the per-row array lambdas evaluate interpreted
    but beat paying an exchange for a pure storage transform.

    Returns ``(id_col, scale, qvec, max_abs_err)`` where max_abs_err is
    the reconstruction error bound actually achieved for the vector.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scale = F.array_max(F.transform(v, lambda x: F.abs(x)))
    qexpr = F.transform(
        v,
        lambda x: F.when(
            F.col("scale") > 0,
            F.floor(x / F.col("scale") * F.lit(127.0) + F.lit(0.5)).cast("int"),
        ).otherwise(F.lit(0)),
    )
    dq = F.zip_with(
        v,
        F.col("qvec"),
        lambda x, q: F.abs(x - q.cast("double") * F.col("scale") / F.lit(127.0)),
    )
    return (
        df.select(F.col(id_col), F.col(vec_col), scale.alias("scale"))
        .withColumn("qvec", qexpr)
        .withColumn(
            "max_abs_err",
            F.round(
                F.when(F.col("scale") > 0, F.array_max(dq)).otherwise(F.lit(0.0)),
                round_err,
            ),
        )
        .select(id_col, "scale", "qvec", "max_abs_err")
    )


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bits: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_scores: int = 4,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's
    hyperplane-sign bucket.

    Same output shape as :func:`brute_force_topk`; recall < 1 by design.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        mf.l2_norm(F.col(vec_col)).alias("cn"),
        lsh_bucket(F.col(vec_col), bits, dim).alias("bucket"),
    )
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            mf.l2_norm(F.col(vec_col)).alias("qn"),
            lsh_bucket(F.col(vec_col), bits, dim).alias("bucket"),
        )
    )
    scored = (
        c.join(q, "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (mf.dot(F.col("qvec"), F.col("cvec")) / (F.col("qn") * F.col("cn"))).alias(
                "cos"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos", round_scores).alias("cos_sim"),
            "rank",
        )
    )


def brute_force_topk_pandas(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_scores: int = 4,
) -> DataFrame:
    """Exact cosine top-k scored by numpy BLAS inside ``mapInPandas`` —
    the vectorized-Python twin of :func:`brute_force_topk` for high
    dimensions, where one ``C @ Q.T`` matmul per Arrow batch beats
    per-pair JVM expression evaluation.

    SCALE: the query block is collected once (queries are small by
    contract — this is batch KNN, not a join of two big sides) and
    shipped in the task closure; each executor scores its corpus
    partition batch-at-a-time and emits only its LOCAL top-k rows per
    query (≤ q·k rows per batch), so the global ranking window sees
    O(batches · q · k) rows, never the n·q score matrix. Arithmetic is
    float64, matching the JVM path to well below the rounded digits.
    """
    import numpy as np
    import pandas as pd

    qrows = queries.select(id_col, vec_col).collect()
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)
    qnorm = np.sqrt((qmat * qmat).sum(axis=1))

    def score(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            cids = pdf[id_col].to_numpy(dtype=np.int64)
            cmat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            cnorm = np.sqrt((cmat * cmat).sum(axis=1))
            sims = (cmat @ qmat.T) / np.outer(cnorm, qnorm)
            sims[cids[:, None] == qids[None, :]] = -np.inf  # self-matches
            top = min(k, sims.shape[0])
            # per-query local top-k within this Arrow batch
            idx = np.argpartition(-sims, top - 1, axis=0)[:top, :]
            out_q, out_n, out_c = [], [], []
            for j in range(sims.shape[1]):
                rows = idx[:, j]
                out_q.extend([qids[j]] * len(rows))
                out_n.extend(cids[rows])
                out_c.extend(sims[rows, j])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cos": out_c}
            )

    scored = corpus.select(id_col, vec_col).mapInPandas(
        score, "query_id long, neighbor_id long, cos double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.filter(F.col("cos") != float("-inf"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos", round_scores).alias("cos_sim"),
            "rank",
        )
    )
