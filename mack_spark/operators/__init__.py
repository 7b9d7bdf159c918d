"""Distributed operators for LLM-data-pipeline workloads.

These are the shuffling/joining counterparts of the per-row expressions
in :mod:`mack_spark.functions`: exact & near deduplication, similarity
search, text statistics, sessionization. All return DataFrames (no table
mutation) so they compose with the table layer and the oracle harness.
"""

from mack_spark.operators.skew import key_skew_profile, salted_join
from mack_spark.operators.profile import (
    column_profile,
    count_anomaly_windows,
    equal_frequency_histogram,
    exact_percentiles,
    grouped_exact_percentiles,
    numeric_histogram,
    numeric_outlier_fences,
    population_stability,
)
from mack_spark.operators.dedup_text import (
    append_to_lsh_index,
    build_lsh_index,
    lsh_pairs_against_index,
    ngram_containment_pairs,
    span_contamination,
    duplicated_ngram_spans,
    strip_duplicate_spans,
    exact_dedup_survivors,
    exact_duplicate_groups,
    minhash_signatures,
    lsh_candidate_pairs,
    contamination_check,
    ngram_jaccard_pairs,
    simhash_bits,
    simhash_near_pairs,
)
from mack_spark.operators.quality import gopher_quality_flags, quality_by_source
from mack_spark.operators.mixing import apply_mix, mix_allocation, mix_report
from mack_spark.operators.shard import (
    assign_shards,
    shard_manifest,
    write_training_shards,
)
from mack_spark.operators.similarity import (
    append_to_ivf_index,
    embedding_centroids_long,
    embedding_near_dup_pairs_banded,
    near_dup_bits_for,
    brute_force_topk,
    brute_force_topk_pandas,
    build_ivf_index,
    cluster_balance,
    embedding_centroids,
    embedding_diversity,
    embedding_near_dup_pairs,
    ivf_topk,
    ivf_topk_from_index,
    lsh_bucket,
    lsh_bucket_int,
    lsh_bucketed_topk,
    lsh_multitable_topk,
    lsh_probe_buckets,
    lsh_probe_buckets_subset,
    quantize_embeddings,
)
from mack_spark.operators.textstats import (
    lang_split_consistency,
    unigram_logprob_score,
    corpus_cube,
    corpus_rollup,
    doc_stats,
    vocab_census,
    winnow_fingerprints,
)
from mack_spark.operators.chunking import (
    chunk_dedup_stats,
    chunk_documents,
    tfidf_top_terms,
)
from mack_spark.operators.audit import referential_audit
from mack_spark.operators.cohort import retention_cohorts
from mack_spark.operators.profile import exact_percentiles_multi, numeric_correlations
from mack_spark.operators.sessionize import (
    conversion_funnel,
    event_debounce,
    event_gap_percentiles,
    gap_fill_daily,
    sessionize,
)
from mack_spark.operators.asof import asof_join
from mack_spark.operators.cluster import (
    connected_components,
    drop_near_duplicates,
    near_dup_cluster_sizes,
    near_dup_clusters,
    semantic_dedup_report,
)
from mack_spark.operators.interval import interval_join
from mack_spark.operators.sampling import deterministic_sample, stratified_sample
from mack_spark.operators.boilerplate import line_doc_frequency, strip_boilerplate
from mack_spark.operators.pq import (
    encode_pq,
    ivfpq_topk,
    pq_search,
    pq_topk,
    pq_topk_rerank,
    train_pq_codebooks,
)
from mack_spark.operators.redact import (
    pii_counts,
    pii_rollup,
    redact_pii,
    strip_urls,
)

__all__ = [
    "key_skew_profile",
    "ivfpq_topk",
    "line_doc_frequency",
    "strip_boilerplate",
    "encode_pq",
    "pq_search",
    "pq_topk",
    "pq_topk_rerank",
    "train_pq_codebooks",
    "pii_counts",
    "pii_rollup",
    "redact_pii",
    "strip_urls",
    "exact_dedup_survivors",
    "exact_duplicate_groups",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "column_profile",
    "salted_join",
    "contamination_check",
    "exact_percentiles",
    "numeric_histogram",
    "ngram_jaccard_pairs",
    "simhash_bits",
    "simhash_near_pairs",
    "brute_force_topk",
    "brute_force_topk_pandas",
    "embedding_near_dup_pairs",
    "build_ivf_index",
    "ivf_topk",
    "ivf_topk_from_index",
    "lsh_bucketed_topk",
    "quantize_embeddings",
    "doc_stats",
    "corpus_cube",
    "corpus_rollup",
    "winnow_fingerprints",
    "asof_join",
    "connected_components",
    "deterministic_sample",
    "interval_join",
    "stratified_sample",
    "near_dup_clusters",
    "sessionize",
    "duplicated_ngram_spans",
    "gopher_quality_flags",
    "quality_by_source",
    "apply_mix",
    "mix_allocation",
    "mix_report",
    "assign_shards",
    "shard_manifest",
    "write_training_shards",
    "embedding_centroids",
    "strip_duplicate_spans",
    "cluster_balance",
    "vocab_census",
    "retention_cohorts",
    "numeric_correlations",
    "exact_percentiles_multi",
    "append_to_ivf_index",
    "append_to_lsh_index",
    "build_lsh_index",
    "lsh_pairs_against_index",
    "embedding_centroids_long",
    "embedding_near_dup_pairs_banded",
    "near_dup_bits_for",
    "equal_frequency_histogram",
    "numeric_outlier_fences",
    "population_stability",
    "ngram_containment_pairs",
    "span_contamination",
    "lang_split_consistency",
    "unigram_logprob_score",
    "event_debounce",
    "gap_fill_daily",
    "conversion_funnel",
    "event_gap_percentiles",
    "drop_near_duplicates",
    "near_dup_cluster_sizes",
    "semantic_dedup_report",
    "count_anomaly_windows",
    "grouped_exact_percentiles",
]
