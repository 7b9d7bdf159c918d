"""Text analysis over a document corpus: per-doc stats and rollups.

Pure built-in expressions (mack_spark.functions) + one aggregation —
map-side combinable, fully oracle-expressible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mack_spark import functions as mf


def doc_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document statistics: token count, char length, distinct-token
    ratio, language guess, quality score, content fingerprint.

    Shape: tokenize ONCE per doc, explode, and derive every stat from
    one aggregation (counts, per-language stopword hits as conditional
    sums, the distinct-token set via ``collect_set``). The per-row
    ``mf.lang_id``/``mf.quality_score`` column functions remain the
    single-column contract; this operator inlines their exact formulas
    over the aggregated counts because evaluating them per row would
    re-split the text ~8× and run interpreted array lambdas (measured
    ~3× slower end-to-end). Zero-token docs are restored by the left
    join with the same values the per-row forms produce.
    """
    hits = {
        lang: F.sum(
            F.when(F.col("t").isin(mf.STOPWORDS[lang]), 1).otherwise(0)
        ).alias(f"s_{lang}")
        for lang in ("en", "de", "fr")
    }
    agg = (
        df.select(F.col(id_col), F.explode(mf.tokens(F.col(text_col))).alias("t"))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n"),
            F.array_sort(F.collect_set("t")).alias("dt"),
            *hits.values(),
        )
    )
    base = df.select(
        F.col(id_col), F.length(F.col(text_col)).alias("n_chars_computed")
    )
    j = base.join(agg, id_col, "left")
    n = F.coalesce(F.col("n"), F.lit(0))
    nd = F.coalesce(F.size("dt"), F.lit(0))
    s_en, s_de, s_fr = (F.coalesce(F.col(f"s_{lg}"), F.lit(0)) for lg in ("en", "de", "fr"))
    lang = (
        F.when(s_en + s_de + s_fr == 0, F.lit("und"))
        .when((s_en >= s_de) & (s_en >= s_fr), F.lit("en"))
        .when(s_de >= s_fr, F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    n_chars = F.col("n_chars_computed")
    mean_tok_len = F.when(n > 0, (n_chars - (n - 1)) / n).otherwise(F.lit(0.0))
    stop_ratio = F.when(n > 0, s_en / n).otherwise(F.lit(0.0))
    len_band = (
        F.when((n >= 20) & (n <= 2000), F.lit(1.0)).when(n > 0, F.lit(0.5)).otherwise(F.lit(0.0))
    )
    tok_band = F.when((mean_tok_len >= 2.0) & (mean_tok_len <= 12.0), F.lit(1.0)).otherwise(F.lit(0.5))
    stop_band = F.when(stop_ratio > 0.01, F.lit(1.0)).otherwise(F.lit(0.6))
    quality = F.round(0.5 * len_band + 0.3 * tok_band + 0.2 * stop_band, 6)
    return j.select(
        F.col(id_col),
        n_chars,
        n.cast("int").alias("n_tokens"),
        nd.cast("int").alias("n_distinct_tokens"),
        F.round(nd / F.greatest(n, F.lit(1)), 6).alias("distinct_ratio"),
        lang.alias("lang_guess"),
        quality.alias("quality"),
        F.md5(
            F.array_join(F.coalesce(F.col("dt"), F.array().cast("array<string>")), " ")
        ).alias("fingerprint"),
    )


def corpus_cube(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    source_col: str = "source",
) -> DataFrame:
    """CUBE(lang, source) corpus profile: per-(lang, source), per-lang,
    per-source, and grand-total rows in ONE pass (rolled-up dimensions
    come back NULL). SCALE: Spark expands the cube map-side and
    partial-aggregates before the single shuffle — no per-grouping
    re-scan of the corpus."""
    toks = mf.tokens(F.col(text_col))
    return (
        df.select(
            F.col(lang_col).alias("lang"),
            F.col(source_col).alias("source"),
            F.size(toks).alias("n_tokens"),
            F.length(F.col(text_col)).alias("n_chars"),
        )
        .cube("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 7,
    window: int = 8,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., MOSS): hash
    every char ``k``-gram, slide a ``window`` of consecutive gram
    hashes, keep each window's minimum, output the distinct selected
    hashes per document.

    The rolling-hash scale path for plagiarism-style containment
    detection: two documents sharing any sufficiently long substring
    (>= k + window - 1 chars) are guaranteed to share a fingerprint.
    md5 stands in for the rolling polynomial hash — engine-independent
    and position-shiftable enough for selection purposes; the window
    min is a plain analytic ``min`` over a row frame, so the whole
    operator is one explode + one windowed shuffle on ``id_col`` +
    distinct. Expected output density is 2/(window+1) of the gram
    count. SCALE: the explode emits one row per character position —
    for very long documents, pre-chunk or stride-sample upstream.

    Returns ``(id_col, fingerprint)`` distinct pairs.
    """
    n_grams = (F.length(F.col(text_col)) - (k - 1)).alias("n_grams")
    # Repartition on the doc id BEFORE the per-character explode: the
    # downstream window (and the final distinct, by the subset rule)
    # both need hash(id) distribution, so the one exchange in this plan
    # happens HERE — moving one row per document (its text), not one
    # row per character position (id, pos, 32-char md5). Measured 5.8×
    # at sf0.1. The partition count is pinned (not advisory): AQE sizes
    # coalescing by SHUFFLE bytes, which are tiny pre-explode, and
    # would funnel the CPU-heavy post-explode work into one task.
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    ex = df.select(
        F.col(id_col),
        F.col(text_col),
        n_grams,
    ).filter(F.col("n_grams") >= window).repartition(n_part, F.col(id_col)).select(
        F.col(id_col),
        F.col("n_grams"),
        F.explode(F.sequence(F.lit(1), F.col("n_grams"))).alias("pos"),
        F.col(text_col),
    ).select(
        F.col(id_col),
        F.col("n_grams"),
        F.col("pos"),
        F.md5(F.col(text_col).substr(F.col("pos"), F.lit(k))).alias("h"),
    )
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.currentRow, window - 1)
    )
    return (
        ex.select(
            F.col(id_col),
            F.col("n_grams"),
            F.col("pos"),
            F.min("h").over(w).alias("fingerprint"),
        )
        .filter(F.col("pos") <= F.col("n_grams") - (window - 1))
        .select(id_col, "fingerprint")
        .distinct()
    )


def corpus_rollup(
    df: DataFrame, text_col: str = "text", lang_col: str = "lang", source_col: str = "source"
) -> DataFrame:
    """Corpus profile grouped by (lang, source): doc counts, token and
    char totals, mean quality.

    SCALE: a single groupBy with partial aggregation; token counting is
    per-row (no explode — ``size(split(...))`` never materializes the
    token rows in a shuffle).
    """
    toks = mf.tokens(F.col(text_col))
    return (
        df.select(
            F.col(lang_col).alias("lang"),
            F.col(source_col).alias("source"),
            F.size(toks).alias("n_tokens"),
            F.length(F.col(text_col)).alias("n_chars"),
            mf.quality_score(F.col(text_col)).alias("quality"),
        )
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
            F.round(F.avg("quality"), 6).alias("avg_quality"),
        )
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dup_frac: float = 0.2,
) -> DataFrame:
    """Gopher-style repetition quality gate: per document, the fraction
    of word-bigram OCCURRENCES that are repeats of an already-seen
    bigram, plus the most-frequent bigram's share; flags documents
    whose duplicate-bigram fraction exceeds ``max_dup_frac``
    (boilerplate / template spam in web corpora).

    SCALE: explode to (doc, bigram) once, aggregate to per-(doc,bigram)
    counts, then roll up per doc — both aggregations hash-partition on
    the SAME leading key (doc id), so Catalyst reuses one exchange for
    the two levels. No windows, no self-joins; cost is linear in token
    count.
    """
    from mack_spark.operators.dedup_text import exploded_shingles

    grams = exploded_shingles(df, text_col, id_col, shingle_size=2)
    per_gram = grams.groupBy(id_col, "sh").agg(F.count("*").alias("cnt"))
    per_doc = per_gram.groupBy(id_col).agg(
        F.sum("cnt").alias("total_bigrams"),
        F.count("*").alias("distinct_bigrams"),
        F.max("cnt").alias("top_bigram_count"),
    )
    dup_frac = F.round(
        (F.col("total_bigrams") - F.col("distinct_bigrams")).cast("double")
        / F.col("total_bigrams"),
        6,
    )
    top_frac = F.round(
        F.col("top_bigram_count").cast("double") / F.col("total_bigrams"), 6
    )
    return (
        per_doc.withColumn("dup_bigram_frac", dup_frac)
        .withColumn("top_bigram_frac", top_frac)
        .withColumn("flagged", F.col("dup_bigram_frac") > max_dup_frac)
        .orderBy(id_col)
    )


def unigram_logprob_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    smoothing: float = 0.5,
) -> DataFrame:
    """Perplexity proxy: score each document by the mean log-probability
    of its tokens under the corpus's own add-k-smoothed unigram model —
    the standard cheap quality gate before a real LM scores a corpus
    (documents full of corpus-rare junk tokens score low).

    Two passes, both shuffle-minimal at 100 TB:

    1. the unigram model is ONE map-side-combined aggregation over the
       exploded tokens (shuffle carries one row per distinct token, not
       per instance), plus a single-row total/vocab rollup;
    2. scoring re-explodes and joins tokens to the model —
       ``broadcast(counts)``, since a natural-language vocabulary is
       tens-of-MB even at corpus scale — then aggregates per doc, so
       the only real shuffle of pass 2 is on ``id_col``.

    Determinism contract (oracle-checked): per-token log-probs are
    quantized to 1e-6 via ``floor`` and summed as longs — an
    associative integer sum no aggregation order can perturb — and the
    mean is derived from that fixed-point total.

    Returns ``(id_col, n_tokens, avg_logprob, pseudo_ppl)``;
    ``pseudo_ppl = round(exp(-avg_logprob), 4)``, 0-token docs score 0.
    """
    toks = df.select(F.col(id_col), F.explode(mf.tokens(F.col(text_col))).alias("t"))
    counts = toks.groupBy("t").agg(F.count("*").alias("c"))
    model_stats = counts.agg(
        F.sum("c").alias("total"), F.count("*").alias("vocab")
    )
    k = F.lit(float(smoothing))
    scored = (
        toks.join(F.broadcast(counts), "t")
        .crossJoin(F.broadcast(model_stats))
        .select(
            F.col(id_col),
            F.floor(
                F.log((F.col("c") + k) / (F.col("total") + k * F.col("vocab")))
                * F.lit(1000000.0)
            )
            .cast("long")
            .alias("qlp"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"), F.sum("qlp").alias("qsum")
    )
    base = df.select(id_col)
    j = base.join(per_doc, id_col, "left")
    n = F.coalesce(F.col("n_tokens"), F.lit(0))
    avg = F.when(
        n > 0,
        F.round(F.col("qsum").cast("double") / n / F.lit(1000000.0), 6),
    ).otherwise(F.lit(0.0))
    return j.select(
        F.col(id_col),
        n.cast("int").alias("n_tokens"),
        avg.alias("avg_logprob"),
        F.round(F.exp(-avg), 4).alias("pseudo_ppl"),
    )


def lang_split_consistency(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Mixed-language document detector: the stopword-vote language of
    the FIRST half of the token stream vs the SECOND half. Disagreement
    flags code-switched or concatenated-page documents — docs a
    whole-doc language filter mislabels and a monolingual training mix
    should drop or split.

    Vote per half is exactly :func:`mack_spark.functions.lang_id`
    (argmax stopword hits, en>de>fr tie order, 'und' on no hits); an
    empty half (docs under 2 tokens) votes 'und'.

    Returns ``(doc_id, n_tokens, lang_first, lang_second, is_mixed)``
    where ``is_mixed`` = the halves disagree and NEITHER is 'und'.

    SCALE/shape: the doc_stats plan — tokenize ONCE, posexplode, and
    take the 6 per-half stopword hits as conditional sums in one
    aggregation (``pos < n/2`` picks the half; ``n`` rides along from
    one pre-explode ``size()``). The naive form (two array slices + six
    ``stopword_hits`` folds per row) is map-only but runs interpreted
    array lambdas over ~8 re-splits of the text — measured 6.7s vs
    ~1s at sf0.1. One shuffle on ``id_col``, combiner-friendly.
    """
    toks = mf.tokens(F.col(text_col))
    # repartition on the doc id BEFORE exploding (the exploded_shingles
    # pattern): a few large input files would otherwise serialize the
    # token explode on a handful of tasks, and the downstream groupBy
    # needs hash(id) distribution anyway — measured 0.9s vs 8.3s at
    # sf0.1 on a single-file input.
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    ex = df.repartition(n_part, F.col(id_col)).select(
        F.col(id_col), F.size(toks).alias("n"), F.posexplode(toks).alias("pos", "t")
    )
    half = F.col("pos") < F.floor(F.col("n") / F.lit(2))
    hits = []
    for lg in ("en", "de", "fr"):
        in_lang = F.col("t").isin(mf.STOPWORDS[lg])
        hits.append(
            F.sum(F.when(half & in_lang, 1).otherwise(0)).alias(f"f_{lg}")
        )
        hits.append(
            F.sum(F.when((~half) & in_lang, 1).otherwise(0)).alias(f"s_{lg}")
        )
    agg = ex.groupBy(id_col).agg(F.max("n").alias("n"), *hits)

    def _vote(prefix):
        s_en, s_de, s_fr = (
            F.coalesce(F.col(f"{prefix}_{lg}"), F.lit(0))
            for lg in ("en", "de", "fr")
        )
        return (
            F.when(s_en + s_de + s_fr == 0, F.lit("und"))
            .when((s_en >= s_de) & (s_en >= s_fr), F.lit("en"))
            .when(s_de >= s_fr, F.lit("de"))
            .otherwise(F.lit("fr"))
        )

    base = df.select(F.col(id_col))
    j = base.join(agg, id_col, "left")
    lf, ls = _vote("f"), _vote("s")
    return j.select(
        F.col(id_col),
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_tokens"),
        lf.alias("lang_first"),
        ls.alias("lang_second"),
        ((lf != ls) & (lf != "und") & (ls != "und")).alias("is_mixed"),
    )


def vocab_census(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top: int = 200,
    tokenizer: str = "words",
    bpe_merges=None,
) -> DataFrame:
    """Corpus vocabulary heavy hitters: the ``top`` words by total
    occurrences, with document spread — ``(word, n_docs,
    n_occurrences)``.

    The tokenizer-building / stopword-discovery primitive: BPE vocab
    training, stopword lists, and domain-drift monitoring all start
    from exactly this census. Uses the normalized ``tokens()``
    vocabulary (lowercase alnum runs) so counts line up with every
    other text operator in the family.

    SCALE: explode to one row per token (the budget of any tokenizing
    pass), one map-side-combinable aggregation keyed by word — Zipf
    skew is absorbed by the partial phase, since each map task emits
    each word once per phase — and a per-partition top-k
    (TakeOrderedAndProject), never a global sort. The full order is a
    total one (ties broken by spread then word), so ``top`` is
    deterministic.

    ``tokenizer="bpe"`` censuses TRAINED BPE tokens instead of words
    (pass ``bpe_merges``; :mod:`mack_spark.operators.bpe`) — the view
    a tokenizer-budget audit actually needs: which learned subwords
    dominate the corpus, not which whitespace words.
    """
    if tokenizer == "bpe":
        if bpe_merges is None:
            raise ValueError("tokenizer='bpe' needs bpe_merges")
        from mack_spark.operators.bpe import bpe_tokenize

        ex = bpe_tokenize(
            df.select(id_col, text_col), bpe_merges, text_col=text_col,
            out_col="__toks",
        ).select(
            F.col(id_col), F.explode(F.col("__toks")).alias("word")
        )
    elif tokenizer != "words":
        raise ValueError(f"unknown tokenizer {tokenizer!r}")
    else:
        ex = df.select(
            F.col(id_col),
            F.explode(mf.tokens(F.col(text_col))).alias("word"),
        )
    return (
        ex.groupBy("word")
        .agg(
            F.countDistinct(F.col(id_col)).alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .orderBy(F.desc("n_occurrences"), F.desc("n_docs"), F.asc("word"))
        .limit(top)
    )
