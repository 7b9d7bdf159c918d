"""Column-level text/embedding functions (pure ``pyspark.sql.functions``).

Everything here is a JVM-side Column expression — no Python UDFs — so
whole-stage codegen applies and the same logic is expressible as ANSI
SQL for the DuckDB oracle. All hashing is md5-based (deterministic,
engine-independent); no RNG anywhere.

SCALE: these are per-row expressions (embarrassingly parallel, no
shuffle). The shuffling operators that consume them live in
mack_spark.operators.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deliberately small so the oracle SQL stays readable.
STOPWORDS = {
    "en": ["a", "the", "of", "and", "is", "to", "in"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "est", "un", "une"],
}

TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokens(text: Column) -> Column:
    """Lowercase word tokens: split on non-alphanumeric runs, drop empties.

    Implemented without a higher-order ``filter`` (Spark evaluates array
    lambdas interpreted, outside whole-stage codegen — measured 4×
    slower): trimming boundary separator runs first means ``split``
    can never produce empty tokens, except for the all-separator case
    which the ``when`` guard maps to an empty array. Produces exactly
    the same token list as ``list_filter(regexp_split_to_array(...))``.
    """
    cleaned = F.regexp_replace(F.lower(text), "^[^a-z0-9]+|[^a-z0-9]+$", "")
    return F.when(F.length(cleaned) > 0, F.split(cleaned, TOKEN_SPLIT_RE)).otherwise(
        F.array().cast("array<string>")
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


# Subword-ish tokenization: letter runs chunked to <=4 chars (the
# typical BPE piece length), single digits, single non-alnum marks.
# Deliberately lookaround-free so the same pattern runs under Java
# regex (Spark) and RE2 (DuckDB/Go engines).
BPE_ISH_RE = "[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]"


def bpe_ish_token_count(text: Column) -> Column:
    """Approximate LLM-token count: number of ``BPE_ISH_RE`` matches.

    A cheap stand-in for a real BPE tokenizer (which would need its
    merges table shipped to executors — a broadcast + pandas_udf in
    production): counts subword-sized pieces instead of whitespace
    words, so long words cost proportionally more, as they do under a
    real tokenizer.
    """
    return F.regexp_count(text, F.lit(BPE_ISH_RE))


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles (space-joined). Empty array when < n tokens."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def minhash_column(shingles: Column, seed: int) -> Column:
    """One minhash value: lexicographic min of md5('<seed>:'||shingle).

    md5-of-seeded-string is a deterministic stand-in for a random hash
    permutation — identical in any engine with md5(); NULL when the
    shingle set is empty.
    """
    return F.array_min(
        F.transform(shingles, lambda s: F.md5(F.concat(F.lit(f"{seed}:"), s)))
    )


def minhash_signature(shingles: Column, num_hashes: int = 12) -> List[Column]:
    """Full signature as ``num_hashes`` columns — computed per-row with
    zero shuffle (SCALE: the whole signature stage is map-only)."""
    return [minhash_column(shingles, i).alias(f"mh{i}") for i in range(num_hashes)]


def doc_fingerprint(text: Column) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted
    distinct token set (a deterministic rolling-hash-style content id)."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens(text))), " "))


def stopword_hits(toks: Column, lang: str) -> Column:
    words = STOPWORDS[lang]
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def lang_id(text: Column) -> Column:
    """Stopword-vote language ID: argmax of per-language stopword hits,
    ties broken in en > de > fr order, 'und' (undetermined) when no hits.

    SCALE note: a production system would use char-n-gram profiles; the
    contract here is a cheap, fully-SQL-expressible heuristic.
    """
    toks = tokens(text)
    s_en, s_de, s_fr = (stopword_hits(toks, lg) for lg in ("en", "de", "fr"))
    return (
        F.when(s_en + s_de + s_fr == 0, F.lit("und"))
        .when((s_en >= s_de) & (s_en >= s_fr), F.lit("en"))
        .when(s_de >= s_fr, F.lit("de"))
        .otherwise(F.lit("fr"))
    )


def quality_score(text: Column) -> Column:
    """Heuristic document quality in [0,1]: blend of length band, mean
    token length band, stopword presence and alpha ratio.

    The exact formula is arbitrary by design — what matters is that it
    is deterministic, engine-independent (integer/double arithmetic in
    a fixed expression tree) and monotone in the usual quality signals.
    """
    toks = tokens(text)
    n = F.size(toks)
    n_chars = F.length(text)
    mean_tok_len = F.when(n > 0, (n_chars - (n - 1)) / n).otherwise(F.lit(0.0))
    stop_ratio = F.when(n > 0, stopword_hits(toks, "en") / n).otherwise(F.lit(0.0))
    len_band = F.when((n >= 20) & (n <= 2000), F.lit(1.0)).when(n > 0, F.lit(0.5)).otherwise(F.lit(0.0))
    tok_band = F.when((mean_tok_len >= 2.0) & (mean_tok_len <= 12.0), F.lit(1.0)).otherwise(F.lit(0.5))
    stop_band = F.when(stop_ratio > 0.01, F.lit(1.0)).otherwise(F.lit(0.6))
    return F.round(0.5 * len_band + 0.3 * tok_band + 0.2 * stop_band, 6)


# ----------------------------------------------------------------- embeddings
def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<float|double> columns via a left fold —
    sequential accumulation, so the result is order-deterministic."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
