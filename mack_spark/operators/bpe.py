"""Deterministic byte-level BPE tokenizer (round 15).

LLM pipelines pack, mix, and budget by REAL tokenizer counts, not
whitespace — a packing plan built on whitespace counts overflows the
context window the moment the corpus hits code or CJK. This module is
the engine-native version of that contract:

* :func:`train_bpe_merges` — classic byte-pair-encoding merge
  training (Sennrich et al. 2016, the GPT-2 byte-level variant's
  core loop) on a HASH-GATED BOUNDED sample of the corpus, the same
  ``256·k`` driver-side fit pattern as
  :func:`mack_spark.operators.pq.train_pq_codebooks`: one corpus
  count derives the fraction, an md5 gate keyed on the id makes the
  sample deterministic, and the collect is bounded regardless of
  corpus size. Training itself is pure Python over word frequencies
  (the standard formulation: merge counts are weighted by word
  frequency, ties break lexicographically — bit-identical across
  environments by construction).
* :func:`store_bpe_tokenizer` / :func:`load_bpe_tokenizer` — the
  merge table persists in TABLE PROPERTIES (the
  :func:`~mack_spark.operators.similarity.build_ivf_index`
  precedent): the tokenizer travels with the table, and every reader
  tokenizes identically.
* :func:`bpe_token_count` / :func:`bpe_tokenize` — executor-side
  application through Arrow-batched ``mapInPandas``. Each batch
  dedupes its words first (``value_counts``): Zipf's law means a
  batch of documents holds FAR fewer distinct words than words, so
  the per-word merge loop runs once per distinct word per batch, not
  once per occurrence.

Words are the non-empty pieces of a whitespace split; each word is
encoded over its UTF-8 bytes (mapped through latin-1 so every byte is
a one-char string symbol — the byte-level alphabet needs no
unknown-token escape hatch, exactly why GPT-2 chose bytes).

SCALE: training is one bounded collect; application is map-only (no
shuffle, no driver data) with the merge table broadcast by closure
(KBs). The encode loop is O(word_len · merges_applied) per DISTINCT
word per batch.
"""

from __future__ import annotations

import json
from typing import Dict, Iterable, List, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "train_bpe_merges",
    "train_bpe_merges_from_texts",
    "bpe_token_count",
    "bpe_tokenize",
    "encode_word",
    "store_bpe_tokenizer",
    "load_bpe_tokenizer",
    "BPE_PROPERTY",
]

BPE_PROPERTY = "mack.bpe.merges"


def _word_bytes(word: str) -> List[str]:
    """One symbol per UTF-8 byte, as latin-1 one-char strings (every
    byte representable; concatenation of symbols == concatenation of
    bytes)."""
    return [bytes([b]).decode("latin-1") for b in word.encode("utf-8")]


def train_bpe_merges_from_texts(
    texts: Iterable[str], n_merges: int = 64
) -> List[Tuple[str, str]]:
    """Deterministic BPE merge training over raw texts (driver-side;
    the bounded-sample contract is the caller's — see
    :func:`train_bpe_merges`). Returns merges in application priority
    order. Tie-break: highest pair count, then lexicographically
    smallest pair — a total order, so the result is reproducible
    bit-for-bit anywhere."""
    freq: Dict[str, int] = {}
    for t in texts:
        if not t:
            continue
        for w in t.split():
            freq[w] = freq.get(w, 0) + 1
    seqs: Dict[str, Tuple[List[str], int]] = {
        w: (_word_bytes(w), c) for w, c in freq.items()
    }
    merges: List[Tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Dict[Tuple[str, str], int] = {}
        for sym, (seq, c) in seqs.items():
            for i in range(len(seq) - 1):
                p = (seq[i], seq[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break  # nothing left worth merging
        merges.append(best)
        a, b = best
        ab = a + b
        for w, (seq, c) in seqs.items():
            i = 0
            out: List[str] = []
            while i < len(seq):
                if i < len(seq) - 1 and seq[i] == a and seq[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[w] = (out, c)
    return merges


def train_bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 64,
    sample_fraction: Optional[float] = None,
    max_train_rows: int = 4096,
    salt: str = "bpe",
) -> List[Tuple[str, str]]:
    """Train merges on a hash-gated bounded sample of ``df`` — the
    :func:`~mack_spark.operators.pq.train_pq_codebooks` sampling
    contract verbatim: ``sample_fraction=None`` derives the fraction
    from one corpus count so the expected sample is
    ``max_train_rows``; the md5 gate keyed ``salt || id`` makes the
    sample a pure corpus property (same corpus → same sample → same
    merges, on any cluster)."""
    d = df.select(id_col, text_col)
    if sample_fraction is None:
        n = d.count()
        sample_fraction = (
            1.0 if n <= max_train_rows else max_train_rows / float(n)
        )
    if sample_fraction < 1.0:
        cut = format(int(sample_fraction * 2**32), "08x")
        d = d.filter(
            F.substring(
                F.md5(F.concat_ws(
                    "||", F.lit(salt), F.col(id_col).cast("string")
                )),
                1,
                8,
            )
            < F.lit(cut)
        )
    rows = d.orderBy(id_col).collect()
    return train_bpe_merges_from_texts(
        (r[1] for r in rows), n_merges=n_merges
    )


def _ranks(merges: List[Tuple[str, str]]) -> Dict[Tuple[str, str], int]:
    return {tuple(m): i for i, m in enumerate(merges)}


def encode_word(word: str, ranks: Dict[Tuple[str, str], int]) -> List[str]:
    """BPE-encode one word: repeatedly apply the present pair with the
    LOWEST merge rank (training order = application priority) until no
    learned pair remains."""
    seq = _word_bytes(word)
    while len(seq) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(seq) - 1):
            r = ranks.get((seq[i], seq[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        seq[best_i:best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return seq


def _apply_batched(df, text_col, merges, make_value, out_field):
    """Shared Arrow-batched application: per batch, dedupe words, run
    the merge loop once per distinct word, map back per row."""
    import pandas as pd  # noqa: F401 (mapInPandas contract)
    from pyspark.sql.types import StructType

    ranks = _ranks(merges)
    # copy — StructType.add would mutate the input frame's schema
    schema = StructType(list(df.schema.fields) + [out_field])

    def run(batches):
        cache: Dict[str, object] = {}

        def per_word(w: str):
            v = cache.get(w)
            if v is None:
                v = make_value(encode_word(w, ranks))
                cache[w] = v
            return v

        for pdf in batches:
            col = pdf[text_col]
            pdf = pdf.copy()
            pdf[out_field.name] = [
                (
                    sum(per_word(w) for w in t.split())
                    if out_field.dataType.typeName() == "long"
                    else [
                        tok for w in t.split() for tok in per_word(w)
                    ]
                )
                if isinstance(t, str)
                else (0 if out_field.dataType.typeName() == "long" else [])
                for t in col
            ]
            yield pdf

    return df.mapInPandas(run, schema=schema)


def bpe_token_count(
    df: DataFrame,
    merges: List[Tuple[str, str]],
    text_col: str = "text",
    out_col: str = "n_bpe_tokens",
) -> DataFrame:
    """``df`` + a ``long`` column with the BPE token count of
    ``text_col`` under ``merges``. Map-only; merge table rides the
    task closure (KBs)."""
    from pyspark.sql.types import LongType, StructField

    return _apply_batched(
        df, text_col, merges,
        make_value=len,
        out_field=StructField(out_col, LongType()),
    )


def bpe_tokenize(
    df: DataFrame,
    merges: List[Tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """``df`` + an ``array<string>`` column of the BPE tokens (for
    census/explode flows; prefer :func:`bpe_token_count` when only
    counts are needed — it never materializes the arrays)."""
    from pyspark.sql.types import ArrayType, StringType, StructField

    return _apply_batched(
        df, text_col, merges,
        make_value=list,
        out_field=StructField(out_col, ArrayType(StringType())),
    )


def store_bpe_tokenizer(table, merges: List[Tuple[str, str]]) -> None:
    """Persist the merge table in table properties (the IVF-index
    precedent) so the tokenizer travels with the data."""
    table.set_properties({
        BPE_PROPERTY: json.dumps([list(m) for m in merges]),
    })


def load_bpe_tokenizer(table) -> List[Tuple[str, str]]:
    props = table.detail()["properties"]
    raw = props.get(BPE_PROPERTY)
    if raw is None:
        raise KeyError(
            f"table has no {BPE_PROPERTY!r} property — run"
            " train_bpe_merges + store_bpe_tokenizer first"
        )
    return [tuple(m) for m in json.loads(raw)]
