"""Distributed byte-pair-encoding (BPE) tokenizer training.

The classic Sennrich et al. (ACL 2016) merge loop, re-expressed as
Spark aggregates so it trains on a full corpus instead of a sampled
word list:

1. ``word_frequencies`` collapses the corpus to its DISTINCT words with
   counts — one shuffle, after which every training iteration is
   corpus-size-independent (the word table is Zipf-bounded, and an
   optional ``min_freq`` floor bounds it further).
2. Each merge step counts adjacent symbol pairs weighted by word
   frequency (one map-side-combinable aggregate), picks the argmax
   with a total-order tie-break (count desc, lhs asc, rhs asc), and
   applies the merge to every word via ONE literal ``replace`` — no
   per-row Python anywhere.

Symbol sequences are carried as ``\\x1f``-wrapped strings
(``\\x1f a \\x1f \\x1f b \\x1f``): ``replace`` on that encoding is
exactly BPE's greedy left-to-right non-overlapping merge application,
and the encoding round-trips identically through Spark's ``replace``
and the DuckDB oracle's (both scan left-to-right), so the whole
iterative algorithm is value-hash comparable across engines.

``bpe_segment`` replays a learned merge list over new text as a nested
codegen expression chain (n_merges literal replaces inside one
``transform``) — the inference half of the tokenizer.

Reference analog: none (the reference ships raw text to BigQuery);
this is the engine addition a pretraining corpus needs.  scale: pair
counting shuffles the distinct-word table (NOT the corpus) once per
merge; the argmax is a 1-row sort; merge application is a broadcast
join against that single row.  Driver state is n_merges tiny rows.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Unit-separator control char: never appears in the word pattern's
# alphabet, so wrapped-boundary matches can't cross token boundaries.
SEP = "\x1f"

WORD_PATTERN = "[a-z]+"

MERGES_SCHEMA = (
    "step int, lhs string, rhs string, merged string, pair_count long"
)


def word_frequencies(
    docs: DataFrame,
    text_col: str = "text",
    pattern: str = WORD_PATTERN,
    min_freq: int = 1,
) -> DataFrame:
    """(word, freq) over the lower-cased corpus — the only pass that
    touches full documents; everything downstream works on this
    Zipf-bounded distinct-word table."""
    wf = (
        docs.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(pattern), 0
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    if min_freq > 1:
        wf = wf.where(F.col("freq") >= F.lit(min_freq))
    return wf


def _wrap(word) -> F.Column:
    """'abc' -> '\\x1fa\\x1f\\x1fb\\x1f\\x1fc\\x1f' (each symbol
    fenced), the string encoding of the initial character sequence."""
    return F.regexp_replace(word, "(.)", SEP + "$1" + SEP)


def _toks(seq) -> F.Column:
    return F.split(F.btrim(seq, F.lit(SEP)), SEP + SEP)


def _pair_counts(seqs: DataFrame) -> DataFrame:
    """Adjacent-pair counts weighted by word frequency.  Single-symbol
    words produce empty slices and drop out at the explode."""
    toks = _toks(F.col("seq"))
    n = F.size(toks)
    zipped = F.arrays_zip(
        F.slice(toks, 1, n - 1).alias("lhs"),
        F.slice(toks, 2, n - 1).alias("rhs"),
    )
    return (
        seqs.select("freq", F.explode(zipped).alias("p"))
        .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
        .agg(F.sum("freq").cast("long").alias("pair_count"))
    )


def _merge_pattern(lhs, rhs) -> tuple[F.Column, F.Column]:
    pat = F.concat(
        F.lit(SEP), lhs, F.lit(SEP + SEP), rhs, F.lit(SEP)
    )
    rep = F.concat(F.lit(SEP), lhs, rhs, F.lit(SEP))
    return pat, rep


def bpe_train(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    pattern: str = WORD_PATTERN,
    min_freq: int = 1,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns the merge table
    (step, lhs, rhs, merged, pair_count) materialized driver-side —
    n_merges rows, the model itself, so metadata-scale by definition.

    Each iteration is one distributed aggregate over the distinct-word
    table plus a broadcast-1-row merge application; intermediate word
    tables are persisted per step (and unpersisted on exit) so step k
    doesn't recompute the k-1 replace chain.
    """
    spark = docs.sparkSession
    wf = word_frequencies(docs, text_col, pattern, min_freq)
    seqs = wf.select(
        "word", "freq", _wrap(F.col("word")).alias("seq")
    ).persist()
    cached = [seqs]
    merges: list[tuple] = []
    try:
        for step in range(1, n_merges + 1):
            best = (
                _pair_counts(seqs)
                .orderBy(F.col("pair_count").desc(), "lhs", "rhs")
                .limit(1)
                .collect()
            )
            if not best:  # every word fully merged: stop early
                break
            lhs, rhs, cnt = best[0]["lhs"], best[0]["rhs"], best[0]["pair_count"]
            merges.append((step, lhs, rhs, lhs + rhs, cnt))
            pat, rep = _merge_pattern(F.lit(lhs), F.lit(rhs))
            seqs = seqs.select(
                "word", "freq", F.replace(F.col("seq"), pat, rep).alias("seq")
            ).persist()
            cached.append(seqs)
        return spark.createDataFrame(merges, MERGES_SCHEMA)
    finally:
        for c in cached:
            c.unpersist()


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "subwords",
    pattern: str = WORD_PATTERN,
) -> DataFrame:
    """Apply a learned merge list to text: tokenize into words, replay
    every merge on each word's wrapped sequence (nested literal
    replaces — pure codegen, no shuffle, no Python), and flatten the
    per-word symbol arrays into one subword array column."""

    def seg_word(w):
        seq = reduce(
            lambda s, m: F.replace(
                s, *_merge_pattern(F.lit(m[0]), F.lit(m[1]))
            ),
            merges,
            _wrap(w),
        )
        return _toks(seq)

    words = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(pattern), 0
    )
    return df.withColumn(
        out_col, F.flatten(F.transform(words, seg_word))
    )
