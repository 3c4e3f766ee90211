"""Similarity primitives: shingles, MinHash, SimHash, cosine.

Engine-portable by construction: hashes derive from ``md5`` hex (same
digest in Spark and DuckDB), hex→int via base-16 conversion, so every
signature is reproducible in the oracle SQL. All builders are JVM-side
column expressions (higher-order array functions) — no Python in the
hot path; at 100 TB these run inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from clinvar_ingest_spark.functions.text import ws_tokens

N_MINHASH = 4          # signature length
SHINGLE_K = 3          # word n-gram width
SIMHASH_BITS = 16      # simhash width (hex-nibble portable)


def shingles(text: Column, k: int = SHINGLE_K) -> Column:
    """Distinct word k-gram shingles of normalized text."""
    toks = ws_tokens(F.lower(text))
    n = F.size(toks)
    idx = F.sequence(F.lit(1), n - (k - 1))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(k)]
        ),
    )
    # guard: sequence(1, n-2) would count DOWN for n<3 — emit [] instead
    return F.when(n >= k, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def _seeded_md5(seed: int):
    # NB: factory, not a default-arg lambda — pyspark treats a 2-arg
    # lambda as (element, index) and would rebind the seed to the
    # array-index column.
    return lambda s: F.md5(F.concat(F.lit(f"{seed}|"), s))


def minhash_signature(sh: Column, n_hashes: int = N_MINHASH) -> list[Column]:
    """MinHash over md5('<seed>|'||shingle): the lexicographic min hex
    digest per seeded hash family — identical in any engine with md5."""
    return [
        F.array_min(F.transform(sh, _seeded_md5(i))).alias(f"mh{i}")
        for i in range(n_hashes)
    ]


def token_hash16(tok: Column) -> Column:
    """Portable 16-bit token hash: first 4 hex nibbles of md5."""
    return F.conv(F.substring(F.md5(tok), 1, 4), 16, 10).cast("int")


def simhash16(text: Column) -> Column:
    """16-bit SimHash: per bit, tokens vote +1/−1 by their hash bit; the
    sign of the vote sets the output bit. Token multiplicity counts
    (frequency-weighted, standard SimHash)."""
    def _vote(bit: int):
        # factory (see _seeded_md5): keeps `bit` a Python int, not the
        # lambda's extra Column parameter
        return lambda acc, t: acc + F.when(
            token_hash16(t).bitwiseAND(F.lit(1 << bit)) > 0, 1
        ).otherwise(-1)

    toks = ws_tokens(F.lower(text))
    out = F.lit(0)
    for j in range(SIMHASH_BITS):
        vote = F.aggregate(toks, F.lit(0), _vote(j))
        out = out + F.when(vote > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return out


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard of two distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    uni = F.size(F.array_union(a, b)).cast("double")
    return F.when(uni > 0, inter / uni).otherwise(F.lit(0.0))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two float arrays, accumulated in float64."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    nb = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    return dot / (na * nb)
