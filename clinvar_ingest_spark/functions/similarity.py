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


WIDE_SIMHASH_BITS = 60  # 64-bit-class width; 60 = 15 hex nibbles, so the
#                         token hash stays inside a SIGNED BIGINT in both
#                         Spark and DuckDB (16 nibbles could set bit 63 and
#                         overflow the portable cast)


def token_hash_wide(tok: Column, bits: int = WIDE_SIMHASH_BITS) -> Column:
    """Portable wide token hash: first bits/4 hex nibbles of md5."""
    return F.conv(F.substring(F.md5(tok), 1, bits // 4), 16, 10).cast("long")


def simhash_wide(text: Column, bits: int = WIDE_SIMHASH_BITS) -> Column:
    """Wide SimHash (default 60 bits): the scale replacement for
    :func:`simhash16` — 2^16 buckets collapse at web scale (10^10 docs →
    ~10^5 docs per bucket); 2^60 keeps buckets sparse so hamming-segment
    probing (see operators.similarity_dedup.simhash_near_dup) stays
    selective. The token hash array is materialized ONCE per row, then
    each bit's +1/−1 vote folds over the longs — md5 runs once per
    token, not once per (token, bit)."""

    def _vote(bit: int):
        # factory (see _seeded_md5): keeps `bit` a Python int
        return lambda acc, h: acc + F.when(
            h.bitwiseAND(F.lit(1 << bit)) > 0, 1
        ).otherwise(-1)

    toks = ws_tokens(F.lower(text))
    hs = F.transform(toks, lambda t: token_hash_wide(t, bits))
    out = F.lit(0).cast("long")
    for j in range(bits):
        vote = F.aggregate(hs, F.lit(0), _vote(j))
        out = out + F.when(vote > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return out


def hyperplane_planes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes for cosine LSH: plane
    component (i, j) derives from md5(f"{i}|{j}") mapped to [-1, 1],
    rounded to 6 dp so the identical constants can be inlined into
    oracle SQL. Statistically these behave as random hyperplanes
    (md5 output is uniform) while staying reproducible in any engine —
    the 'real' random-hyperplane LSH, seeded by construction."""
    import hashlib

    planes = []
    for i in range(n_planes):
        row = []
        for j in range(dim):
            h = hashlib.md5(f"{i}|{j}".encode()).hexdigest()
            row.append(round((int(h[:8], 16) / 0xFFFFFFFF) * 2.0 - 1.0, 6))
        planes.append(row)
    return planes


def hyperplane_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: bit i = sign(vec · plane_i).
    Collision probability between two vectors is (1 - θ/π)^n_planes —
    the classic SimHash-for-cosine guarantee — unlike sign-of-first-dims
    bucketing, which ignores most of the vector."""
    b = F.lit(0)
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(x) for x in p])
        dot = F.aggregate(
            F.zip_with(vec_col, plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        b = b + F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return b


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


def quantize_i8(vec: Column) -> Column:
    """Scalar int8 quantization of a float vector: per-vector scale
    ``max|x| / 127``, codes ``floor(x/scale + 0.5)`` ∈ [-127, 127].

    The 100-TB lever for embedding columns: 4× less storage/shuffle than
    float32, and cosine is SCALE-INVARIANT, so similarity search runs
    directly on the int codes (cos(q_a, q_b) ≈ cos(a, b) with ≤ ~1e-2
    error at 64 dims) — no dequantize pass. ``floor(+0.5)`` instead of
    round(): identical half-way behavior in every engine (round() ties
    differ between Spark's HALF_UP and other engines), so the oracle
    reproduces the exact codes. Zero vectors quantize to zero codes via
    the scale floor.
    """
    absmax = F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))
    scale = F.greatest(absmax, F.lit(1e-30)) / F.lit(127.0)
    codes = F.transform(
        vec, lambda x: F.floor(x.cast("double") / scale + F.lit(0.5)).cast("int")
    )
    return F.struct(scale.alias("scale"), codes.alias("q"))
