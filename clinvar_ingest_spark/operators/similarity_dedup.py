"""Near-duplicate detection operators for training-data pipelines.

MinHash+LSH and SimHash near-dup, n-gram Jaccard verification. The
scale path is the classic shingle → minhash → band → bucket-join: the
candidate join is an equi join on (band_id, band_value), so Spark
shuffles each doc N_BANDS times instead of comparing all pairs —
O(n·bands + candidates), never O(n²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clinvar_ingest_spark.functions.similarity import (
    N_MINHASH,
    WIDE_SIMHASH_BITS,
    jaccard,
    minhash_signature,
    shingles,
    simhash16,
    simhash_wide,
)


def doc_shingles(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return docs.select(id_col, shingles(F.col(text_col)).alias("sh"))


def doc_bands(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    band_prefix: int = 4,
) -> DataFrame:
    """(id, band_id, band_val) LSH band table — a pure per-doc map
    (shingle → minhash → banded prefix), so it can be maintained
    incrementally per storage bucket: a doc's bands never depend on any
    other doc."""
    sh = doc_shingles(docs, id_col, text_col)
    sig = sh.select(id_col, *minhash_signature(F.col("sh")))
    return sig.select(
        id_col,
        F.posexplode(
            F.array(*[F.substring(F.col(f"mh{i}"), 1, band_prefix) for i in range(N_MINHASH)])
        ).alias("band_id", "band_val"),
    )


def _cap_buckets(bands: DataFrame, max_bucket: int) -> DataFrame:
    """Drop degenerate band buckets (shared boilerplate shingles)
    before any candidate join: buckets holding more than ``max_bucket``
    docs carry no near-dup signal and make the join quadratic. One
    map-side-combinable count + a semi join, both hash-partitioned."""
    ok = (
        bands.groupBy("band_id", "band_val")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") <= max_bucket)
        .select("band_id", "band_val")
    )
    return bands.join(ok, ["band_id", "band_val"], "left_semi")


def minhash_lsh_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    band_prefix: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any banded minhash value.

    One band per minhash (rows=1), band value truncated to
    ``band_prefix`` hex chars to tune collision probability. Returns
    distinct (doc_a, doc_b) with doc_a < doc_b.

    ``max_bucket`` is the web-scale safety valve: a degenerate band
    value (a boilerplate shingle shared by millions of pages) makes its
    bucket's self-join quadratic. Buckets holding more than
    ``max_bucket`` docs are dropped before the join — a bucket that
    common carries no near-dup signal anyway (its members collide on
    boilerplate, not content), which is the standard cap in production
    MinHash dedup. The cap itself is one map-side-combinable count +
    a semi join, both hash-partitioned.
    """
    bands = doc_bands(docs, id_col, text_col, band_prefix)
    if max_bucket is not None:
        bands = _cap_buckets(bands, max_bucket)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .distinct()
    )


def minhash_lsh_dedup(
    docs: DataFrame,
    threshold: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
    band_prefix: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """LSH candidates verified by exact shingle Jaccard ≥ threshold."""
    cands = minhash_lsh_candidates(docs, id_col, text_col, band_prefix, max_bucket)
    sh = doc_shingles(docs, id_col, text_col)
    verified = (
        cands.join(sh.withColumnRenamed(id_col, "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed(id_col, "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
        .withColumn("jac", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 4))
        .filter(F.col("jac") >= threshold)
        .select("doc_a", "doc_b", "jac")
    )
    return verified


def simhash_buckets(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """SimHash per doc + bucket stats — near-dups collide on the 16-bit
    hash; at scale dedup groups by (simhash) or by hamming-ball probes."""
    sim = docs.select(id_col, simhash16(F.col(text_col)).alias("simhash"))
    return (
        sim.groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keeper"))
    )


def simhash_near_dup(
    docs: DataFrame,
    max_hamming: int = 3,
    bits: int = WIDE_SIMHASH_BITS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Wide-simhash near-dup pairs via hamming-segment probing.

    Pigeonhole: split the ``bits``-wide simhash into ``max_hamming + 1``
    equal segments — two hashes within hamming distance ``max_hamming``
    MUST agree exactly on at least one segment. Candidates are therefore
    an EQUI join on (segment_id, segment_value) — hash-partitioned,
    never all-pairs — verified by the exact popcount of the XOR. This is
    the scale path 16-bit simhash bucketing lacks: at 10^10 docs 2^16
    buckets are saturated, while 15-bit segments of a 60-bit hash keep
    candidate buckets sparse AND tolerate near (not just exact) matches.

    Returns distinct (doc_a, doc_b, hamming) with doc_a < doc_b.
    """
    n_seg = max_hamming + 1
    if bits % n_seg:
        raise ValueError(f"bits={bits} not divisible into {n_seg} segments")
    w = bits // n_seg
    mask = (1 << w) - 1
    sim = docs.select(
        F.col(id_col), simhash_wide(F.col(text_col), bits).alias("sh")
    )
    segs = sim.select(
        id_col,
        "sh",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("sh"), i * w)
                    .bitwiseAND(F.lit(mask))
                    .alias(f"s{i}")
                    for i in range(n_seg)
                ]
            )
        ).alias("seg_id", "seg_val"),
    )
    a, b = segs.alias("a"), segs.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.seg_id") == F.col("b.seg_id"))
            & (F.col("a.seg_val") == F.col("b.seg_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .distinct()
    )
    return (
        cands.withColumn(
            "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def semantic_dedup(
    corpus: DataFrame,
    n_cells: int = 8,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_mode: str = "first",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic deduplication of an
    embedding corpus — cluster with a coarse k-means quantizer, then
    WITHIN each cell mark every vector that has an earlier (lower-id)
    neighbor at cosine ≥ ``threshold``; only the first member of each
    semantic-duplicate chain survives. Returns
    ``(id, cell_id, is_dup)``.

    This is the published algorithm's shape exactly: clustering makes
    the pairwise step tractable by confining it to cells (near-dups
    land in the same cell because they are near the same centroid),
    trading a vanishing recall loss at cell boundaries for an
    O(n·cell_size) bound instead of O(n²).

    Scale: the cell assignment is shuffle-free (centroids are a plan
    literal, :func:`~clinvar_ingest_spark.operators.ann.ivf_assign`);
    the within-cell self-join shuffles once on ``cell_id``. Size
    ``n_cells`` ∝ corpus so cells stay ~10⁴–10⁵ vectors (SemDeDup uses
    50k cells at 10⁹ docs); a pathologically hot cell is bounded the
    same way as the LSH family — raise ``n_cells`` (more, smaller
    cells) or pre-cap with the banded variants. Cosine is 4dp-rounded
    at the threshold gate so the verdict is engine-stable.
    """
    from clinvar_ingest_spark.functions.similarity import cosine
    from clinvar_ingest_spark.operators.ann import ivf_assign

    _cents, assigned = ivf_assign(
        corpus, n_cells, id_col, vec_col, centroid_mode
    )
    slim = assigned.select(id_col, "cell_id", vec_col)
    x, y = slim.alias("x"), slim.alias("y")
    dup = (
        x.join(
            y,
            (F.col("x.cell_id") == F.col("y.cell_id"))
            & (F.col(f"y.{id_col}") < F.col(f"x.{id_col}")),
        )
        .where(
            F.round(
                cosine(F.col(f"x.{vec_col}"), F.col(f"y.{vec_col}")), 4
            )
            >= threshold
        )
        .select(F.col(f"x.{id_col}").alias(id_col))
        .distinct()
        .withColumn("_d", F.lit(True))
    )
    return (
        slim.select(id_col, "cell_id")
        .join(dup, id_col, "left")
        .select(
            id_col,
            "cell_id",
            F.coalesce(F.col("_d"), F.lit(False)).alias("is_dup"),
        )
    )


def cross_corpus_neardup(
    train: DataFrame,
    eval_docs: DataFrame,
    threshold: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
    band_prefix: int = 4,
    max_bucket: int | None = None,
    broadcast_eval: bool = True,
) -> DataFrame:
    """FUZZY decontamination pairs: training documents near-duplicate
    to any held-out evaluation document. The exact-n-gram
    decontamination gate (curation.eval_decontamination) misses
    paraphrased or lightly-edited leaks; this is the MinHash version —
    the two are complementary, run both before a training cut.

    Same shingle → minhash → band machinery as within-corpus dedup,
    but the band join is TRAIN × EVAL instead of a self-join, and the
    eval side of a decontamination run is small by definition
    (benchmarks, not corpora) — ``broadcast_eval=True`` pins it
    map-side so the train band table is never shuffled at all. Each
    candidate pair is verified by exact shingle Jaccard ≥ threshold
    (rounded to 4, the module's portability contract).

    ``max_bucket`` drops degenerate train-side band buckets (shared
    boilerplate) before the join, same rationale as
    :func:`minhash_lsh_candidates`.

    Returns verified (train_id, eval_id, jac) pairs. Feed them to an
    anti join to cut the corpus, or aggregate per train_id for an
    audit table (see the fuzzy_decontamination query gate)."""
    tb = doc_bands(train, id_col, text_col, band_prefix).withColumnRenamed(
        id_col, "train_id"
    )
    if max_bucket is not None:
        tb = _cap_buckets(tb, max_bucket)
    eb = doc_bands(
        eval_docs, id_col, text_col, band_prefix
    ).withColumnRenamed(id_col, "eval_id")
    if broadcast_eval:
        eb = F.broadcast(eb)
    cands = (
        tb.join(eb, ["band_id", "band_val"])
        .select("train_id", "eval_id")
        .distinct()
    )
    sh_t = doc_shingles(train, id_col, text_col).select(
        F.col(id_col).alias("train_id"), F.col("sh").alias("sh_t")
    )
    sh_e = doc_shingles(eval_docs, id_col, text_col).select(
        F.col(id_col).alias("eval_id"), F.col("sh").alias("sh_e")
    )
    if broadcast_eval:
        sh_e = F.broadcast(sh_e)
    return (
        cands.join(sh_t, "train_id")
        .join(sh_e, "eval_id")
        .withColumn("jac", F.round(jaccard(F.col("sh_t"), F.col("sh_e")), 4))
        .filter(F.col("jac") >= threshold)
        .select("train_id", "eval_id", "jac")
    )
