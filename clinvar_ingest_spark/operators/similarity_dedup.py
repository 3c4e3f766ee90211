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
    jaccard,
    minhash_signature,
    shingles,
    simhash16,
)


def doc_shingles(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return docs.select(id_col, shingles(F.col(text_col)).alias("sh"))


def minhash_lsh_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    band_prefix: int = 4,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any banded minhash value.

    One band per minhash (rows=1), band value truncated to
    ``band_prefix`` hex chars to tune collision probability. Returns
    distinct (doc_a, doc_b) with doc_a < doc_b.
    """
    sh = doc_shingles(docs, id_col, text_col)
    sig = sh.select(id_col, *minhash_signature(F.col("sh")))
    bands = sig.select(
        id_col,
        F.posexplode(
            F.array(*[F.substring(F.col(f"mh{i}"), 1, band_prefix) for i in range(N_MINHASH)])
        ).alias("band_id", "band_val"),
    )
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
) -> DataFrame:
    """LSH candidates verified by exact shingle Jaccard ≥ threshold."""
    cands = minhash_lsh_candidates(docs, id_col, text_col, band_prefix)
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
