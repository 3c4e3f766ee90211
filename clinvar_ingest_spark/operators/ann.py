"""Approximate nearest-neighbor search over embedding columns.

Two physical strategies:

* ``cosine_topk`` — exact brute force: broadcast the (small) query set
  against the corpus, rank per query. O(|Q|·n) dot products, all inside
  codegen'd higher-order functions; the right plan when |Q| is small.
* ``lsh_cosine_topk`` — random-hyperplane-style bucketing (deterministic
  sign-bit planes) so each query only scans its bucket: the scale path
  when |Q|·n is too big. Recall < 1 by design; the oracle replays the
  same buckets so correctness is checked exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from clinvar_ingest_spark.functions.similarity import cosine


def _ranked(pairs: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine; ties broken by neighbor id (deterministic)."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
        )
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    pairs = q.crossJoin(c).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 4).alias("cos_sim"),
    )
    return _ranked(pairs, k)


def sign_bucket(vec_col, n_bits: int = 4):
    """Deterministic LSH bucket: sign bits of the first n_bits dims
    (a fixed, engine-portable stand-in for random hyperplanes)."""
    b = F.lit(0)
    for i in range(n_bits):
        b = b + F.when(F.element_at(vec_col, i + 1) > 0, F.lit(1 << i)).otherwise(
            F.lit(0)
        )
    return b


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 4,
) -> DataFrame:
    """Bucketed ANN: only same-bucket candidates are scored. The
    candidate join is an equi join on the bucket id — shuffle-partitioned,
    no cross join, so it scales to corpora where |Q|·n is infeasible."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        sign_bucket(F.col(vec_col), n_bits).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        sign_bucket(F.col(vec_col), n_bits).alias("bucket"),
    )
    pairs = q.join(c, "bucket").select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 4).alias("cos_sim"),
    )
    return _ranked(pairs, k)
