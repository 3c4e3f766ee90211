"""Hashed linear text classifier inference (the fastText / Vowpal
Wabbit shape): feature = hash(token) mod dim, score = sum of weights
over token occurrences.

This is the map-side model-inference pattern a quality-filter deploy
needs at 100 TB: the weight VECTOR is a dataframe of exactly ``dim``
rows broadcast to every executor (bounded by construction — ``dim`` is
a model hyperparameter, not data-dependent, and ``max_broadcast_dim``
refuses silly values), the corpus is never shuffled for scoring, and
the per-doc reduce is one map-side-combinable integer sum.

Weights here are DERIVED (md5 of the feature id -> signed integer) so
tests and the DuckDB oracle can recompute them exactly; a real deploy
swaps ``derived_weights`` for a trained table with the same schema
(feature_id BIGINT, w BIGINT fixed-point) and nothing else changes.
Integer weights keep scores exact — ranking/thresholding is bit-stable
across engines and partitionings (same trick as graph.py's fixed-point
PageRank).

Reference analog: none (the reference classifies nothing); this is an
engine addition for webtext curation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clinvar_ingest_spark.functions.text import TOKEN_PATTERN

# weights land in [-500000, 500000]; ~0 mean by symmetry
_W_MOD = 1000001
_W_OFF = 500000


def derived_weights(
    spark: SparkSession, dim: int, seed: str = "w0"
) -> DataFrame:
    """(feature_id, w): deterministic signed-integer weights."""
    fid = F.col("id")
    w = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(seed), F.lit(":"), fid.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % _W_MOD
        - _W_OFF
    )
    return spark.range(dim).select(
        fid.alias("feature_id"), w.alias("w")
    )


def hashed_features(
    docs: DataFrame,
    dim: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str | None = None,
) -> DataFrame:
    """Sparse hashed bag-of-words: (doc_id[, y], feature_id, cnt).
    Tokenless docs vanish (they carry no gradient and score 0)."""
    cols = [F.col(id_col).alias("doc_id")]
    if label_col is not None:
        cols.append(F.col(label_col).cast("long").alias("y"))
    keys = ["doc_id", "y"] if label_col is not None else ["doc_id"]
    return (
        docs.select(
            *cols,
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), 0
                )
            ).alias("token"),
        )
        .withColumn(
            "feature_id",
            F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("long")
            % F.lit(int(dim)),
        )
        .groupBy(*keys, "feature_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def train_perceptron(
    docs: DataFrame,
    dim: int,
    epochs: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
    lr: int = 1,
    max_broadcast_dim: int = 1 << 24,
) -> tuple[DataFrame, list[int]]:
    """Distributed BATCH perceptron training over hashed features — the
    training half of the quality-classifier slot (CCNet/RefinedWeb
    train exactly this shape to score webtext). Returns the non-zero
    final weight rows ``(feature_id BIGINT, w BIGINT)`` plus the
    per-epoch mistake counts.

    Algorithm (deterministic, integer-exact): labels are ±1; each epoch
    scores every doc with the current weights (``score = Σ cnt·w``,
    exact BIGINT), takes the docs with ``y·score <= 0`` (ties are
    mistakes — w starts at 0, so epoch 1 is the class-centroid
    difference), and applies the BATCH update ``w += lr·Σ y·cnt`` over
    the mistakes. The update is a SUM, so the result is invariant to
    row order and partitioning — bit-identical across engines, which
    is what lets the full training trajectory be value-hash-gated
    against an unrolled-CTE oracle (the graph.py PageRank / bpe.py
    precedent).

    Scale shape: the corpus is tokenized ONCE into a cached sparse
    (doc_id, y, feature_id, cnt) table; each epoch is a broadcast join
    against the ≤dim-row weight vector plus two map-side-combinable
    aggregates (per-doc score, per-feature delta). The only
    driver-side state is the weight vector itself — model-sized by
    construction (``dim`` is a hyperparameter, never data-dependent),
    same bound as inference. Tokenless docs carry no gradient and are
    excluded from the mistake count.
    """
    if dim > max_broadcast_dim:
        raise ValueError(
            f"dim={dim} exceeds max_broadcast_dim={max_broadcast_dim}; "
            "a weight vector this wide must be trained via a shuffle "
            "join, not a broadcast"
        )
    spark = docs.sparkSession
    feats = hashed_features(
        docs, dim, id_col=id_col, text_col=text_col, label_col=label_col
    ).persist()
    try:
        w_map: dict[int, int] = {}
        history: list[int] = []
        for _ in range(int(epochs)):
            if w_map:
                wdf = spark.createDataFrame(
                    sorted(w_map.items()), "feature_id long, w long"
                )
                scored = (
                    feats.join(F.broadcast(wdf), "feature_id", "left")
                    .groupBy("doc_id", "y")
                    .agg(
                        F.coalesce(F.sum(F.col("cnt") * F.col("w")), F.lit(0))
                        .cast("long")
                        .alias("score")
                    )
                )
            else:
                scored = feats.groupBy("doc_id", "y").agg(
                    F.lit(0).cast("long").alias("score")
                )
            mis = scored.where(
                (F.col("y") * F.col("score")) <= 0
            ).select("doc_id")
            delta = (
                feats.join(mis, "doc_id")
                .groupBy("feature_id")
                .agg(F.sum(F.col("y") * F.col("cnt")).cast("long").alias("d"))
            )
            history.append(mis.count())
            rows = delta.collect()  # ≤ dim rows: model-sized, bounded
            for r in rows:
                w_map[r["feature_id"]] = (
                    w_map.get(r["feature_id"], 0) + int(lr) * r["d"]
                )
                if w_map[r["feature_id"]] == 0:
                    del w_map[r["feature_id"]]
        out = spark.createDataFrame(
            sorted(w_map.items()), "feature_id long, w long"
        )
        return out, history
    finally:
        feats.unpersist()


def hashed_linear_score(
    docs: DataFrame,
    weights: DataFrame,
    dim: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    bias: int = 0,
    max_broadcast_dim: int = 1 << 24,
) -> DataFrame:
    """(doc_id, score BIGINT, keep BOOLEAN = score+bias > 0).

    Plan: tokens explode -> feature_id = md5 mod dim -> broadcast join
    the dim-row weight table -> per-doc integer sum.  One shuffle (the
    per-doc reduce, map-side combined); the corpus rows carry only
    (doc_id, w) pairs into it.  Empty docs score exactly ``bias``.
    """
    if dim > max_broadcast_dim:
        raise ValueError(
            f"dim={dim} exceeds max_broadcast_dim={max_broadcast_dim}; "
            "a weight vector this wide must be scored via a shuffle "
            "join, not a broadcast"
        )
    feats = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode_outer(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), 0
                )
            ).alias("token"),
        )
        .withColumn(
            "feature_id",
            F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("long")
            % F.lit(int(dim)),
        )
    )
    return (
        feats.join(F.broadcast(weights), "feature_id", "left")
        .groupBy("doc_id")
        .agg(F.coalesce(F.sum("w"), F.lit(0)).cast("long").alias("score"))
        .select(
            "doc_id",
            "score",
            ((F.col("score") + F.lit(int(bias))) > 0).alias("keep"),
        )
    )
