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
