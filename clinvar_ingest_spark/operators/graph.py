"""Link-graph operators over web-page edge tables.

The web-scale companion to the curation stack: a crawl's hyperlink
structure as a DataFrame of (src, dst) edges — degree statistics and
PageRank, the classic link-quality prior used to weight training
corpora (and the original web-scale iterative workload).

PageRank here is computed in INTEGER FIXED-POINT (``scale`` = 10^12
units of probability mass) with truncating division: every operation is
exact integer arithmetic, so the result is bit-identical across
engines, partitionings, and replays — the same determinism contract the
rest of this engine's oracles rely on, where a float implementation
would drift with summation order. Dangling nodes (out-degree 0) leak
their mass, the standard simplification.

Scale shape: each iteration is ONE shuffle join (edges ⋈ ranks on src —
on a real cluster both sides stay hash-partitioned on src across
iterations, so only ranks moves) plus one aggregation on dst with
map-side partial sums. Nothing driver-side except the node count and
the fixed-point constants derived from it. O(iterations) stages,
O(|E|) work per stage — the textbook bulk-synchronous shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 10**12
PR_DAMPING_NUM = 85  # damping factor 0.85 as an exact rational
PR_DAMPING_DEN = 100


def graph_degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node out/in degree over a (src, dst) edge table: one union +
    one aggregate, exact integers."""
    outd = edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    ind = edges.groupBy(F.col(dst).alias("node")).agg(
        F.count(F.lit(1)).alias("in_deg")
    )
    return (
        outd.join(ind, "node", "full_outer")
        .select(
            "node",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        )
    )


def pagerank_fixed_point(
    edges: DataFrame,
    n_iter: int = 5,
    src: str = "src",
    dst: str = "dst",
    scale: int = PR_SCALE,
) -> DataFrame:
    """PageRank with damping 0.85 in exact integer fixed-point.

    Returns (node, rank_fp) where ``rank_fp`` ≈ rank · ``scale`` as a
    BIGINT. Update rule per iteration, all-integer:

        rank' = base + (85 · Σ_incoming (rank_src DIV out_deg)) DIV 100
        base  = (15 · scale) DIV (100 · N)

    ``DIV`` is truncating integer division — identical in Spark (DIV)
    and DuckDB (//) for the non-negative values used here, which is
    what makes the result hash-portable. Max intermediate is
    85 · scale ≈ 8.5e13, far inside BIGINT.
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    n = nodes.count()  # one scalar to the driver
    if n == 0:
        return nodes.withColumn("rank_fp", F.lit(0).cast("long"))
    init = scale // n
    base = ((PR_DAMPING_DEN - PR_DAMPING_NUM) * scale) // (PR_DAMPING_DEN * n)
    ed = edges.join(
        edges.groupBy(src).agg(F.count(F.lit(1)).alias("_od")), src
    ).select(F.col(src).alias("_s"), F.col(dst).alias("_d"), "_od")
    ranks = nodes.select("node", F.lit(init).cast("long").alias("rank_fp"))
    for _ in range(int(n_iter)):
        contrib = (
            ed.join(ranks, ed["_s"] == ranks["node"])
            .select(
                F.col("_d").alias("node"),
                F.expr("rank_fp DIV _od").alias("_c"),
            )
        )
        s = contrib.groupBy("node").agg(F.sum("_c").alias("_m"))
        ranks = nodes.join(s, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(
                    f"({PR_DAMPING_NUM} * coalesce(_m, 0L)) "
                    f"DIV {PR_DAMPING_DEN}"
                )
            ).cast("long").alias("rank_fp"),
        )
    return ranks
