"""Connected components over candidate-pair graphs (dedup clustering).

Near-dup detection emits PAIRS (minhash/simhash/embedding candidates);
production dedup needs CLUSTERS — the transitive closure of the pair
graph — so exactly one document survives per duplicate *group*, not per
pair. This is the canonical iterative algorithm a declarative plan
cannot express: small-star/large-star label propagation, implemented as
a bounded DataFrame-join loop with driver-side convergence checks.

Scale design (the same algorithm GraphFrames/GraphX use):

* each iteration is ONE hash-shuffle join (edges ⋈ labels) + a map-side
  combinable min-aggregate — O(E) per iteration, no all-pairs anything;
* iterations ≤ O(log n) for min-label propagation on typical dup graphs
  (dup clusters are dense and tiny — diameters of 2-4 — so 3-5
  iterations in practice);
* ``localCheckpoint`` truncates the lineage each round, or the plan
  would grow exponentially and re-execute every prior iteration;
* convergence = a driver-side count of changed labels (metadata-sized).

Reference analog: none (the reference dedups exact keys only); this is
an engine addition from the training-data-pipeline brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = 20,
) -> DataFrame:
    """Label every node of the undirected pair graph with its
    component's MINIMUM node id. Returns (node, component)."""
    fwd = pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    edges = fwd.union(
        fwd.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct().localCheckpoint(eager=True)

    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        neigh_min = (
            edges.join(
                labels.select(
                    F.col("node").alias("b"), F.col("label").alias("nl")
                ),
                "b",
            )
            .groupBy("a")
            .agg(F.min("nl").alias("mn"))
        )
        new_labels = (
            labels.join(neigh_min, labels.node == neigh_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("mn"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("node"), F.col("label").alias("component"))


def dedup_clusters(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = 20,
) -> DataFrame:
    """Cluster roll-up of a candidate-pair graph: one row per duplicate
    GROUP with the keeper (min id), member count, and the sorted member
    list as a '|'-joined string (driver-hasher-safe output shape)."""
    comp = connected_components(pairs, a_col, b_col, max_iters)
    return (
        comp.groupBy(F.col("component").alias("keeper"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.col("node"))),
                    lambda x: x.cast("string"),
                ),
                "|",
            ).alias("members"),
        )
        .orderBy("keeper")
    )
