"""Connected components over candidate-pair graphs (dedup clustering).

Near-dup detection emits PAIRS (minhash/simhash/embedding candidates);
production dedup needs CLUSTERS — the transitive closure of the pair
graph — so exactly one document survives per duplicate *group*, not per
pair. This is the canonical iterative algorithm a declarative plan
cannot express, implemented as a bounded DataFrame-join loop.

Algorithm: min-label propagation fused with POINTER DOUBLING. Each
round does

1. edge-min:   l(u) ← min(l(u), min over neighbors v of l(v))
   — one hash join (edges ⋈ labels) + a map-side-combinable min-agg;
2. doubling:   l(u) ← l(l(u))
   — one labels ⋈ labels join (follow the parent pointer one hop).

Labels are monotonically non-increasing and always name a node inside
the owner's component, so the fixpoint is the component MINIMUM for
every node. Step 2 composes the label mapping with itself, so the
propagation radius roughly doubles per round: convergence in
O(log diameter) rounds — a PATH of 2^k nodes converges in ≤ k+1 rounds
(asserted in tests), where plain one-hop propagation would need 2^k.
Adversarial chain-shaped candidate graphs (shingled boilerplate chains
at web scale) therefore cost log rounds, not max_iters full passes.

Scale design:

* each round is two hash-shuffle joins + one aggregate — O(E) work, no
  all-pairs anything;
* ``localCheckpoint`` truncates the lineage each round, or the plan
  would grow exponentially and re-execute every prior iteration;
* convergence detection rides the already-materialized checkpoint: the
  round keeps the round-start label alongside, so "changed?" is a
  limit-1 scan of cached data — no extra join, no full count.

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
    iters_counter: list | None = None,
) -> DataFrame:
    """Label every node of the undirected pair graph with its
    component's MINIMUM node id. Returns (node, component).

    ``iters_counter``: optional list; the number of rounds executed is
    appended (observability for the convergence tests)."""
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
    rounds = 0
    for _ in range(max_iters):
        rounds += 1
        # 1. edge-min: pull the smallest neighbor label over each edge
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
        l1 = (
            labels.join(neigh_min, labels.node == neigh_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("mn"), F.col("label"))
                ).alias("label"),
                F.col("label").alias("prev"),
            )
        )
        # 2. pointer doubling: follow the label's own label one hop.
        # Every label value is a node id, so the self-join always
        # resolves; labels only decrease, hence l(l(u)) <= l(u).
        ptr = l1.select(
            F.col("node").alias("label"), F.col("label").alias("ll")
        )
        new_labels = (
            l1.join(ptr, "label", "left")
            .select(
                "node",
                F.coalesce(F.col("ll"), F.col("label")).alias("label"),
                "prev",
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.filter(F.col("label") != F.col("prev")).limit(1).count()
        )
        labels = new_labels.drop("prev")
        if changed == 0:
            break
    if iters_counter is not None:
        iters_counter.append(rounds)
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
