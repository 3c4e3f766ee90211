"""Link-graph operators: degrees + integer fixed-point PageRank.

The fixed-point contract is the load-bearing part: ranks must be exact
integers, invariant to partitioning, so the oracle can hash them.
"""

from pyspark.sql import functions as F

from clinvar_ingest_spark.operators.graph import (
    PR_SCALE,
    graph_degrees,
    pagerank_fixed_point,
)


def _edges(spark, pairs, n_parts=None):
    df = spark.createDataFrame(pairs, "src long, dst long")
    return df.repartition(n_parts) if n_parts else df


def test_degrees_exact(spark):
    e = _edges(spark, [(1, 2), (1, 3), (2, 3), (4, 1)])
    got = {r["node"]: (r["out_deg"], r["in_deg"])
           for r in graph_degrees(e).collect()}
    assert got == {1: (2, 1), 2: (1, 1), 3: (0, 2), 4: (1, 0)}


def test_pagerank_hand_computed_cycle(spark):
    """On a 2-cycle every node keeps mass: rank stays at scale/2 up to
    the deterministic truncation drift of the update rule."""
    e = _edges(spark, [(1, 2), (2, 1)])
    init = PR_SCALE // 2
    base = 15 * PR_SCALE // 200
    # one iteration by hand: contrib = init DIV 1; r' = base + 85*c DIV 100
    r = init
    for _ in range(5):
        r = base + (85 * r) // 100
    got = {x["node"]: x["rank_fp"]
           for x in pagerank_fixed_point(e, n_iter=5).collect()}
    assert got == {1: r, 2: r}


def test_pagerank_sink_and_source(spark):
    """A source node (no inbound) ends at exactly base after one
    iteration and stays there; results are exact integers."""
    e = _edges(spark, [(1, 2), (2, 3), (3, 2)])
    got = {x["node"]: x["rank_fp"]
           for x in pagerank_fixed_point(e, n_iter=3).collect()}
    base = 15 * PR_SCALE // 300
    assert got[1] == base
    assert all(isinstance(v, int) for v in got.values())


def test_pagerank_partition_invariant(spark):
    """Same graph, different partitioning → bit-identical ranks (the
    truncating-integer arithmetic has no summation-order sensitivity)."""
    pairs = [(i % 11, (i * 7 + 3) % 11) for i in range(200)]
    pairs = [(a, b) for a, b in pairs if a != b]
    r1 = {x["node"]: x["rank_fp"]
          for x in pagerank_fixed_point(_edges(spark, pairs, 1)).collect()}
    r8 = {x["node"]: x["rank_fp"]
          for x in pagerank_fixed_point(_edges(spark, pairs, 8)).collect()}
    assert r1 == r8
    assert sum(r1.values()) > 0
