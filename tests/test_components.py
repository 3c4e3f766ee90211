"""Connected components / dedup clustering over candidate-pair graphs."""


def test_connected_components_chains_and_isolates(spark):
    """A 4-node chain must collapse to one component (transitivity
    through multiple hops — the thing pairwise dedup misses), disjoint
    pairs stay separate."""
    from clinvar_ingest_spark.operators.components import (
        connected_components,
        dedup_clusters,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)],
        "doc_a long, doc_b long",
    )
    comp = {
        r["node"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    assert {comp[n] for n in (1, 2, 3, 4)} == {1}
    assert {comp[n] for n in (10, 11)} == {10}
    assert {comp[n] for n in (20, 21, 22)} == {20}

    rolled = {
        r["keeper"]: (r["n_members"], r["members"])
        for r in dedup_clusters(pairs).collect()
    }
    assert rolled == {
        1: (4, "1|2|3|4"), 10: (2, "10|11"), 20: (3, "20|21|22"),
    }


def test_connected_components_converges_on_long_path(spark):
    """A 12-hop path needs multiple propagation rounds; the loop must
    reach the fixpoint (early-stop inside max_iters), labeling all
    nodes with the global min."""
    from clinvar_ingest_spark.operators.components import connected_components

    n = 13
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    comp = connected_components(pairs, max_iters=30).collect()
    assert {r["component"] for r in comp} == {0}
    assert len(comp) == n


def test_pointer_doubling_log_rounds_on_chain(spark):
    """Pointer doubling must converge on a PATH of 2^k nodes in <= k+2
    rounds (one-hop propagation would need ~2^k) — the adversarial
    chain-shaped candidate graph from shingled boilerplate chains."""
    from clinvar_ingest_spark.operators.components import connected_components

    k = 6
    n = 2 ** k  # 64-node path, diameter 63
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    iters: list = []
    comp = connected_components(pairs, max_iters=k + 2, iters_counter=iters).collect()
    assert {r["component"] for r in comp} == {0}
    assert len(comp) == n
    assert iters[0] <= k + 2, f"took {iters[0]} rounds for a 2^{k} path"


def test_components_random_graph_matches_networkx_free_oracle(spark):
    """Random graph vs a driver-side union-find oracle."""
    import random

    from clinvar_ingest_spark.operators.components import connected_components

    random.seed(7)
    edges = [(random.randrange(200), random.randrange(200)) for _ in range(150)]
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges], "doc_a long, doc_b long"
    )

    # union-find oracle
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}

    got = {
        r["node"]: r["component"] for r in connected_components(pairs).collect()
    }
    assert got == want
