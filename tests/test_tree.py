"""Recursive tree disassembly: arbitrary depth, deterministic ids."""

import hashlib
import json


def test_tree_disassemble_arbitrary_depth(spark):
    """A depth-6 chain (deeper than any oracle unroll) must fully
    flatten, with md5-of-path synthetic ids linking parent→child."""
    from clinvar_ingest_spark.operators.tree import tree_disassemble

    node = {"name": "leaf", "children": []}
    for d in range(5, 0, -1):
        node = {"name": f"n{d}", "children": [node]}
    df = spark.createDataFrame(
        [(7, json.dumps(node))], "root_id long, doc string"
    )
    rows = {r["path"]: r for r in tree_disassemble(df).collect()}
    assert len(rows) == 6
    assert rows["/"]["depth"] == 0 and rows["/"]["parent_id"] is None
    deepest = rows["/0/0/0/0/0"]
    assert deepest["name"] == "leaf" and deepest["depth"] == 5
    # synthetic ids are content-derived and replay-stable
    assert deepest["node_id"] == hashlib.md5(b"7|/0/0/0/0/0").hexdigest()[:16]
    assert deepest["parent_id"] == rows["/0/0/0/0"]["node_id"]


def test_tree_disassemble_fanout_and_unnamed_nodes(spark):
    from clinvar_ingest_spark.operators.tree import tree_disassemble

    doc = {"children": [{"name": "a"}, {"name": "b", "children": [{}]}]}
    df = spark.createDataFrame(
        [(1, json.dumps(doc))], "root_id long, doc string"
    )
    rows = {r["path"]: (r["name"], r["depth"]) for r in tree_disassemble(df).collect()}
    assert rows == {
        "/": (None, 0), "/0": ("a", 1), "/1": ("b", 1), "/1/0": (None, 2),
    }
