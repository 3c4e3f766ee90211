"""Recursive record-local tree disassembly (UDTF-style fan-out).

Reference parity: the reference's VariationArchive extraction walks a
nested XML record recursively, emitting one row per tree node with
DETERMINISTIC synthetic ids for unnamed interior nodes
(clinvar_ingest/model/variation_archive.py:466-577). The engine analog
takes a JSON-tree column and explodes each record into node rows inside
``mapInPandas``:

* record-LOCAL recursion — a record's tree never spans partitions, so
  the walk needs no shuffle and parallelizes embarrassingly (the same
  reason the reference parses archive-by-archive);
* Arrow-batched — rows arrive as pandas frames; the per-record walk is
  genuine recursive logic no built-in operator expresses (depth is data,
  not schema), which is the documented escape hatch of SURVEY §2.8;
* synthetic ids: ``md5(f"{root_id}|{path}")[:16]`` — stable across
  replays, so downstream joins on node_id are reproducible (the
  reference stamps the same kind of content-derived id).

The operator handles ARBITRARY depth; oracles unroll the known-depth
instance in SQL.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

TREE_NODE_SCHEMA = T.StructType(
    [
        T.StructField("root_id", T.LongType()),
        T.StructField("node_id", T.StringType()),
        T.StructField("parent_id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("path", T.StringType()),
    ]
)

_COLS = [f.name for f in TREE_NODE_SCHEMA.fields]


def tree_disassemble(
    df: DataFrame, id_col: str = "root_id", json_col: str = "doc"
) -> DataFrame:
    """Explode a JSON-tree column (objects with optional ``name`` and
    ``children`` keys) into one row per node."""

    def walk_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import json as js

        for pdf in batches:
            rows: list[tuple] = []
            # per-RECORD loop (not per-node-per-engine-row): each record
            # is an arbitrary-depth tree only imperative code can walk
            for rid, doc in zip(pdf[id_col].tolist(), pdf[json_col].tolist()):
                stack = [(js.loads(doc), "", None, 0)]
                while stack:
                    node, path, parent, depth = stack.pop()
                    p = path or "/"
                    nid = hashlib.md5(f"{rid}|{p}".encode()).hexdigest()[:16]
                    rows.append((rid, nid, parent, node.get("name"), depth, p))
                    for i, ch in enumerate(node.get("children") or []):
                        stack.append((ch, f"{path}/{i}", nid, depth + 1))
            yield pd.DataFrame(rows, columns=_COLS)

    return df.select(id_col, json_col).mapInPandas(
        walk_batches, schema=TREE_NODE_SCHEMA
    )
