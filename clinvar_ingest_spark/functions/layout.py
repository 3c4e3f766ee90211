"""Data-layout keys: Z-order (Morton) interleaving for multi-column
row-group pruning.

A single-column sort (``compact(sort_by=["url"])``) gives tight
row-group zone maps on ONE column; queries filtering on a second
column still scan every row group. Z-ordering interleaves the bits of
several (integer-surrogate) columns so that row groups of a
Z-sorted file are rectangles in the multi-dimensional key space —
range predicates on ANY of the interleaved columns prune row groups
(the Iceberg/Delta ``zorder`` layout lever, expressed as a plain
codegen column so it composes with ``compact(sort_by=[...])`` and
``_replace_partitions(sort_col=...)`` unchanged).

The expression is integer-exact (bit shifts and masks only — unrolled
at plan-build time, no HOF shift-by-variable), so the DuckDB oracle
replays it bit-for-bit.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(*cols: Column | str, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of each column.

    Callers pass integer surrogates (ids, day numbers, bucketed
    values); values are masked to ``bits`` bits, and bit ``i`` of
    column ``j`` lands at position ``i*n + j`` of the key. Total key
    width ``bits * n`` must stay ≤ 63."""
    n = len(cols)
    if n < 2:
        raise ValueError("zorder_key needs at least 2 columns")
    if bits * n > 63:
        raise ValueError(f"bits*cols = {bits * n} exceeds a signed long")
    mask = (1 << bits) - 1
    parts = []
    for j, c in enumerate(cols):
        cc = (F.col(c) if isinstance(c, str) else c).cast("long")
        cc = cc.bitwiseAND(F.lit(mask))
        for i in range(bits):
            parts.append(
                F.shiftleft(
                    F.shiftright(cc, i).bitwiseAND(F.lit(1)), i * n + j
                )
            )
    return reduce(lambda a, b: a.bitwiseOR(b), parts).alias("zkey")


def zorder_sql(cols: list[str], bits: int = 16) -> str:
    """The identical key as a DuckDB SQL expression (oracle mirror)."""
    n = len(cols)
    mask = (1 << bits) - 1
    terms = []
    for j, c in enumerate(cols):
        base = f"(CAST({c} AS BIGINT) & {mask})"
        for i in range(bits):
            terms.append(f"((({base} >> {i}) & 1) << {i * n + j})")
    return " | ".join(terms)
