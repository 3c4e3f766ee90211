"""Join operators beyond plain equi joins.

* ``range_join`` — the reference's ±N-day interval join
  (processing_history.py:121-141): equi keys + a bounded date/number
  range. When one side is small it broadcasts (BNLJ is fine at dim
  cardinality); at scale, pre-bucketing the range into coarse bins
  turns it into an equi join on (key, bin) with a residual predicate.
* ``prioritized_left_join`` — the reference's multi-strategy trait
  matching (trait.py:437-523 ``find_matching_trait``): try strategies
  in priority order, first match wins. Planned as chained LEFT joins +
  one COALESCE, so Catalyst broadcasts each small lookup and the whole
  ladder stays one pipeline — no per-row Python, no iteration.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_date,
    right_date,
    max_days: int = 1,
    extra_cond: Column | None = None,
    how: str = "inner",
    strategy: str = "binned",
) -> DataFrame:
    """±max_days interval join (reference analog:
    processing_history.py:121-141 release-date windows).

    ``strategy="binned"`` (default, the scale path): both sides get a
    coarse date bin of width ``max_days`` days; ``|ld - rd| <= w``
    implies their bins differ by at most 1, so the left side explodes
    to its {-1, 0, +1} neighbor bins (3× the SMALL dimension of rows,
    never a cartesian) and the join becomes a hash-partitionable EQUI
    join on the bin with the exact ``datediff`` range as a residual
    filter. Catalyst then picks SortMergeJoin/BroadcastHashJoin and the
    shuffle is keyed — at 100× data this scales like any equi join,
    while the pure range condition would plan as a broadcast
    nested-loop (O(|L|·|R|) compares).

    ``strategy="bnlj"``: the raw range condition, fine when one side is
    tiny and 3× row expansion is not worth it.

    A (left, right) pair can match in at most one bin (the right row has
    exactly one bin; the left copies carry distinct bins), so the binned
    path never duplicates matches. ``how`` supports inner/left; left
    reattaches unmatched rows via a row id over the binned inner join.
    """
    cond = F.datediff(F.col(left_date), F.col(right_date)).between(
        -max_days, max_days
    )
    if extra_cond is not None:
        cond = cond & extra_cond
    if strategy == "bnlj":
        return left.join(right, cond, how)
    if strategy != "binned":
        raise ValueError(f"unknown range_join strategy {strategy!r}")

    w = max(int(max_days), 1)
    lbin = F.floor(F.unix_date(F.to_date(F.col(left_date))) / w).cast("long")
    rbin = F.floor(F.unix_date(F.to_date(F.col(right_date))) / w).cast("long")
    r2 = right.withColumn("_rj_binr", rbin)

    def _binned_inner(l0: DataFrame) -> DataFrame:
        l2 = l0.withColumn(
            "_rj_binl",
            F.explode(F.array(lbin - 1, lbin, lbin + 1)),
        )
        return (
            l2.join(r2, (F.col("_rj_binl") == F.col("_rj_binr")) & cond, "inner")
            .drop("_rj_binl", "_rj_binr")
        )

    if how == "inner":
        return _binned_inner(left)
    if how != "left":
        raise ValueError(f"binned range_join supports inner/left, got {how!r}")
    # Deterministic row id derived from the row's OWN content — never
    # monotonically_increasing_id(), which is recomputed independently in
    # the inner-join and anti-join plan branches and is not stable under
    # AQE re-partitioning / task retry (silent row loss or duplication).
    # to_json(struct(*)) is injective across distinct rows (null fields
    # are omitted, so rows colliding would need identical non-null
    # fields AND therefore identical null sets); content-identical left
    # rows sharing an id is semantically safe: they match the same right
    # rows, so they are either all in the inner branch or all unmatched.
    l0 = left.withColumn("_rj_id", F.to_json(F.struct(*left.columns)))
    inner = _binned_inner(l0)
    unmatched = l0.join(inner.select("_rj_id"), "_rj_id", "left_anti")
    for f in right.schema.fields:
        unmatched = unmatched.withColumn(f.name, F.lit(None).cast(f.dataType))
    return inner.unionByName(unmatched.select(*inner.columns)).drop("_rj_id")


def prioritized_left_join(
    left: DataFrame,
    strategies: Sequence[tuple[DataFrame, Callable[[DataFrame, DataFrame], Column], str]],
    output_col: str,
    default: Column | None = None,
) -> DataFrame:
    """First-match-wins lookup ladder.

    ``strategies`` is an ordered list of (right_df, cond_fn, value_col):
    each right side is LEFT-joined (deduplicated on its own value first
    is the caller's job), then the first non-null value in priority
    order wins via COALESCE — exactly the semantics of the reference's
    ordered match cascade, but set-oriented.
    """
    out = left
    picked = []
    for i, (right, cond_fn, value_col) in enumerate(strategies):
        alias = f"_m{i}"
        r = right.select(
            *[F.col(c).alias(f"{alias}_{c}") for c in right.columns]
        )
        cond = cond_fn(out, r)
        out = out.join(r, cond, "left")
        picked.append(F.col(f"{alias}_{value_col}"))
    if default is not None:
        picked.append(default)
    out = out.withColumn(output_col, F.coalesce(*picked))
    keep = [c for c in out.columns if not c.startswith("_m")]
    return out.select(*keep)
