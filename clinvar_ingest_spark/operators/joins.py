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
) -> DataFrame:
    cond = F.datediff(F.col(left_date), F.col(right_date)).between(
        -max_days, max_days
    )
    if extra_cond is not None:
        cond = cond & extra_cond
    return left.join(right, cond, how)


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
