"""Data-quality profiling (Deequ/Great-Expectations analog): one-pass
per-column statistics for audit dashboards and write-audit-publish
gates.

Reference intent: clinvar-ingest validates each release before
publication (row counts per entity, processing_history assertions);
this generalizes that to a per-column completeness/distinctness/range
profile computed as ONE aggregate job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_profile(
    df: DataFrame,
    columns: list[str] | None = None,
    approx_distinct: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """Per-column ``(column, n_rows, n_nulls, n_distinct, min_value,
    max_value)`` in ONE aggregation pass over the table.

    ``min_value``/``max_value`` are computed in the column's native
    type (so numeric columns order numerically) and cast to string for
    a uniform output schema.

    Scale: a single global aggregate — all statistics are map-side
    combinable, so the shuffle carries one partial row per partition.
    The exact multi-column ``count_distinct`` makes Catalyst expand the
    input once per profiled column (cost ∝ #columns); at 10^10 rows
    pass ``approx_distinct=True`` to use the HyperLogLog++ sketch
    (``approx_count_distinct``, ~2% error) which profiles any number of
    columns in one un-expanded pass with mergeable sketches. The exact
    mode is the oracle-checked one; the approx mode is the 100-TB
    path and is bounds-tested against it."""
    cols = columns or df.columns
    if approx_distinct:
        def distinct(c):
            return F.approx_count_distinct(c, rsd)
    else:
        distinct = F.count_distinct
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.extend(
            [
                F.sum(
                    F.when(F.col(c).isNull(), 1).otherwise(0)
                ).alias(f"{c}__nulls"),
                distinct(F.col(c)).alias(f"{c}__distinct"),
                F.min(F.col(c)).cast("string").alias(f"{c}__min"),
                F.max(F.col(c)).cast("string").alias(f"{c}__max"),
            ]
        )
    wide = df.agg(*aggs)
    stats = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.coalesce(F.col(f"{c}__nulls"), F.lit(0)).alias(
                    "n_nulls"
                ),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_value"),
                F.col(f"{c}__max").alias("max_value"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(stats).alias("s")).select("s.*")


def distribution_drift(
    before: DataFrame,
    after: DataFrame,
    group_col,
    alias: str = "group",
) -> DataFrame:
    """Per-group distribution drift between two table states (the
    data-observability monitor a CDC pipeline runs between snapshots):
    ``(group, n_before, n_after, delta, drift_bps)`` where
    ``drift_bps = (|delta| * 10000) div max(n_before, 1)`` — basis
    points of change, exact integer arithmetic so the alert verdict is
    engine- and partitioning-stable (no float ratios).

    ``group_col`` is any Column expression (domain, lang, source…).
    Groups present on only one side surface with a zero count on the
    other — appearing/vanishing groups are exactly the drifts that
    matter most.

    Scale: two map-side-combinable counts + one full-outer equi-join on
    the group key (group cardinality ≪ rows; AQE broadcasts the small
    side). Composes with time travel: ``read_at(a)`` vs ``read_at(b)``
    costs two snapshot scans, or pair it with the IVM-maintained
    rollup for O(changes) monitoring."""
    a = before.groupBy(group_col.alias(alias)).agg(
        F.count(F.lit(1)).alias("n_before")
    )
    b = after.groupBy(group_col.alias(alias)).agg(
        F.count(F.lit(1)).alias("n_after")
    )
    return (
        a.join(b, alias, "full")
        .select(
            F.col(alias),
            F.coalesce("n_before", F.lit(0)).alias("n_before"),
            F.coalesce("n_after", F.lit(0)).alias("n_after"),
        )
        .withColumn("delta", F.col("n_after") - F.col("n_before"))
        .withColumn(
            "drift_bps",
            F.expr("(abs(delta) * 10000) div greatest(n_before, 1L)"),
        )
    )
