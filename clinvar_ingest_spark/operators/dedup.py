"""Last-writer-wins dedup: keep the top-1 row per key by a version order.

Reference parity: the BigQuery window-rank dedup
``ROW_NUMBER() OVER (PARTITION BY id ORDER BY date_last_updated DESC,
id DESC) ... WHERE row_num = 1`` in
clinvar_ingest/cloud/bigquery/create_tables.py:176-222 (five variants).

The engine generalizes it to ``PARTITION BY url ORDER BY warc_ts DESC,
seq DESC`` and — because a 10^10-event Common-Crawl log has hot urls /
hot domains — offers three physical strategies:

* ``window``          — single global window. Correct, but one straggler
                        task per hot key at scale.
* ``salted_window``   — two-phase: a *local* top-1 per (key, salt) where
                        the salt is a deterministic hash of the version
                        columns, then a *global* top-1 per key over the
                        ≤ n_salts survivors. The heavy first pass never
                        sees more than ~1/n_salts of a hot key's rows in
                        one window group.
* ``max_by``          — ``groupBy(keys).agg(max_by(struct(*), ver))``.
                        Spark plans this as a hash aggregate with a
                        map-side partial, so hot keys are pre-combined
                        before the shuffle — usually the fastest and the
                        default at scale.

All three return identical results when the version order is a total
order per key (for the change log it is: (warc_ts, seq) is unique).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _version_struct(order_cols: Sequence[str]) -> Column:
    # Struct comparison is lexicographic by field, which is exactly the
    # (warc_ts DESC, seq DESC) tiebreak chain when taking the max.
    return F.struct(*[F.col(c) for c in order_cols])


def lww_dedup(
    df: DataFrame,
    key_cols: Sequence[str] = ("url",),
    order_cols: Sequence[str] = ("warc_ts", "seq"),
    strategy: str = "max_by",
    n_salts: int = 16,
) -> DataFrame:
    """Return exactly one row per key: the last writer by ``order_cols``.

    ``order_cols`` must totally order rows within a key (append a unique
    offset column such as ``seq`` to guarantee it); with ties the
    ``window`` strategies keep the first row_number winner, which is
    then also the struct-max — so strategies agree.
    """
    key_cols = list(key_cols)
    order_cols = list(order_cols)

    if strategy == "max_by":
        payload = [c for c in df.columns if c not in key_cols]
        ver = _version_struct(order_cols)
        out = df.groupBy(*key_cols).agg(
            F.max_by(F.struct(*[F.col(c) for c in payload]), ver).alias("_top")
        )
        return out.select(*key_cols, *[F.col(f"_top.{c}").alias(c) for c in payload])

    desc_order = [F.col(c).desc() for c in order_cols]

    if strategy == "window":
        w = Window.partitionBy(*key_cols).orderBy(*desc_order)
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    if strategy == "salted_window":
        # Deterministic salt from the version columns: same row → same
        # salt on every replay, so resume/replay equivalence holds.
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in order_cols]), F.lit(n_salts))
        w1 = Window.partitionBy(*key_cols, "_salt").orderBy(*desc_order)
        w2 = Window.partitionBy(*key_cols).orderBy(*desc_order)
        return (
            df.withColumn("_salt", salt)
            .repartition(*[F.col(c) for c in key_cols], F.col("_salt"))
            .withColumn("_rn1", F.row_number().over(w1))
            .filter(F.col("_rn1") == 1)
            .withColumn("_rn2", F.row_number().over(w2))
            .filter(F.col("_rn2") == 1)
            .drop("_salt", "_rn1", "_rn2")
        )

    raise ValueError(f"unknown strategy {strategy!r}")


def exact_dedup(
    df: DataFrame,
    content_cols: Sequence[str],
    keep_col: str,
) -> DataFrame:
    """Exact-content dedup: one survivor per identical content tuple.

    Survivor = minimum ``keep_col`` (deterministic). Implemented as a
    hash aggregate (map-side combinable), not a window, so it scales to
    skewed content (e.g. boilerplate pages repeated millions of times).
    """
    return df.groupBy(*[F.col(c) for c in content_cols]).agg(
        F.min(keep_col).alias(keep_col), F.count(F.lit(1)).alias("n_copies")
    )
