"""Gap-based sessionization over an event stream.

The batch form of a session window (Structured Streaming's
``session_window`` analog, computed deterministically over history):
a new session starts when the gap to the previous event of the same
key exceeds ``gap``. Pure window functions — lag → boundary flag →
running sum — one shuffle on the key, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign ``session_id`` (0-based per key, in time order)."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    prev_ts = F.lag(ts_col).over(w)
    gap_s = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)
    is_new = F.when(
        prev_ts.isNull() | (gap_s > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn(
        "session_id",
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
    )


def session_stats(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-key session summary: session count, longest session (events)."""
    s = sessionize(df, key_col, ts_col, tiebreak_col, gap_minutes)
    per_session = s.groupBy(key_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return per_session.groupBy(key_col).agg(
        F.countDistinct("session_id").alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
    )
