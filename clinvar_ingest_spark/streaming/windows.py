"""Watermarked event-time window aggregation (Structured Streaming).

The reference has no tumbling/sliding windows (SURVEY.md §2.7 — its
"window" is the ±1-day range join), but a web-scale change-log engine
needs event-time rollups with bounded state: tumbling counts per key
with a watermark so late events beyond the allowed out-of-orderness
are dropped and window state is GC'd — without the watermark, state at
10^10 events grows unboundedly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str = "warc_ts",
    key_col: str = "op",
    window_len: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling event-time counts per key with late-data watermark.

    Works on a streaming OR batch DataFrame (the expression is the
    same; in batch mode the watermark is a no-op and the result is the
    exact history — handy for backfill/oracle comparisons).
    """
    df = stream
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window_len).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n",
        )
    )


def run_windowed_counts_stream(
    spark,
    source_dir: str,
    schema,
    out_dir: str,
    checkpoint_dir: str,
    **window_kwargs,
) -> None:
    """availableNow run: file-stream → watermarked window agg → parquet
    (append mode: only finalized windows below the watermark emit)."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    agg = windowed_event_counts(stream, **window_kwargs)
    q = (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", out_dir)
        .start()
    )
    q.awaitTermination()


def sliding_event_counts(
    stream: DataFrame,
    ts_col: str = "warc_ts",
    key_col: str = "op",
    window_len: str = "2 days",
    slide: str = "1 day",
    watermark: str = "2 hours",
) -> DataFrame:
    """Hopping (sliding) event-time counts per key: each event lands in
    ``window_len / slide`` overlapping windows — F.window emits the
    replicated assignment map-side, so the only shuffle is the
    aggregation itself (with partial combine). Same expression runs
    streaming (watermarked state GC) or batch (exact history)."""
    df = stream
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(
            F.window(ts_col, window_len, slide).alias("w"), F.col(key_col)
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n",
        )
    )
