"""Watermarked window aggregation: streaming emits ⊆ batch exact history."""

from pyspark.sql import types as T

from clinvar_ingest_spark.sources import synthetic_change_log
from clinvar_ingest_spark.streaming.windows import (
    run_windowed_counts_stream,
    windowed_event_counts,
)

SCHEMA = T.StructType(
    [
        T.StructField("part", T.IntegerType()),
        T.StructField("seq", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("lang", T.StringType()),
    ]
)


def test_stream_windows_subset_of_batch_and_final_on_rerun(spark, tmp_path):
    log = synthetic_change_log(spark, 1500, n_urls=200)
    log_dir = str(tmp_path / "log")
    log.repartition(4).write.mode("overwrite").parquet(log_dir)

    # exact batch history (same expression, watermark no-op)
    batch = {
        (r["window_start"], r["op"]): r["n"]
        for r in windowed_event_counts(spark.read.parquet(log_dir)).collect()
    }
    assert len(batch) > 3

    out = str(tmp_path / "out")
    run_windowed_counts_stream(
        spark, log_dir, SCHEMA, out, str(tmp_path / "ckpt")
    )
    emitted = {
        (r["window_start"], r["op"]): r["n"]
        for r in spark.read.parquet(out).collect()
    }
    # append mode emits only windows finalized under the watermark —
    # everything emitted must be exactly right; trailing windows may be
    # withheld until more data arrives
    assert emitted
    for k, v in emitted.items():
        assert batch[k] == v
    assert set(emitted) <= set(batch)


def test_sliding_windows_replicate_each_event(spark):
    """Hopping windows: per-key total count over all windows equals
    (window_len / slide) x event count, and every tumbling window's
    count is the sum the overlapping hops agree on."""
    from pyspark.sql import functions as F

    from clinvar_ingest_spark.streaming.windows import sliding_event_counts

    log = synthetic_change_log(spark, 800, n_urls=100)
    hops = sliding_event_counts(
        log, window_len="2 days", slide="1 day"
    ).collect()
    n_events_by_op = {
        r["op"]: r["n"]
        for r in log.groupBy("op").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got = {}
    for r in hops:
        got[r["op"]] = got.get(r["op"], 0) + r["n"]
    assert got == {op: 2 * n for op, n in n_events_by_op.items()}
    # window bounds really span 2 days at 1-day alignment
    assert all(
        (r["window_end"] - r["window_start"]).days == 2 for r in hops
    )
