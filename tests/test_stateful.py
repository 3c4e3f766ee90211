"""applyInPandasWithState LWW change-feed: final emissions == batch LWW."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from clinvar_ingest_spark.operators.dedup import lww_dedup
from clinvar_ingest_spark.sources import synthetic_change_log
from clinvar_ingest_spark.streaming.stateful import lww_change_feed

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


def test_change_feed_converges_to_batch_lww(spark, tmp_path):
    log = synthetic_change_log(spark, 600, n_urls=80)
    log_dir = str(tmp_path / "log")
    log.repartition(4).write.mode("overwrite").parquet(log_dir)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)  # several micro-batches → state
        .parquet(log_dir)
    )
    out_dir = str(tmp_path / "out")
    q = (
        lww_change_feed(stream)
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", out_dir)
        .start()
    )
    q.awaitTermination()

    feed = spark.read.parquet(out_dir)
    # the LAST emission per key must equal the batch LWW winner
    last = lww_dedup(feed, ("url",), ("warc_ts", "seq"), strategy="max_by")
    got = {r["url"]: (r["seq"], r["op"]) for r in last.collect()}
    want = {
        r["url"]: (r["seq"], r["op"])
        for r in lww_dedup(log, ("url",), ("warc_ts", "seq")).collect()
    }
    assert got == want
    # transitions are well-formed
    kinds = {r["transition"] for r in feed.select("transition").distinct().collect()}
    assert kinds <= {"created", "updated", "deleted"}
    assert "created" in kinds
    # stale micro-batches (file-ordered, not seq-ordered) emit nothing:
    # emissions per key ≤ number of micro-batches, and strictly fewer
    # emissions than events (the state machine dedups)
    assert feed.count() < 600
