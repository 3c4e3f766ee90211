"""Kafka-shaped source adapter: same contract, same final state."""

import base64
import json

from clinvar_ingest_spark.sources import ChangeLogSource, synthetic_change_log
from clinvar_ingest_spark.sources.change_log import from_kafka_shape
from clinvar_ingest_spark.streaming import IngestPipeline
from clinvar_ingest_spark.tables import SnapshotTable
from pyspark.sql import types as T

PAGES = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("seq", T.LongType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("lang", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)


def test_kafka_shape_pipeline_matches_native(spark, tmp_path):
    n_parts = 3
    native = synthetic_change_log(spark, 600, n_urls=80)
    rows = native.collect()

    # re-encode the same events as Kafka records (per-partition offsets)
    offsets = {p: 0 for p in range(n_parts)}
    kafka_rows = []
    for r in sorted(rows, key=lambda r: r["seq"]):
        p = r["seq"] % n_parts
        val = json.dumps(
            {
                "op": r["op"],
                "url": r["url"],
                "warc_ts": r["warc_ts"].strftime("%Y-%m-%d %H:%M:%S"),
                "html": base64.b64encode(bytes(r["html"])).decode()
                if r["html"] is not None
                else None,
                "lang": r["lang"],
            }
        )
        kafka_rows.append(("t", p, offsets[p], bytearray(val.encode())))
        offsets[p] += 1
    kdf = spark.createDataFrame(
        kafka_rows, "topic string, partition int, offset long, value binary"
    )
    adapted = from_kafka_shape(kdf, n_partitions=n_parts)
    # globally unique seq, per-partition order preserved
    assert adapted.count() == adapted.select("seq").distinct().count()

    t1 = SnapshotTable(spark, str(tmp_path / "k"), "url", 8).create(PAGES)
    p1 = IngestPipeline(spark, ChangeLogSource(adapted), t1)
    p1.run_to_end(span=700)

    t2 = SnapshotTable(spark, str(tmp_path / "n"), "url", 8).create(PAGES)
    p2 = IngestPipeline(spark, ChangeLogSource(native), t2)
    p2.run_to_end(span=300)

    k = sorted((r["url"], r["text"]) for r in p1.current_state().collect())
    n = sorted((r["url"], r["text"]) for r in p2.current_state().collect())
    assert k == n and len(k) > 40
