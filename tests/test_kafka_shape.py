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


def test_kafka_offset_gaps_and_interleave_resume(spark, tmp_path):
    """Real Kafka logs have PER-PARTITION OFFSET GAPS (compaction,
    transaction markers) and partitions that start late or interleave
    arbitrarily. The adapter's global seq therefore has holes; batching,
    HWM resume, and fencing must be gap-proof: ranges covering only
    holes apply cleanly as empty batches, a fresh pipeline resumes from
    the committed HWM across a gap, and re-applying an applied range is
    fenced."""
    import datetime as dt

    D = dt.datetime
    n_parts = 3
    # (partition, offset, url, ts, op) — gaps: p0 skips 2-4 and 6-8;
    # p1 skips 1-2; p2 produces nothing until offset 7 (late start)
    events = [
        (0, 0, "u1", D(2024, 1, 1, 1), "update"),
        (0, 1, "u2", D(2024, 1, 1, 2), "update"),
        (0, 5, "u1", D(2024, 1, 1, 9), "update"),   # final u1 winner
        (0, 9, "u4", D(2024, 1, 1, 4), "update"),
        (1, 0, "u2", D(2024, 1, 1, 3), "update"),
        (1, 3, "u3", D(2024, 1, 1, 5), "update"),  # superseded by (2,7)
        (1, 4, "u2", D(2024, 1, 1, 8), "delete"),   # u2 tombstoned
        (2, 7, "u3", D(2024, 1, 1, 7), "update"),
        (2, 8, "u5", D(2024, 1, 1, 6), "update"),
    ]
    kafka_rows = []
    for p, off, url, ts, op in events:
        val = json.dumps(
            {
                "op": op, "url": url,
                "warc_ts": ts.strftime("%Y-%m-%d %H:%M:%S"),
                "html": base64.b64encode(f"<p>{url}@{p}:{off}</p>".encode()).decode()
                if op != "delete" else None,
                "lang": "en",
            }
        )
        kafka_rows.append(("t", p, off, bytearray(val.encode())))
    # out-of-order interleave: reverse-sorted input
    kdf = spark.createDataFrame(
        list(reversed(kafka_rows)),
        "topic string, partition int, offset long, value binary",
    )
    adapted = from_kafka_shape(kdf, n_partitions=n_parts)
    seqs = sorted(r["seq"] for r in adapted.select("seq").collect())
    assert len(seqs) == len(set(seqs)) == len(events)
    # the global sequence REALLY has holes
    assert seqs[-1] - seqs[0] + 1 > len(seqs)

    t = SnapshotTable(spark, str(tmp_path / "g"), "url", 8).create(PAGES)
    src = ChangeLogSource(adapted)
    end = src.max_seq()
    pipe = IngestPipeline(spark, src, t)
    # tiny span → several ranges land entirely inside gaps (empty batches)
    ranges = src.plan_batches(-1, end, span=5)
    assert len(ranges) >= 5
    r1 = pipe.run_batch(ranges[0], log_end_seq=end)
    assert not r1.skipped
    # crash: a FRESH pipeline resumes from the committed HWM
    pipe2 = IngestPipeline(
        spark, src, SnapshotTable(spark, str(tmp_path / "g"), "url", 8)
    )
    assert pipe2.global_hwm() == ranges[0].hi
    pipe2.run_to_end(span=5, end_seq=end)
    # fencing still holds across gaps: re-apply an applied range
    assert pipe2.run_batch(ranges[0], log_end_seq=end).skipped

    got = sorted(
        (r["url"], r["text"]) for r in pipe2.current_state().collect()
    )
    assert got == [
        ("u1", "u1@0:5"), ("u3", "u3@2:7"), ("u4", "u4@0:9"), ("u5", "u5@2:8"),
    ]
