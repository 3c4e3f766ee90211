"""Compaction + lineage audit + sessionization unit tests."""

import datetime as dt

from pyspark.sql import types as T

from clinvar_ingest_spark.operators.sessions import session_stats, sessionize
from clinvar_ingest_spark.sources import ChangeLogSource, synthetic_change_log
from clinvar_ingest_spark.streaming import IngestPipeline
from clinvar_ingest_spark.tables import SnapshotTable

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


def _pipe(spark, path, n=900, write_salts=1):
    tbl = SnapshotTable(spark, path, "url", 8, write_salts=write_salts).create(PAGES)
    return IngestPipeline(
        spark, ChangeLogSource(synthetic_change_log(spark, n, n_urls=120)), tbl
    )


def test_compact_reduces_files_preserves_state(spark, tmp_path):
    # write_salts=3 → several files per bucket per commit (the
    # write-parallelism path for oversized buckets)
    pipe = _pipe(spark, str(tmp_path / "t"), write_salts=3)
    pipe.run_to_end(span=300)
    before = sorted(
        (r["url"], r["seq"], r["text"]) for r in pipe.current_state().collect()
    )
    m = pipe.target.current_manifest()
    assert any(len(f) > 1 for f in m["buckets"].values())
    res = pipe.target.compact()
    assert res is not None
    m2 = pipe.target.current_manifest()
    assert all(len(f) == 1 for f in m2["buckets"].values())
    after = sorted(
        (r["url"], r["seq"], r["text"]) for r in pipe.current_state().collect()
    )
    assert before == after
    # compacting again is a no-op
    assert pipe.target.compact() is None


def test_lineage_audit_ok_and_detects_tampering(spark, tmp_path):
    pipe = _pipe(spark, str(tmp_path / "t"))
    pipe.run_to_end(span=300)
    audit = pipe.verify_lineage()
    assert audit["ok"], audit["problems"]
    assert audit["n_lineage_rows"] > 0
    # tamper: duplicate a lineage batch dir under a new id → overlap
    import shutil

    src = f"{pipe.target.path}/_lineage/batch=0"
    shutil.copytree(src, f"{pipe.target.path}/_lineage/batch=99")
    bad = pipe.verify_lineage()
    assert not bad["ok"]


def test_sessionize_golden(spark):
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, 1, base),
        (1, 2, base + dt.timedelta(minutes=10)),   # same session
        (1, 3, base + dt.timedelta(minutes=50)),   # gap 40m → new session
        (2, 4, base),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    s = {(r["user_id"], r["event_id"]): r["session_id"]
         for r in sessionize(df, gap_minutes=30).collect()}
    assert s == {(1, 1): 0, (1, 2): 0, (1, 3): 1, (2, 4): 0}
    stats = {r["user_id"]: (r["n_sessions"], r["max_session_events"])
             for r in session_stats(df, gap_minutes=30).collect()}
    assert stats == {1: (2, 2), 2: (1, 1)}
