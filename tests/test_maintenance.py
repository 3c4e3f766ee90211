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


def test_vacuum_orphans_sweeps_unreferenced_files(spark, tmp_path):
    """Files left by crashed/conflicted writes (final-path direct
    writer) are invisible but consume storage; vacuum_orphans removes
    exactly the unreferenced ones and reads are unchanged."""
    import datetime as dt
    import os

    from pyspark.sql import types as T

    from clinvar_ingest_spark.tables import SnapshotTable

    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("seq", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    t = SnapshotTable(spark, str(tmp_path / "t"), "url", 8).create(schema)
    TS = dt.datetime(2020, 1, 1)
    b = spark.createDataFrame(
        [("u1", TS, 1, "v1", "insert"), ("u2", TS, 2, "v1", "insert")],
        "url string, warc_ts timestamp, seq long, text string, op string",
    )
    t.merge_upsert(b)
    # forge orphans: a fake crashed write's files
    orphan_dir = os.path.join(str(tmp_path / "t"), "data", "s99999999-dead")
    os.makedirs(orphan_dir)
    for i in range(3):
        with open(os.path.join(orphan_dir, f"b{i:05d}-dead.parquet"), "wb") as f:
            f.write(b"not really parquet")
    before = {r["url"] for r in t.read().collect()}
    res = t.vacuum_orphans()
    assert res["removed"] == 3 and res["kept"] >= 1
    assert not os.path.exists(orphan_dir)  # emptied dir swept
    assert {r["url"] for r in t.read().collect()} == before


def test_vacuum_orphans_expires_old_snapshots(spark, tmp_path):
    import datetime as dt

    from pyspark.sql import types as T

    from clinvar_ingest_spark.tables import SnapshotTable

    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("seq", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    t = SnapshotTable(spark, str(tmp_path / "t"), "url", 4).create(schema)
    TS = dt.datetime(2020, 1, 1)
    for i in range(4):
        t.merge_upsert(spark.createDataFrame(
            [(f"u{i}", TS, i, f"v{i}", "insert")],
            "url string, warc_ts timestamp, seq long, text string, op string",
        ))
    assert len(t.history()) == 5  # create + 4 merges
    res = t.vacuum_orphans(keep_snapshots=2)
    assert res["snapshots"] == 2
    assert len(t.history()) == 2
    # current state intact; expired snapshot ids no longer resolvable
    assert {r["url"] for r in t.read().collect()} == {"u0", "u1", "u2", "u3"}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        t.read_at(1)


def test_merge_upsert_retrying_converges_after_conflict(spark, tmp_path):
    """Two writers planning from the same parent: the loser's retry
    re-reads the winner's commit and converges (serializable outcome)."""
    import datetime as dt

    from pyspark.sql import types as T

    from clinvar_ingest_spark.tables import SnapshotTable

    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("seq", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    path = str(tmp_path / "t")
    TS = dt.datetime(2020, 1, 1)
    t = SnapshotTable(spark, path, "url", 8).create(schema)
    t.merge_upsert(spark.createDataFrame(
        [("u1", TS, 1, "v1", "insert")],
        "url string, warc_ts timestamp, seq long, text string, op string",
    ))

    # writer B plans from snapshot 1... then writer A commits snapshot 2
    writer_b = SnapshotTable(spark, path, "url", 8)
    orig = SnapshotTable._commit
    raced = {"done": False}

    def racing_commit(self, *args, **kw):
        if not raced["done"]:
            raced["done"] = True
            # sneak writer A's commit in first, against the same parent
            t.merge_upsert(spark.createDataFrame(
                [("u2", TS, 2, "v2", "insert")],
                "url string, warc_ts timestamp, seq long, text string, op string",
            ))
        return orig(self, *args, **kw)

    SnapshotTable._commit = racing_commit
    try:
        writer_b.merge_upsert_retrying(spark.createDataFrame(
            [("u3", TS, 3, "v3", "insert")],
            "url string, warc_ts timestamp, seq long, text string, op string",
        ))
    finally:
        SnapshotTable._commit = orig
    assert {r["url"] for r in t.read().collect()} == {"u1", "u2", "u3"}


def test_compact_sort_by_orders_files_and_prunes(spark, tmp_path):
    """compact(sort_by=['url']) must leave each rewritten file sorted by
    url with tight per-row-group min/max url stats — the Iceberg
    sort-order analog that makes parquet row-group pruning serve point
    lookups."""
    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    from clinvar_ingest_spark.tables import SnapshotTable

    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("seq", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    t = SnapshotTable(spark, str(tmp_path / "t"), "url", 4).create(schema)
    import datetime as dt
    TS = dt.datetime(2024, 1, 1)
    # 3 batches → multiple files per bucket, urls deliberately unsorted
    for b in range(3):
        rows = [(f"https://s/{(97 * i + b) % 300:05d}", TS, b * 1000 + i,
                 "x", "insert") for i in range(100)]
        t.merge_upsert(spark.createDataFrame(
            rows, "url string, warc_ts timestamp, seq long, text string, op string"
        ), merge_mode="mor")
    before = t.read().count()
    res = t.compact(sort_by=["url"])
    assert res is not None
    assert t.read().count() == before

    m = t.current_manifest()
    checked = 0
    for files in m["buckets"].values():
        assert len(files) == 1
        pf = pq.ParquetFile(files[0])
        urls = pf.read(columns=["url"])["url"].to_pylist()
        assert urls == sorted(urls)  # file fully sorted
        checked += 1
    assert checked == 4


def test_zorder_compaction_prunes_both_dimensions(spark, tmp_path):
    """Z-sorted files carry tight row-group stats on the interleaved
    key: a zkey range filter is pushed to the scan, and the written
    files are monotonic in zkey (the layout compact(sort_by=[zorder])
    produces)."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from clinvar_ingest_spark.functions.layout import zorder_key

    df = spark.range(4096).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
        F.col("id").alias("payload"),
    ).withColumn("zkey", zorder_key("x", "y", bits=6))
    out = str(tmp_path / "z")
    (df.repartition(2)
       .sortWithinPartitions("zkey")
       .write.mode("overwrite")
       .option("parquet.block.size", 16 * 1024)
       .parquet(out))
    for f in glob.glob(f"{out}/*.parquet"):
        vals = pq.read_table(f, columns=["zkey"])["zkey"].to_pylist()
        assert vals == sorted(vals)
    got = spark.read.parquet(out).filter(
        (F.col("zkey") >= 100) & (F.col("zkey") < 200)
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThanOrEqual(zkey,100)" in plan
    # z-curve locality: both source dims are bounded within the range
    rows = got.collect()
    assert rows and all(r["x"] < 16 and r["y"] < 16 for r in rows)


def test_delete_where_and_update_where(spark, tmp_path):
    """Row-level DML (Iceberg CoW DELETE/UPDATE analog): only matching
    buckets rewritten, non-matching buckets' files untouched, history
    preserved for time travel."""
    import datetime as dt

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from clinvar_ingest_spark.tables import SnapshotTable

    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("seq", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    t = SnapshotTable(spark, str(tmp_path / "t"), "url", 8).create(schema)
    rows = [
        (f"https://s/{i}", dt.datetime(2024, 1, 1), i, f"text {i}", "update")
        for i in range(40)
    ]
    t.merge_upsert(spark.createDataFrame(
        rows, "url string, warc_ts timestamp, seq long, text string, op string"
    ))
    m_before = t.current_manifest()
    sid0 = t.snapshot_id()

    res = t.delete_where(F.col("seq") % 10 == 3)
    assert res is not None and len(res.touched_buckets) < 8
    state = {r["url"]: r["text"] for r in t.read().collect()}
    assert len(state) == 36
    assert all(int(u.rsplit("/", 1)[1]) % 10 != 3 for u in state)
    # untouched buckets keep their exact files
    m_after = t.current_manifest()
    for b, files in m_before["buckets"].items():
        if int(b) not in res.touched_buckets:
            assert m_after["buckets"][b] == files

    res2 = t.update_where(
        F.col("seq") < 5, {"text": F.upper(F.col("text"))}
    )
    assert res2 is not None
    state = {r["seq"]: r["text"] for r in t.read().collect()}
    assert state[1] == "TEXT 1" and state[7] == "text 7"
    assert len(state) == 36  # no rows gained/lost

    # no-match DML is a no-op (no new snapshot)
    sid = t.snapshot_id()
    assert t.delete_where(F.col("seq") > 10**9) is None
    assert t.snapshot_id() == sid

    # time travel still sees the pre-DML state
    assert t.read_at(sid0).count() == 40

    # bucketing key is immutable in place
    import pytest

    with pytest.raises(ValueError, match="bucketing key"):
        t.update_where(F.lit(True), {"url": F.lit("x")})


def test_tags_metadata_tables_and_maintenance_tick(spark, tmp_path):
    """Catalog/ops parity: snapshot tags survive expiry (retention
    roots), metadata tables expose snapshots/files as DataFrames, and
    maintenance_tick compacts fat buckets + expires + GCs in one pass."""
    import datetime as dt

    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from clinvar_ingest_spark.tables import SnapshotTable

    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("seq", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    t = SnapshotTable(spark, str(tmp_path / "t"), "url", 4).create(schema)

    def batch(lo, hi, day):
        return spark.createDataFrame(
            [(f"https://s/{i}", dt.datetime(2024, 1, day), lo + i,
              f"text {i}", "update") for i in range(hi - lo)],
            "url string, warc_ts timestamp, seq long, text string, op string",
        )

    # MoR appends fatten buckets -> real compaction work for the tick
    for b in range(6):
        t.merge_upsert(batch(b * 100, b * 100 + 30, b + 1), merge_mode="mor")
    sid_tagged = t.tag("after-batch-6")
    n_tagged = t.read().count()
    t.merge_upsert(batch(600, 640, 20), merge_mode="mor")

    assert t.refs() == {"after-batch-6": sid_tagged}
    assert t.read_ref("after-batch-6").count() == n_tagged
    with pytest.raises(ValueError, match="no tag"):
        t.read_ref("nope")

    snaps = t.meta_snapshots().collect()
    assert [r["snapshot_id"] for r in snaps] == sorted(
        r["snapshot_id"] for r in snaps
    )
    assert len(snaps) == 8  # create + 7 merges
    files = t.meta_files().collect()
    assert sum(r["n_rows"] for r in files) == t.read(
        include_deleted=True, resolve=False
    ).count()
    assert max(
        len([r for r in files if r["bucket"] == b]) for b in range(4)
    ) > 4  # genuinely fat before the tick

    rep = t.maintenance_tick(max_files_per_bucket=1, keep_snapshots=2)
    assert rep["compacted"] == 4
    # expiry kept the TAGGED snapshot even though keep_snapshots=2
    # would have expired it (retention root)
    assert t.read_ref("after-batch-6").count() == n_tagged
    assert any(
        r["snapshot_id"] == sid_tagged for r in t.meta_snapshots().collect()
    )
    # after dropping the tag, the next expiry can remove it
    t.drop_ref("after-batch-6")
    t.vacuum_orphans(keep_snapshots=1)
    assert all(
        r["snapshot_id"] != sid_tagged for r in t.meta_snapshots().collect()
    )
    # state intact throughout: every batch rewrites urls 0..N-1, so
    # the LWW state is the last batch's 40 distinct urls
    assert t.read().count() == 40


def test_delete_where_preserves_tombstones(spark, tmp_path):
    """ADVICE r4: delete_where removes only LIVE matching rows —
    tombstones whose payload matches the predicate are LWW delete
    markers and must survive the rewrite, or a late stale event
    resurrects the key."""
    import datetime as dt

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from clinvar_ingest_spark.tables import SnapshotTable

    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("seq", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    t = SnapshotTable(spark, str(tmp_path / "t"), "url", 4).create(schema)
    ddl = "url string, warc_ts timestamp, seq long, text string, op string"
    t.merge_upsert(spark.createDataFrame(
        [(f"https://s/{i}", dt.datetime(2024, 1, 2), i, f"text {i}", "update")
         for i in range(10)], ddl,
    ))
    # tombstone url 3 via CDC delete (newer than the stored row)
    t.merge_upsert(spark.createDataFrame(
        [("https://s/3", dt.datetime(2024, 1, 3), 100, None, "delete")], ddl,
    ))
    # admin-delete everything with seq < 200 — predicate matches the
    # tombstone's payload too, but only LIVE rows may be removed
    res = t.delete_where(F.col("seq") < 200)
    assert res is not None
    assert t.read().count() == 0
    # the tombstone is still there...
    tomb = t.read(include_deleted=True).filter("url = 'https://s/3'")
    assert tomb.count() == 1
    # ...so a LATE STALE update (older warc_ts) stays dead
    t.merge_upsert(spark.createDataFrame(
        [("https://s/3", dt.datetime(2024, 1, 1), 3, "stale", "update")], ddl,
    ))
    assert t.read().filter("url = 'https://s/3'").count() == 0


def test_incremental_lineage_audit_matches_full(spark, tmp_path):
    """VERDICT r4 #6: per-batch incremental audit (cursor-seeded,
    O(new batches)) agrees with the full audit over a soak, reads only
    the new batches each call, and a stale-cursor tamper is detected on
    the NEXT increment."""
    pipe = _pipe(spark, str(tmp_path / "t"), n=900)
    end = pipe.source.max_seq()
    seen_batches = 0
    for rng in pipe.source.plan_batches(-1, end, 300):
        pipe.run_batch(rng, log_end_seq=end)
        inc = pipe.verify_lineage_incremental()
        assert inc["ok"], inc["problems"]
        assert inc["n_new_batches"] == 1  # cursor pruning: only the new one
        seen_batches += 1
    assert seen_batches == 3
    # steady state: nothing new to audit, still ok
    idle = pipe.verify_lineage_incremental()
    assert idle["ok"] and idle["n_new_batches"] == 0
    # the full (opt-in) audit agrees at the end of the soak
    full = pipe.verify_lineage()
    assert full["ok"], full["problems"]
    assert full["n_lineage_rows"] > 0

    # tamper PAST the cursor: a bogus future batch with overlapping
    # ranges must be flagged by the next incremental call, and the
    # cursor must NOT advance past a failed audit
    import shutil

    shutil.copytree(
        f"{pipe.target.path}/_lineage/batch=0",
        f"{pipe.target.path}/_lineage/batch=99",
    )
    bad = pipe.verify_lineage_incremental()
    assert not bad["ok"] and bad["n_new_batches"] == 1
    # still failing on re-run (cursor frozen until repaired)
    assert not pipe.verify_lineage_incremental()["ok"]
    shutil.rmtree(f"{pipe.target.path}/_lineage/batch=99")
    assert pipe.verify_lineage_incremental()["ok"]
