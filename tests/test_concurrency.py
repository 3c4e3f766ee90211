"""Commit-conflict CAS, orphan-manifest GC, sidecar self-heal, and
streaming run-token fencing.

Reference analog: the processing_history "already started" checks
(clinvar_ingest/cloud/bigquery/processing_history.py:193-226) guard the
reference against double-processing; here the same hazard is two lake
writers racing one pointer, handled Iceberg-style (CAS with conflict
error) instead of silently last-swap-wins.
"""

import datetime as dt
import os
import shutil

import pytest
from pyspark.sql import types as T

from clinvar_ingest_spark.sources import ChangeLogSource, synthetic_change_log
from clinvar_ingest_spark.sources.change_log import OffsetRange
from clinvar_ingest_spark.streaming import IngestPipeline
from clinvar_ingest_spark.tables import CommitConflictError, SnapshotTable

TS = dt.datetime(2020, 1, 1)

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

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("seq", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, seq long, text string, op string"
    )


def test_concurrent_commit_raises_conflict(spark, tmp_table_dir):
    """Two writers plan from snapshot N; the second swap must fail,
    not silently discard the first commit's data and HWM."""
    t = SnapshotTable(spark, tmp_table_dir, "url", 8).create(SCHEMA)
    t.merge_upsert(_batch(spark, [("u1", TS, 1, "v1", "insert")]))

    # writer B reads the table at snapshot 1 ...
    writer_b = SnapshotTable(spark, tmp_table_dir, "url", 8)
    stale_manifest = writer_b.current_manifest()
    # ... writer A commits snapshot 2 in the meantime
    t.merge_upsert(_batch(spark, [("u2", TS, 2, "v1", "insert")]))
    # ... writer B's commit against the stale parent must CAS-fail
    with pytest.raises(CommitConflictError):
        writer_b._commit(
            {}, SCHEMA, {}, stale_manifest["snapshot_id"],
            {"n_rows": 0}, parent_name=stale_manifest["_name"],
        )
    # writer A's data survived
    assert {r["url"] for r in t.read().collect()} == {"u1", "u2"}


def test_orphan_manifest_never_surfaces_in_time_travel(spark, tmp_table_dir):
    """A manifest written but never pointer-swapped (torn commit) shares
    snapshot_id with the next real commit; read_at must resolve through
    the committed parent chain and the orphan must be GC'd."""
    import json

    t = SnapshotTable(spark, tmp_table_dir, "url", 8).create(SCHEMA)
    t.merge_upsert(_batch(spark, [("u1", TS, 1, "v1", "insert")]))

    # forge an orphan with the NEXT snapshot id (what a torn commit leaves)
    orphan = {
        "snapshot_id": t.snapshot_id() + 1,
        "parent_id": t.snapshot_id(),
        "parent_name": t._read_ptr(),
        "key_col": "url", "n_buckets": 8,
        "schema": t.current_manifest()["schema"],
        "buckets": {}, "properties": {}, "stats": {"n_rows": 0},
        "read_mode": "plain",
    }
    orphan_name = "m-00000002-deadbeef.json"
    with open(os.path.join(tmp_table_dir, "_manifests", orphan_name), "w") as f:
        json.dump(orphan, f)

    # the real snapshot 2 commits afterwards
    t.merge_upsert(_batch(spark, [("u2", TS, 2, "v2", "insert")]))

    # time travel to snapshot 2 returns the COMMITTED one (has u1+u2),
    # never the empty orphan
    rows = {r["url"] for r in t.read_at(2).collect()}
    assert rows == {"u1", "u2"}
    # the orphan was GC'd by the successful commit
    assert orphan_name not in os.listdir(os.path.join(tmp_table_dir, "_manifests"))
    # history walks the parent chain: create, batch1, batch2
    assert len(t.history()) == 3


def test_ensure_sidecars_rebuilds_lost_lineage(spark, tmp_path):
    """Crash after the atomic commit but before the sidecar write must
    not lose lineage forever: ensure_sidecars rebuilds from the manifest
    chain + log replay, and verify_lineage goes green again."""
    path = str(tmp_path / "t")
    tbl = SnapshotTable(spark, path, "url", 8).create(PAGES)
    src = ChangeLogSource(synthetic_change_log(spark, 600, n_urls=100))
    pipe = IngestPipeline(spark, src, tbl)
    pipe.run_batch(OffsetRange(-1, 299), log_end_seq=599)
    pipe.run_batch(OffsetRange(299, 599), log_end_seq=599)
    assert pipe.verify_lineage()["ok"]

    # simulate the crash: batch 1's sidecars vanish post-commit
    shutil.rmtree(f"{path}/_lineage/batch=1")
    shutil.rmtree(f"{path}/_metrics/batch=1")
    assert not pipe.verify_lineage()["ok"]

    healed = pipe.ensure_sidecars()
    assert healed == [1]
    audit = pipe.verify_lineage()
    assert audit["ok"], audit["problems"]

    # the skipped-batch path heals too (idempotent; nothing missing now)
    rep = pipe.run_batch(OffsetRange(-1, 299), log_end_seq=599)
    assert rep.skipped


def test_stream_restart_with_fresh_checkpoint_loses_nothing(spark, tmp_path):
    """Restarting a stream against a NEW checkpointLocation resets
    epoch_id to 0; the fence must not skip those re-delivered batches
    (LWW idempotency absorbs the replay instead)."""
    from clinvar_ingest_spark.sources.synthetic import synthetic_change_log
    from clinvar_ingest_spark.streaming.structured import StreamingIngest

    log_dir = str(tmp_path / "log")
    log = synthetic_change_log(spark, 400, n_urls=80)
    log.write.parquet(log_dir)
    schema = spark.read.parquet(log_dir).schema

    path = str(tmp_path / "t")
    tbl = SnapshotTable(spark, path, "url", 8).create(PAGES)
    ing = StreamingIngest(spark, tbl, str(tmp_path / "ckpt1"))
    ing.run_available_now(log_dir, schema)
    state1 = sorted(
        (r["url"], r["seq"]) for r in tbl.read().select("url", "seq").collect()
    )
    assert state1  # drained something

    # "operator deleted the checkpoint": fresh checkpoint dir replays
    # the whole log from epoch 0 — final state must be unchanged, not
    # silently missing every batch whose epoch_id <= stored epoch
    ing2 = StreamingIngest(spark, tbl, str(tmp_path / "ckpt2"))
    ing2.run_available_now(log_dir, schema)
    state2 = sorted(
        (r["url"], r["seq"]) for r in tbl.read().select("url", "seq").collect()
    )
    assert state2 == state1


def test_stale_lock_from_dead_writer_is_broken(spark, tmp_table_dir):
    """A writer SIGKILLed between lock creation and release must not
    wedge the table: the next commit detects the dead pid (or an
    over-TTL mtime) and breaks the lock instead of raising."""
    t = SnapshotTable(spark, tmp_table_dir, "url", 8).create(SCHEMA)
    t.merge_upsert(_batch(spark, [("u1", TS, 1, "v1", "insert")]))

    lock = os.path.join(tmp_table_dir, "_commit.lock")
    # a pid that is certainly dead: fork a child that exits immediately
    pid = os.fork()
    if pid == 0:
        os._exit(0)
    os.waitpid(pid, 0)
    with open(lock, "w") as f:
        f.write(str(pid))
    # fresh mtime + dead pid → broken by the liveness probe
    t.merge_upsert(_batch(spark, [("u2", TS, 2, "v1", "insert")]))
    assert {r["url"] for r in t.read().collect()} == {"u1", "u2"}
    assert not os.path.exists(lock)

    # unreadable foreign lock, mtime past TTL → broken by age
    with open(lock, "w") as f:
        f.write("not-a-pid")
    old = os.stat(lock).st_mtime - 3600
    os.utime(lock, (old, old))
    t.merge_upsert(_batch(spark, [("u3", TS, 3, "v1", "insert")]))
    assert t.read().count() == 3
    assert not os.path.exists(lock)


def test_live_lock_still_blocks_commit(spark, tmp_table_dir):
    """A FRESH lock held by a live pid (this process) must still make a
    concurrent commit wait and fail — stale-breaking must not turn the
    lock into a no-op."""
    t = SnapshotTable(spark, tmp_table_dir, "url", 8).create(SCHEMA)
    t.merge_upsert(_batch(spark, [("u1", TS, 1, "v1", "insert")]))
    lock = os.path.join(tmp_table_dir, "_commit.lock")
    with open(lock, "w") as f:
        f.write(str(os.getpid()))
    try:
        with pytest.raises(CommitConflictError):
            t._acquire_lock(wait=0.5)
    finally:
        os.unlink(lock)


def test_history_with_legacy_manifest_chain(spark, tmp_table_dir):
    """Pre-upgrade manifests (no parent_name) must appear exactly once in
    history(), and expiry over a mixed chain must not unlink a kept
    manifest (round-2 ADVICE: the legacy prefix duplicated walked
    ancestors)."""
    import json

    t = SnapshotTable(spark, tmp_table_dir, "url", 8).create(SCHEMA)
    t.merge_upsert(_batch(spark, [("u1", TS, 1, "v1", "insert")]))
    t.merge_upsert(_batch(spark, [("u2", TS, 2, "v1", "insert")]))
    t.merge_upsert(_batch(spark, [("u3", TS, 3, "v1", "insert")]))
    chain = t.history()
    assert len(chain) == 4  # create + 3 merges

    # strip parent_name from the SECOND manifest → walk stops there,
    # legacy fallback must splice in only the strictly-older prefix
    mdir = os.path.join(tmp_table_dir, "_manifests")
    legacy_name = chain[1]
    with open(os.path.join(mdir, legacy_name)) as f:
        m = json.load(f)
    del m["parent_name"]
    with open(os.path.join(mdir, legacy_name), "w") as f:
        json.dump(m, f)

    got = t.history()
    assert got == chain  # same order, no duplicates
    assert len(set(got)) == len(got)

    # expiry keeps the newest 2 and must leave them readable
    t.vacuum_orphans(keep_snapshots=2)
    assert len(t.history()) == 2
    assert t.read().count() == 3  # state intact


def test_stale_break_verifies_inode_and_restores_live_lock(spark, tmp_path):
    """ADVICE r3 TOCTOU: if the 'stale' lock was replaced by a LIVE
    writer's fresh lock between the staleness check and the break, the
    break must not steal it — inode mismatch aborts (and a mid-rename
    steal is restored)."""
    import os

    from pyspark.sql import types as T

    from clinvar_ingest_spark.tables import SnapshotTable

    schema = T.StructType([T.StructField("url", T.StringType()),
                           T.StructField("seq", T.LongType())])
    t = SnapshotTable(spark, str(tmp_path / "t"), "url", 2).create(schema)
    lock = os.path.join(t.path, "_commit.lock")

    # dead-holder stale lock, then REPLACED by a live writer before the
    # breaker runs (simulates the race): break must be a no-op
    with open(lock, "w") as f:
        f.write("999999999")
    os.utime(lock, (0, 0))                      # ancient -> stale
    stale_ino = os.stat(lock).st_ino
    os.unlink(lock)                             # holder 'released'
    with open(lock, "w") as f:                  # live writer re-acquired
        f.write(str(os.getpid()))
    live_ino = os.stat(lock).st_ino
    t._break_stale_lock(lock, stale_ino)
    assert os.path.exists(lock)
    assert os.stat(lock).st_ino == live_ino     # untouched

    # matching inode + genuinely stale -> broken
    os.unlink(lock)
    with open(lock, "w") as f:
        f.write("999999999")
    os.utime(lock, (0, 0))
    t._break_stale_lock(lock, os.stat(lock).st_ino)
    assert not os.path.exists(lock)


def test_release_lock_checks_ownership(spark, tmp_path):
    """A TTL-broken slow writer must not unlink its successor's lock."""
    import os

    from pyspark.sql import types as T

    from clinvar_ingest_spark.tables import SnapshotTable

    schema = T.StructType([T.StructField("url", T.StringType()),
                           T.StructField("seq", T.LongType())])
    t = SnapshotTable(spark, str(tmp_path / "t"), "url", 2).create(schema)
    lock = os.path.join(t.path, "_commit.lock")
    with open(lock, "w") as f:
        f.write(str(os.getpid() + 12345))       # someone else's lock
    t._release_lock(lock)
    assert os.path.exists(lock)                 # NOT removed
    with open(lock, "w") as f:
        f.write(str(os.getpid()))               # ours
    t._release_lock(lock)
    assert not os.path.exists(lock)
