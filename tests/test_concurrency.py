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
