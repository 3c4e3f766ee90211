"""Torn-commit crash injection: data written but pointer never swapped.

Reference analog: the rollback excepthook deleting started rows on
crash (misc/bin/workflow.py:73-107) — here nothing needs rolling back
because visibility IS the pointer swap.
"""

import json
import os

from pyspark.sql import types as T

from clinvar_ingest_spark.sources import ChangeLogSource, synthetic_change_log
from clinvar_ingest_spark.sources.change_log import OffsetRange
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


def test_torn_commit_is_invisible_and_heals(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "t")
    tbl = SnapshotTable(spark, path, "url", 8).create(PAGES)
    src = ChangeLogSource(synthetic_change_log(spark, 900, n_urls=120))
    pipe = IngestPipeline(spark, src, tbl)
    pipe.run_batch(OffsetRange(-1, 299), log_end_seq=899)
    state_before = sorted(
        (r["url"], r["seq"]) for r in pipe.current_state().collect()
    )
    sid_before = tbl.snapshot_id()

    # crash INSIDE the second batch: data files + manifest written, but
    # the process dies before the pointer swap
    orig_commit = SnapshotTable._commit

    def dying_commit(self, buckets, schema, properties, parent, stats, **kw):
        # reproduce everything _commit does EXCEPT the os.replace swap
        os.makedirs(os.path.join(self.path, "_manifests"), exist_ok=True)
        sid = parent + 1
        name = f"m-{sid:08d}-torn.json"
        with open(os.path.join(self.path, "_manifests", name), "w") as f:
            json.dump({"snapshot_id": sid, "torn": True}, f)
        raise RuntimeError("simulated crash before pointer swap")

    monkeypatch.setattr(SnapshotTable, "_commit", dying_commit)
    try:
        pipe.run_batch(OffsetRange(299, 599), log_end_seq=899)
    except RuntimeError:
        pass
    monkeypatch.setattr(SnapshotTable, "_commit", orig_commit)

    # invisible: reads and HWM unchanged
    fresh = SnapshotTable(spark, path, "url", 8)
    assert fresh.snapshot_id() == sid_before
    assert sorted(
        (r["url"], r["seq"]) for r in fresh.read().drop("_bucket").collect()
    ) == state_before

    # heals: a fresh pipeline resumes from the committed HWM and the
    # final state equals an uncrashed replay
    pipe2 = IngestPipeline(spark, src, fresh)
    assert pipe2.global_hwm() == 299
    pipe2.run_to_end(span=300)

    ref_tbl = SnapshotTable(spark, str(tmp_path / "ref"), "url", 8).create(PAGES)
    ref = IngestPipeline(spark, src, ref_tbl)
    ref.run_to_end(span=300)
    assert sorted(
        (r["url"], r["seq"], r["text"]) for r in pipe2.current_state().collect()
    ) == sorted(
        (r["url"], r["seq"], r["text"]) for r in ref.current_state().collect()
    )
