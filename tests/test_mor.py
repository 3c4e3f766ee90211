"""Merge-on-read mode: append-only deltas, LWW at read, compact folds.

The scale path for uniform update keys (SCALE.md): no per-batch
rewrite; correctness must be indistinguishable from copy-on-write.
"""

import pytest
from pyspark.sql import types as T

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

N = 1200


def _pipe(spark, path, mode):
    tbl = SnapshotTable(spark, path, "url", 8).create(PAGES)
    src = ChangeLogSource(synthetic_change_log(spark, N, n_urls=150))
    return IngestPipeline(spark, src, tbl, merge_mode=mode)


def _state(pipe):
    return sorted(
        (r["url"], r["seq"], r["text"], r["lang"])
        for r in pipe.current_state().collect()
    )


def test_mor_equals_cow(spark, tmp_path):
    cow = _pipe(spark, str(tmp_path / "cow"), "cow")
    cow.run_to_end(span=300)
    mor = _pipe(spark, str(tmp_path / "mor"), "mor")
    mor.run_to_end(span=300)
    assert _state(cow) == _state(mor)

    # MoR never rewrote: batch-1 base files still listed verbatim, file
    # counts grow per batch
    m = mor.target.current_manifest()
    assert m["read_mode"] == "lww"
    assert any(len(f) >= 3 for f in m["buckets"].values())
    first = None
    for name in mor.target.history():
        import json

        mm = json.load(open(f"{mor.target.path}/_manifests/{name}"))
        if mm["snapshot_id"] == 1:
            first = mm
    for b, files in first["buckets"].items():
        assert set(files) <= set(m["buckets"][b])


def test_mor_compact_resolves_to_plain(spark, tmp_path):
    mor = _pipe(spark, str(tmp_path / "mor"), "mor")
    mor.run_to_end(span=300)
    before = _state(mor)
    res = mor.target.compact()
    assert res is not None
    m = mor.target.current_manifest()
    assert m["read_mode"] == "plain"
    assert all(len(f) == 1 for f in m["buckets"].values())
    assert _state(mor) == before
    # further MoR batches on the compacted table flip it back to lww
    src2 = ChangeLogSource(synthetic_change_log(spark, 2 * N, n_urls=150))
    mor2 = IngestPipeline(
        spark, src2, SnapshotTable(spark, str(tmp_path / "mor"), "url", 8),
        merge_mode="mor",
    )
    mor2.run_to_end(span=N)
    assert mor2.target.current_manifest()["read_mode"] == "lww"
    # and the combined history equals a pure-cow replay of the full log
    ref = SnapshotTable(spark, str(tmp_path / "ref"), "url", 8).create(PAGES)
    refp = IngestPipeline(spark, src2, ref, merge_mode="cow")
    refp.run_to_end(span=N)
    assert _state(mor2) == _state(refp)


def test_mor_resume_and_fencing(spark, tmp_path):
    path = str(tmp_path / "t")
    p1 = _pipe(spark, path, "mor")
    from clinvar_ingest_spark.sources.change_log import OffsetRange

    p1.run_batch(OffsetRange(-1, 500), log_end_seq=N - 1)
    p2 = IngestPipeline(
        spark, p1.source, SnapshotTable(spark, path, "url", 8), merge_mode="mor"
    )
    assert p2.global_hwm() == 500
    p2.run_to_end(span=400)
    assert p2.run_batch(OffsetRange(-1, 500)).skipped
    full = _pipe(spark, str(tmp_path / "full"), "mor")
    full.run_to_end(span=N)
    assert _state(p2) == _state(full)


def test_mor_schema_evolution(spark, tmp_path):
    tbl = SnapshotTable(spark, str(tmp_path / "t"), "url", 8).create(
        T.StructType([f for f in PAGES.fields if f.name != "lang"])
    )
    old = synthetic_change_log(spark, 400, n_urls=80, with_lang=False)
    new = synthetic_change_log(spark, 800, n_urls=80, with_lang=True).filter(
        "seq >= 400"
    )
    IngestPipeline(spark, ChangeLogSource(old), tbl, merge_mode="mor").run_to_end(
        span=400
    )
    assert "lang" not in [f.name for f in tbl.schema().fields]
    p2 = IngestPipeline(spark, ChangeLogSource(new), tbl, merge_mode="mor")
    p2.run_to_end(span=400)
    assert "lang" in [f.name for f in tbl.schema().fields]
    rows = p2.current_state().collect()
    for r in rows:
        if r["seq"] >= 400:
            assert r["lang"] is not None
        else:
            assert r["lang"] is None  # old delta files read back with NULL
