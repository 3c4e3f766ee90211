"""Normalization fan-out: entity tables derived from one state scan."""

import datetime as dt

from clinvar_ingest_spark.operators.normalize import derive_entities


def test_derive_entities_from_one_scan(spark):
    rows = [
        ("https://a.com/1", dt.datetime(2024, 1, 1), 1, "hello world"),
        ("https://a.com/2", dt.datetime(2024, 1, 3), 2, "more text here"),
        ("https://b.org/1", dt.datetime(2024, 1, 2), 3, "x"),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, seq long, text string"
    )
    ents = derive_entities(pages)
    ds = {r["domain"]: (r["n_pages"], r["total_text_chars"], r["max_seq"])
          for r in ents["domain_stats"].collect()}
    assert ds == {"a.com": (2, 25, 2), "b.org": (1, 1, 3)}
    ui = {r["url"]: r["domain"] for r in ents["url_index"].collect()}
    assert ui == {
        "https://a.com/1": "a.com",
        "https://a.com/2": "a.com",
        "https://b.org/1": "b.org",
    }


def test_pipeline_refreshes_derived_tables(spark, tmp_path):
    from pyspark.sql import types as T

    from clinvar_ingest_spark.operators.normalize import derive_domain_stats
    from clinvar_ingest_spark.sources import ChangeLogSource, synthetic_change_log
    from clinvar_ingest_spark.streaming import IngestPipeline
    from clinvar_ingest_spark.tables import SnapshotTable

    pages = T.StructType([T.StructField(n, t) for n, t in [
        ("url", T.StringType()), ("warc_ts", T.TimestampType()),
        ("seq", T.LongType()), ("html", T.BinaryType()),
        ("lang", T.StringType()), ("text", T.StringType())]])
    tbl = SnapshotTable(spark, str(tmp_path / "t"), "url", 8).create(pages)
    pipe = IngestPipeline(
        spark, ChangeLogSource(synthetic_change_log(spark, 600, n_urls=80)),
        tbl, derived={"domain_stats": derive_domain_stats},
    )
    pipe.run_to_end(span=300)
    got = {r["domain"]: r["n_pages"] for r in pipe.derived_table("domain_stats").collect()}
    want = {r["domain"]: r["n_pages"]
            for r in derive_domain_stats(pipe.current_state()).collect()}
    assert got == want and len(got) > 3
    # refreshed per batch: property tracks the latest source snapshot
    dt = SnapshotTable(spark, str(tmp_path / "t") + "__domain_stats")
    assert dt.properties()["source_snapshot"] == tbl.snapshot_id()


def test_incremental_refresh_equals_full_recompute(spark, tmp_path):
    """The incremental path (per-bucket partials, manifest-diff pruning)
    must equal a full recompute over the final state, across multiple
    batches with updates AND deletes (tombstoned urls leaving domains)."""
    from pyspark.sql import types as T

    from clinvar_ingest_spark.operators.normalize import (
        derive_domain_stats,
        domain_stats_incremental,
        url_index_incremental,
    )
    from clinvar_ingest_spark.sources import ChangeLogSource, synthetic_change_log
    from clinvar_ingest_spark.streaming import IngestPipeline
    from clinvar_ingest_spark.tables import SnapshotTable

    pages = T.StructType([T.StructField(n, t) for n, t in [
        ("url", T.StringType()), ("warc_ts", T.TimestampType()),
        ("seq", T.LongType()), ("html", T.BinaryType()),
        ("lang", T.StringType()), ("text", T.StringType())]])
    tbl = SnapshotTable(spark, str(tmp_path / "t"), "url", 8).create(pages)
    pipe = IngestPipeline(
        spark, ChangeLogSource(synthetic_change_log(spark, 1200, n_urls=150)),
        tbl,
        derived={
            "domain_stats": domain_stats_incremental,
            "url_index": url_index_incremental,
        },
    )
    pipe.run_to_end(span=300)  # 4 batches, each refreshing only its delta

    inc = {
        r["domain"]: (r["n_pages"], r["total_text_chars"], r["max_seq"])
        for r in pipe.derived_table("domain_stats").collect()
    }
    full = {
        r["domain"]: (r["n_pages"], r["total_text_chars"], r["max_seq"])
        for r in derive_domain_stats(pipe.current_state()).collect()
    }
    assert inc == full and len(inc) > 3

    # map-only derivation: the url index mirrors the state exactly
    idx = sorted(
        (r["url"], r["seq"]) for r in pipe.derived_table("url_index").collect()
    )
    state = sorted(
        (r["url"], r["seq"]) for r in pipe.current_state().collect()
    )
    assert idx == state


def test_incremental_refresh_skips_unchanged_buckets(spark, tmp_path):
    """After the bootstrap, a batch touching few buckets must refresh
    only the manifest-diff buckets, not all of them."""
    import datetime as dt

    from pyspark.sql import types as T

    from clinvar_ingest_spark.operators.normalize import domain_stats_incremental
    from clinvar_ingest_spark.sources import ChangeLogSource
    from clinvar_ingest_spark.streaming import IngestPipeline
    from clinvar_ingest_spark.sources.change_log import OffsetRange
    from clinvar_ingest_spark.tables import SnapshotTable

    pages = T.StructType([T.StructField(n, t) for n, t in [
        ("url", T.StringType()), ("warc_ts", T.TimestampType()),
        ("seq", T.LongType()), ("html", T.BinaryType()),
        ("lang", T.StringType()), ("text", T.StringType())]])
    rows = [
        ("p", i, "update", f"https://d{i % 5}.x/u{i}",
         dt.datetime(2024, 1, 1 + i % 20), None)
        for i in range(60)
    ] + [("p", 60, "update", "https://d0.x/u0", dt.datetime(2024, 2, 1), None)]
    log = spark.createDataFrame(
        [(0, s, o, u, t, h) for (_, s, o, u, t, h) in rows],
        "part int, seq long, op string, url string, warc_ts timestamp, "
        "html binary",
    )
    tbl = SnapshotTable(spark, str(tmp_path / "t"), "url", n_buckets=32).create(
        pages
    )
    pipe = IngestPipeline(
        spark, ChangeLogSource(log), tbl,
        derived={"domain_stats": domain_stats_incremental},
    )
    pipe.run_batch(OffsetRange(-1, 59), log_end_seq=60)   # bootstrap: all
    n2 = pipe.run_batch(OffsetRange(59, 60), log_end_seq=60)  # 1 url → 1 bucket
    assert not n2.skipped
    refreshed = pipe._refresh_incremental(
        "domain_stats", domain_stats_incremental
    )
    assert refreshed == 0  # already refreshed by run_batch (marker current)
