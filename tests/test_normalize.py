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
