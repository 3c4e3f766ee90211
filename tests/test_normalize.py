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
