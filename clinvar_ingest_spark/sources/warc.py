"""WARC segment parsing — the Common-Crawl native record format.

A WARC file is a concatenation of records, each an ASCII header block
(``WARC/1.0`` + ``Key: Value`` lines) followed by a blank line and the
payload. The reference ingests pre-extracted page events; a production
crawl pipeline starts one step earlier, at the WARC segments — so the
engine provides the splitter as a SOURCE-side operator.

Spark-first: record splitting and header extraction are pure
``split``/``regexp_extract`` column expressions — whole-stage codegen,
no Python in the path, parallel at scan granularity (a 100 TB crawl is
just more segments). Payload decode then flows into the same
``extract_text`` path as every other source.

Scope note (honest): this parses the WARC *logical* format over text
segments; production WARCs are gzip-per-record — Spark's codec handles
the decompression at read time, and binary payloads ride the existing
``html: binary`` column convention.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CRLF = "\r\n"
RECORD_MARK = "WARC/1.0" + CRLF


def parse_warc_segments(
    segments: DataFrame,
    seg_col: str = "segment",
) -> DataFrame:
    """Explode WARC segments into records: one row per record with
    (warc_uri, warc_date, warc_type, payload). Records missing a
    Target-URI (e.g. warcinfo) get NULL uri — filter by warc_type."""
    rec = F.explode(F.split(F.col(seg_col), F.lit("WARC/1\\.0\r\n"))).alias("rec")
    recs = segments.select(rec).filter(F.length("rec") > 0)

    def hdr(name: str) -> Column:
        return F.nullif(
            F.regexp_extract(F.col("rec"), f"(?s){name}: ([^\r\n]+)", 1), F.lit("")
        )

    payload = F.regexp_extract(F.col("rec"), r"(?s)\r\n\r\n(.*?)\r\n\r\n", 1)
    return recs.select(
        hdr("WARC-Target-URI").alias("warc_uri"),
        hdr("WARC-Date").alias("warc_date"),
        hdr("WARC-Type").alias("warc_type"),
        payload.alias("payload"),
    )


def make_warc_record(
    uri: Column, date: Column, payload: Column, warc_type: str = "response"
) -> Column:
    """Serialize one record (the writer side of the round-trip)."""
    return F.concat(
        F.lit(RECORD_MARK),
        F.lit(f"WARC-Type: {warc_type}{CRLF}"),
        F.lit("WARC-Target-URI: "), uri, F.lit(CRLF),
        F.lit("WARC-Date: "), date, F.lit(CRLF),
        F.lit("Content-Length: "), F.length(payload).cast("string"), F.lit(CRLF),
        F.lit(CRLF),
        payload,
        F.lit(CRLF + CRLF),
    )
