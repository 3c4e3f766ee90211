"""File-format sources: schema contract, gzip, dirty-value permissiveness."""

import gzip
import os

import pytest
from pyspark.sql import types as T

from clinvar_ingest_spark.sources.files import (
    read_any,
    read_csv,
    read_ndjson,
    write_ndjson,
)

SCHEMA = "id bigint, name string, score double"


def test_ndjson_roundtrip_gzip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a", 1.5), (2, "b", 2.5)], SCHEMA)
    out = str(tmp_path / "nd")
    write_ndjson(df, out, compression="gzip")
    assert any(f.endswith(".json.gz") for f in os.listdir(out))
    back = read_ndjson(spark, out, SCHEMA)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_ndjson_dirty_values_become_null(spark, tmp_path):
    p = tmp_path / "d"
    p.mkdir()
    with gzip.open(p / "part.json.gz", "wt") as f:
        f.write('{"id": 1, "name": "ok", "score": 1.0}\n')
        f.write('{"id": "not-a-number", "name": "bad", "score": 2.0}\n')
        f.write('{"id": 3, "name": null, "score": "junk"}\n')
    rows = {r["name"]: (r["id"], r["score"])
            for r in read_ndjson(spark, str(p), SCHEMA).collect()}
    assert rows["ok"] == (1, 1.0)
    assert rows["bad"] == (None, 2.0)          # int_or_none analog
    assert rows[None] == (3, None)


def test_ndjson_requires_schema_or_infer(spark, tmp_path):
    with pytest.raises(ValueError, match="schema"):
        read_ndjson(spark, str(tmp_path), None)


def test_csv_and_dispatch(spark, tmp_path):
    p = tmp_path / "c"
    p.mkdir()
    (p / "x.csv").write_text("id,name,score\n1,a,1.5\n2,b,oops\n")
    df = read_any(spark, str(p), "csv", SCHEMA)
    rows = {r["id"]: r["score"] for r in df.collect()}
    assert rows == {1: 1.5, 2: None}  # permissive cast
    with pytest.raises(ValueError, match="unknown format"):
        read_any(spark, str(p), "avro")


def test_explicit_schema_skips_inference_jobs(spark, tmp_path):
    """With a declared schema the reader must not run a sampling pass —
    checked by reading a file whose second row would break inference."""
    p = tmp_path / "n"
    p.mkdir()
    (p / "x.json").write_text('{"id": 1}\n{"id": {"nested": true}}\n')
    schema = T.StructType([T.StructField("id", T.LongType())])
    rows = [r["id"] for r in read_ndjson(spark, str(p), schema).collect()]
    assert rows[0] == 1 and rows[1] is None


def test_warc_parse_edge_records(spark):
    """warcinfo records (no Target-URI) surface with NULL uri; payload
    framing survives headers in any order and multi-record segments."""
    from clinvar_ingest_spark.sources.warc import (
        make_warc_record,
        parse_warc_segments,
    )
    from pyspark.sql import functions as F

    seg = (
        "WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\ninfo\r\n\r\n"
        "WARC/1.0\r\nWARC-Date: 2024-01-01T00:00:00Z\r\n"
        "WARC-Type: response\r\nWARC-Target-URI: https://a.b/x\r\n"
        "Content-Length: 11\r\n\r\n<p>hi</p>ok\r\n\r\n"
    )
    df = spark.createDataFrame([(seg,)], "segment string")
    got = sorted(
        (r["warc_type"], r["warc_uri"], r["payload"])
        for r in parse_warc_segments(df).collect()
    )
    assert got == [
        ("response", "https://a.b/x", "<p>hi</p>ok"),
        ("warcinfo", None, "info"),
    ]

    # serializer → parser round-trip is the identity
    src = spark.createDataFrame(
        [("https://x/1", "2024-02-02T02:02:02Z", "payload <b>one</b>")],
        "u string, d string, p string",
    )
    seg2 = src.select(
        make_warc_record(F.col("u"), F.col("d"), F.col("p")).alias("segment")
    )
    r = parse_warc_segments(seg2).collect()[0]
    assert (r["warc_uri"], r["warc_date"], r["payload"]) == (
        "https://x/1", "2024-02-02T02:02:02Z", "payload <b>one</b>"
    )


def test_warc_length_driven_framing_adversarial(spark):
    """Length-driven framing (VERDICT r3 #2): payloads containing blank
    CRLF lines, the literal record mark, fake header lines, and
    multi-byte UTF-8 must round-trip byte-exactly — Content-Length (in
    BYTES) delimits the payload, not delimiters."""
    from pyspark.sql import functions as F

    from clinvar_ingest_spark.sources.warc import (
        make_warc_record,
        parse_warc_segments,
    )

    payloads = [
        "before\r\n\r\nafter a blank line",
        "embedded mark WARC/1.0\r\nWARC-Type: fake\r\n\r\nstill me",
        "fake header\r\nContent-Length: 3\r\n\r\nxyz tail",
        "unicode €漢字 bytes ≠ chars\r\n\r\n€",
        "",  # empty payload
        "trailing crlf\r\n",
    ]
    src = spark.createDataFrame(
        [(i, f"https://a/{i}", "2024-01-01T00:00:00Z", p)
         for i, p in enumerate(payloads)],
        "i int, u string, d string, p string",
    )
    # one multi-record segment (warcinfo first), records in i order
    seg = src.select(
        make_warc_record(F.col("u"), F.col("d"), F.col("p")).alias("rec"), "i"
    ).groupBy().agg(
        F.concat(
            F.lit(
                "WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 9\r\n"
                "\r\nisPartOf!\r\n\r\n"
            ),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "rec"))),
                    lambda x: x["rec"],
                ),
                "",
            ),
        ).alias("segment")
    )
    rows = parse_warc_segments(seg).collect()
    assert len(rows) == len(payloads) + 1
    assert rows[0]["warc_type"] == "warcinfo" and rows[0]["payload"] == "isPartOf!"
    for i, p in enumerate(payloads):
        r = rows[i + 1]
        assert r["warc_uri"] == f"https://a/{i}", (i, r)
        assert r["payload"] == p, (i, r["payload"], p)


def test_warc_malformed_stops_without_guessing(spark):
    """A record missing Content-Length (or whose header never ends)
    stops the parse at that offset — records before it still parse,
    nothing after is guessed at."""
    from clinvar_ingest_spark.sources.warc import parse_warc_segments

    seg = (
        "WARC/1.0\r\nWARC-Target-URI: https://ok/1\r\nContent-Length: 2\r\n\r\nok\r\n\r\n"
        "WARC/1.0\r\nWARC-Target-URI: https://bad/2\r\n\r\nno content length\r\n\r\n"
        "WARC/1.0\r\nWARC-Target-URI: https://after/3\r\nContent-Length: 1\r\n\r\nz\r\n\r\n"
    )
    df = spark.createDataFrame([(seg,)], "segment string")
    rows = parse_warc_segments(df).collect()
    assert [r["warc_uri"] for r in rows] == ["https://ok/1"]


def test_warc_binary_segments_and_byte_lengths(spark):
    """Binary segment input parses identically; Content-Length counts
    bytes (multi-byte UTF-8 payload sliced correctly)."""
    from clinvar_ingest_spark.sources.warc import parse_warc_segments

    payload = "héllo€"  # 9 UTF-8 bytes, 6 chars
    seg = (
        "WARC/1.0\r\nWARC-Target-URI: https://b/1\r\n"
        f"Content-Length: {len(payload.encode())}\r\n\r\n{payload}\r\n\r\n"
        "WARC/1.0\r\nWARC-Target-URI: https://b/2\r\nContent-Length: 4\r\n\r\nnext\r\n\r\n"
    ).encode()
    df = spark.createDataFrame([(bytearray(seg),)], "segment binary")
    rows = parse_warc_segments(df).collect()
    assert [(r["warc_uri"], r["payload"]) for r in rows] == [
        ("https://b/1", payload), ("https://b/2", "next"),
    ]


def test_warc_gz_member_per_record_roundtrip(spark, tmp_path):
    """Production .warc.gz layout: one gzip member per record. The
    reader must walk members with a real decompressor and apply the
    same length-driven framing — adversarial payloads (blank lines,
    record mark, binary bytes) round-trip exactly."""
    import gzip

    from clinvar_ingest_spark.sources.warc import read_warc_gz

    payloads = [
        b"plain payload",
        b"blank\r\n\r\nline and mark WARC/1.0\r\n inside",
        "unicode € bytes".encode(),
        bytes([0, 1, 2, 255, 254]),  # binary payload
    ]
    segdir = tmp_path / "segs"
    segdir.mkdir()
    for f in range(2):
        with open(segdir / f"seg{f}.warc.gz", "wb") as fh:
            for i, p in enumerate(payloads):
                rec = (
                    f"WARC/1.0\r\nWARC-Type: response\r\n"
                    f"WARC-Target-URI: https://s{f}/r{i}\r\n"
                    f"WARC-Date: 2024-01-01T00:00:0{i}Z\r\n"
                    f"Content-Length: {len(p)}\r\n\r\n"
                ).encode() + p + b"\r\n\r\n"
                fh.write(gzip.compress(rec))

    rows = read_warc_gz(spark, str(segdir)).collect()
    assert len(rows) == 2 * len(payloads)
    got = {(r["warc_uri"], r["member_idx"]): bytes(r["payload"]) for r in rows}
    for f in range(2):
        for i, p in enumerate(payloads):
            assert got[(f"https://s{f}/r{i}", i)] == p
    # plan: Arrow-batched python, never row-at-a-time
    plan = (
        read_warc_gz(spark, str(segdir))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
