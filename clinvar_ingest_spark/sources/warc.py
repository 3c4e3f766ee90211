"""WARC segment parsing — the Common-Crawl native record format.

A WARC file is a concatenation of records, each an ASCII header block
(``WARC/1.0`` + ``Key: Value`` lines) followed by a blank CRLF line,
``Content-Length`` bytes of payload, and a CRLF CRLF record separator.
The reference ingests pre-extracted page events; a production crawl
pipeline starts one step earlier, at the WARC segments — so the engine
provides the splitter as a SOURCE-side operator.

Framing is **length-driven**, exactly like the spec (and the
reference's size-verified transfer contract,
clinvar_ingest/cloud/gcs.py:107-110): each record's payload is sliced
by its ``Content-Length`` header, measured in BYTES. Payloads may
therefore freely contain blank CRLF lines, the literal ``WARC/1.0``
record mark, fake ``Key: Value`` header lines, multi-byte UTF-8 —
none of it can desynchronize the parse (adversarial round-trips in
tests/test_sources.py).

Spark-first: the sequential walk a length-framed format requires is
expressed as an ``F.aggregate`` fold over ``sequence(1, k)`` — the
accumulator carries the current byte offset and the records parsed so
far, and every step is a whole-stage-codegen JVM expression
(``substring``/``instr``/``regexp_extract``). No Python in the path;
per-record work is O(header + payload) so a segment parses in one
linear pass, parallel at scan granularity (a 100 TB crawl is just more
segments).

Byte accuracy on a JVM engine whose string ops are character-based:
the segment is processed as BINARY (``substring`` on binary slices
bytes), and the bounded header zone is decoded ISO-8859-1 — a
byte↔char *bijection*, so character positions found by ``instr`` ARE
byte offsets. Header blocks larger than ``MAX_HEADER_BYTES`` (8 KiB —
far above any spec-conformant record) or records missing
``Content-Length`` stop the parse at that offset rather than guessing
at framing.

Production WARCs are gzip-per-record (one gzip member per record):
:func:`read_warc_gz` walks the member chain with a real decompressor
inside one Arrow-batched ``mapInPandas`` and applies the same
length-driven framing; binary payloads ride the existing
``html: binary`` column convention.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CRLF = "\r\n"
RECORD_MARK = "WARC/1.0" + CRLF
# Upper bound on one record's header block (mark + Key: Value lines +
# blank line). The WARC spec's named fields total well under 1 KiB;
# 8 KiB leaves room for long URIs. A header block that has not ended
# within the zone is treated as malformed (parse stops, no guessing).
MAX_HEADER_BYTES = 8192

_REC_SCHEMA = (
    "array<struct<warc_uri:string,warc_date:string,"
    "warc_type:string,payload:string>>"
)


def _hdr_field(header: Column, name: str) -> Column:
    """A named field from the (ASCII) header block — anchored to a line
    start so a value containing another field's name can't shadow it."""
    return F.nullif(
        F.regexp_extract(header, f"(?:^|\r\n){name}: ([^\r\n]+)", 1),
        F.lit(""),
    )


def parse_warc_segments(
    segments: DataFrame,
    seg_col: str = "segment",
) -> DataFrame:
    """Explode WARC segments into records: one row per record with
    (warc_uri, warc_date, warc_type, payload). Records missing a
    Target-URI (e.g. warcinfo) get NULL uri — filter by warc_type."""
    raw = F.col(seg_col)
    # accept string (UTF-8-encoded to bytes) or already-binary segments
    if segments.schema[seg_col].dataType.simpleString() == "binary":
        seg = raw
    else:
        seg = F.encode(raw, "UTF-8")

    # Iteration bound: every record BEGINS with the mark, so splitting
    # on it counts records exactly when no payload contains the literal
    # and OVERcounts otherwise — extra fold steps past the real tail
    # no-op (the accumulator offset parks at -1 / end). ISO-8859-1 is a
    # byte↔char bijection: safe to scan arbitrary binary through it.
    seg_latin = F.decode(seg, "ISO-8859-1")
    k = F.size(F.split(seg_latin, "WARC/1\\.0\r\n")) - 1
    steps = F.when(k >= 1, F.sequence(F.lit(1), k)).otherwise(
        F.array().cast("array<int>")
    )

    def _step(acc: Column, _x: Column) -> Column:
        pos = acc["pos"]  # 1-based byte offset of the next record
        # bounded header zone, decoded byte-per-char
        zone = F.decode(
            F.substring(seg, pos, MAX_HEADER_BYTES), "ISO-8859-1"
        )
        hdr_end = F.instr(zone, CRLF + CRLF)  # 1-based, 0 = not found
        header = F.substring(zone, 1, hdr_end - 1)
        cl = F.regexp_extract(header, "(?:^|\r\n)Content-Length: ([0-9]+)", 1)
        clen = F.nullif(cl, F.lit("")).cast("long")
        ok = (
            (pos > 0)
            & zone.startswith(RECORD_MARK)
            & (hdr_end > 0)
            & clen.isNotNull()
        )
        payload_pos = pos + hdr_end + 3  # abs offset just past CRLF CRLF
        payload = F.decode(
            F.substring(seg, payload_pos, clen.cast("int")), "UTF-8"
        )
        rec = F.struct(
            _hdr_field(header, "WARC-Target-URI").alias("warc_uri"),
            _hdr_field(header, "WARC-Date").alias("warc_date"),
            _hdr_field(header, "WARC-Type").alias("warc_type"),
            payload.alias("payload"),
        )
        return F.struct(
            # next record starts after payload + CRLF CRLF separator;
            # a malformed record parks the offset at -1 (stop, don't
            # guess) — remaining steps no-op
            F.when(ok, payload_pos + clen + 4)
            .otherwise(F.lit(-1).cast("long"))
            .alias("pos"),
            F.when(ok, F.array_append(acc["recs"], rec))
            .otherwise(acc["recs"])
            .alias("recs"),
        )

    recs = F.aggregate(
        steps,
        F.struct(
            F.lit(1).cast("long").alias("pos"),
            F.array().cast(_REC_SCHEMA).alias("recs"),
        ),
        _step,
        lambda acc: acc["recs"],
    )
    return (
        segments.select(F.explode(recs).alias("r"))
        .select("r.warc_uri", "r.warc_date", "r.warc_type", "r.payload")
    )


def make_warc_record(
    uri: Column, date: Column, payload: Column, warc_type: str = "response"
) -> Column:
    """Serialize one record (the writer side of the round-trip).
    ``Content-Length`` is the payload's UTF-8 BYTE length, per spec —
    what the length-driven parser slices by."""
    return F.concat(
        F.lit(RECORD_MARK),
        F.lit(f"WARC-Type: {warc_type}{CRLF}"),
        F.lit("WARC-Target-URI: "), uri, F.lit(CRLF),
        F.lit("WARC-Date: "), date, F.lit(CRLF),
        F.lit("Content-Length: "), F.octet_length(payload).cast("string"),
        F.lit(CRLF),
        F.lit(CRLF),
        payload,
        F.lit(CRLF + CRLF),
    )


# ---- gzip-per-record segments (the production Common-Crawl layout) --
#
# A real .warc.gz is a CONCATENATION of gzip members, one per record —
# that is what makes a 1 GB segment splittable record-wise and lets a
# fetcher range-request a single record. Whole-file codecs (Spark's
# gzip support) see only one stream, so the member walk needs a real
# decompressor: ONE mapInPandas over `binaryFile` rows (Arrow-batched,
# no per-row Python dispatch), zlib member-by-member, then the SAME
# length-driven record framing as the text path above. A 100-TB crawl
# is many segments; parallelism is per-file, which is exactly how
# production WARC readers shard (reference analog: streaming-bounded
# record iteration, clinvar_ingest/reader.py:144-189).

_WARC_GZ_SCHEMA = (
    "path string, member_idx long, warc_uri string, warc_date string, "
    "warc_type string, payload binary"
)


def _split_gzip_members(data: bytes):
    """Yield (member_index, decompressed_bytes) for each gzip member in
    a concatenated-member stream (zlib exposes unused_data at member
    boundaries; a plain `gzip.decompress` would fuse all members)."""
    import zlib

    idx = 0
    buf = data
    while buf:
        d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
        out = d.decompress(buf)
        if not d.eof:
            raise ValueError(f"truncated gzip member {idx}")
        yield idx, out
        idx += 1
        buf = d.unused_data.lstrip(b"\x00")


def _parse_record_bytes(rec: bytes, header_cap: int = MAX_HEADER_BYTES):
    """Length-driven parse of ONE record's bytes (same contract as the
    column-level fold: Content-Length slices the payload, malformed
    records return None rather than guessing)."""
    if not rec.startswith(RECORD_MARK.encode()):
        return None
    end = rec.find(b"\r\n\r\n", 0, header_cap)
    if end < 0:
        return None
    header = rec[:end].decode("iso-8859-1")
    import re as _re

    def field(name):
        m = _re.search(rf"(?:^|\r\n){name}: ([^\r\n]+)", header)
        return m.group(1) if m else None

    cl = field("Content-Length")
    if cl is None or not cl.isdigit():
        return None
    start = end + 4
    return (
        field("WARC-Target-URI"),
        field("WARC-Date"),
        field("WARC-Type"),
        rec[start:start + int(cl)],
    )


def read_warc_gz(spark, path: str) -> DataFrame:
    """Read gzip-per-record WARC segments under ``path`` into one row
    per record: (path, member_idx, warc_uri, warc_date, warc_type,
    payload:binary). Payloads stay BYTES (a crawl holds images and
    broken encodings too); decode downstream via the html:binary
    column convention."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)

    def _explode(batches):
        for pdf in batches:
            rows = {
                "path": [], "member_idx": [], "warc_uri": [],
                "warc_date": [], "warc_type": [], "payload": [],
            }
            for p, content in zip(pdf["path"], pdf["content"]):
                for idx, rec in _split_gzip_members(bytes(content)):
                    parsed = _parse_record_bytes(rec)
                    if parsed is None:
                        continue
                    uri, date, typ, payload = parsed
                    rows["path"].append(p)
                    rows["member_idx"].append(idx)
                    rows["warc_uri"].append(uri)
                    rows["warc_date"].append(date)
                    rows["warc_type"].append(typ)
                    rows["payload"].append(payload)
            yield pd.DataFrame(rows)

    return files.select("path", "content").mapInPandas(
        _explode, schema=_WARC_GZ_SCHEMA
    )


def write_warc_gz(df, out_path: str, record_col: str = "rec") -> int:
    """Serialize one gzip MEMBER per record (driver-side helper for
    fixtures/tests — a production writer is a foreachPartition of the
    same per-record gzip.compress). Returns records written."""
    import gzip
    import os

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    n = 0
    with open(out_path, "wb") as f:
        for r in df.select(record_col).toLocalIterator():
            f.write(gzip.compress(r[record_col].encode()))
            n += 1
    return n
