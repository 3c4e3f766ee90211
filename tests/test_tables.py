"""SnapshotTable: snapshot isolation, bucket-pruned merge, evolution.

Reference analogs: CTAS + LWW dedup (create_tables.py:161-286),
schema_version stamping (config.py:49), processing_history fencing.
"""

import datetime as dt
import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from clinvar_ingest_spark.tables import SnapshotTable

TS = dt.datetime(2020, 1, 1)

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("seq", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _batch(spark, rows, with_lang=False):
    ddl = "url string, warc_ts timestamp, seq long, text string, op string"
    if with_lang:
        ddl += ", lang string"
    return spark.createDataFrame(rows, ddl)


def _mk(spark, path):
    return SnapshotTable(spark, path, key_col="url", n_buckets=8).create(SCHEMA)


def test_merge_insert_update_delete(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    t.merge_upsert(
        _batch(
            spark,
            [
                ("u1", TS, 1, "v1", "insert"),
                ("u2", TS, 2, "v1", "insert"),
            ],
        )
    )
    t.merge_upsert(
        _batch(
            spark,
            [
                ("u1", TS + dt.timedelta(1), 3, "v2", "update"),
                ("u2", TS + dt.timedelta(1), 4, None, "delete"),
                ("u3", TS, 5, "v1", "insert"),
            ],
        )
    )
    got = {r["url"]: r["text"] for r in t.read().collect()}
    assert got == {"u1": "v2", "u3": "v1"}
    # tombstone retained in storage
    dead = t.read(include_deleted=True).filter(F.col("_deleted")).collect()
    assert [r["url"] for r in dead] == ["u2"]


def test_stale_update_loses_to_stored_tombstone(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    t.merge_upsert(_batch(spark, [("u1", TS + dt.timedelta(5), 1, None, "delete")]))
    t.merge_upsert(_batch(spark, [("u1", TS + dt.timedelta(2), 2, "old", "update")]))
    assert t.read().count() == 0
    # but a genuinely newer update resurrects
    t.merge_upsert(_batch(spark, [("u1", TS + dt.timedelta(9), 3, "new", "update")]))
    assert [r["text"] for r in t.read().collect()] == ["new"]


def test_merge_rewrites_only_touched_buckets(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    rows = [(f"u{i}", TS, i, "x", "insert") for i in range(50)]
    t.merge_upsert(_batch(spark, rows))
    m1 = t.current_manifest()
    res = t.merge_upsert(
        _batch(spark, [("u1", TS + dt.timedelta(1), 99, "y", "update")])
    )
    m2 = t.current_manifest()
    assert len(res.touched_buckets) == 1
    tb = str(res.touched_buckets[0])
    for b, files in m2["buckets"].items():
        if b == tb:
            assert files != m1["buckets"][b]
        else:
            # untouched buckets carry the SAME physical files forward
            assert files == m1["buckets"][b]


def test_schema_evolution_additive(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    t.merge_upsert(_batch(spark, [("u1", TS, 1, "v1", "insert")]))
    assert "lang" not in [f.name for f in t.schema().fields]
    t.merge_upsert(
        _batch(spark, [("u2", TS, 2, "v1", "insert", "en")], with_lang=True)
    )
    got = {r["url"]: r["lang"] for r in t.read().collect()}
    # old rows read back with NULL for the evolved column
    assert got == {"u1": None, "u2": "en"}
    assert "lang" in [f.name for f in t.schema().fields]


def test_time_travel_and_snapshot_isolation(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    t.merge_upsert(_batch(spark, [("u1", TS, 1, "v1", "insert")]))
    s1 = t.snapshot_id()
    t.merge_upsert(_batch(spark, [("u1", TS + dt.timedelta(1), 2, "v2", "update")]))
    assert [r["text"] for r in t.read_at(s1).filter(~F.col("_deleted")).collect()] == ["v1"]
    assert [r["text"] for r in t.read().collect()] == ["v2"]


def test_properties_commit_atomically_with_data(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    t.merge_upsert(
        _batch(spark, [("u1", TS, 1, "v1", "insert")]),
        properties={"global_hwm": 1},
    )
    with open(os.path.join(tmp_table_dir, "_ptr")) as f:
        name = f.read().strip()
    with open(os.path.join(tmp_table_dir, "_manifests", name)) as f:
        m = json.load(f)
    assert m["properties"]["global_hwm"] == 1


def test_vacuum_tombstones(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    t.merge_upsert(_batch(spark, [("u1", TS, 1, None, "delete"),
                                  ("u2", TS + dt.timedelta(10), 2, "v", "insert")]))
    assert t.read(include_deleted=True).count() == 2
    t.vacuum_tombstones(TS + dt.timedelta(5))
    assert t.read(include_deleted=True).filter(F.col("_deleted")).count() == 0
    assert [r["url"] for r in t.read().collect()] == ["u2"]


def test_direct_writer_roundtrips_timestamps_and_binary(spark, tmp_table_dir):
    """The direct (pyarrow) writer must round-trip every column type the
    pages schema uses bit-exactly — timestamps in particular: cross-batch
    LWW compares STORED warc_ts against new events, so a shifted or
    NTZ-mangled timestamp would silently corrupt merge ordering."""
    import datetime as dt

    from pyspark.sql import types as T

    from clinvar_ingest_spark.tables import SnapshotTable

    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("seq", T.LongType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
    ])
    t = SnapshotTable(spark, tmp_table_dir, "url", 4).create(schema)
    ts = dt.datetime(2021, 6, 30, 23, 59, 59, 123456)
    t.merge_upsert(
        spark.createDataFrame(
            [("u1", ts, 7, b"\x00\xffbin", "x", "insert")],
            "url string, warc_ts timestamp, seq long, html binary, "
            "text string, op string",
        )
    )
    row = t.read().collect()[0]
    assert row["warc_ts"] == ts  # microsecond-exact
    assert bytes(row["html"]) == b"\x00\xffbin"
    assert t.schema()["warc_ts"].dataType.typeName() == "timestamp"
    # and the stored value participates correctly in a later LWW merge
    t.merge_upsert(
        spark.createDataFrame(
            [("u1", ts - dt.timedelta(seconds=1), 8, None, "stale", "update")],
            "url string, warc_ts timestamp, seq long, html binary, "
            "text string, op string",
        )
    )
    assert t.read().collect()[0]["text"] == "x"  # older ts lost LWW
