"""Delta-based incremental view maintenance (operators/ivm.py).

The counting algorithm's correctness contract: maintaining a grouped
COUNT/SUM view purely from signed change-feed deltas must equal a full
recompute over the final table state — including updates that MOVE a
row between groups (preimage decrements the old group, postimage
increments the new), deletes that empty a group (the group must vanish,
not linger at zero), and multi-batch folds.

Reference analog: the reference rebuilds cross-release rollups with
full post-processing passes per release
(clinvar_ingest/cloud/bigquery/stored_procedures.py:30-36); the IVM
path does the same maintenance in O(changes).
"""

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from clinvar_ingest_spark.operators.ivm import (
    apply_deltas,
    maintain_view,
    view_deltas,
)
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

# view: group by the text's first character, SUM(length(text)).
# Column exprs need a live session, so build them lazily.
def GROUPS():
    return {"g": F.substring("text", 1, 1)}


def SUMS():
    return {"chars": F.length("text")}


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, seq long, text string, op string"
    )


def _full_recompute(tbl):
    return (
        tbl.read()
        .groupBy(GROUPS()["g"].alias("g"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(SUMS()["chars"]).cast("long").alias("chars"),
        )
    )


def _as_map(df):
    return {r["g"]: (r["n_rows"], r["chars"]) for r in df.collect()}


def _make_table(spark, path):
    t = SnapshotTable(spark, path, "url", 4).create(SCHEMA)
    t.merge_upsert(
        _batch(
            spark,
            [
                ("u1", TS, 1, "aaaa", "insert"),
                ("u2", TS, 2, "abb", "insert"),
                ("u3", TS, 3, "ba", "insert"),
            ],
        )
    )  # s1: a→(2,7), b→(1,2)
    t.merge_upsert(
        _batch(
            spark,
            [
                # group move a→b AND sum change
                ("u1", TS + dt.timedelta(1), 4, "bcccc", "update"),
                # in-group sum change
                ("u2", TS + dt.timedelta(1), 5, "aa", "update"),
                ("u4", TS, 6, "cc", "insert"),
            ],
        )
    )  # s2: a→(1,2), b→(2,7), c→(1,2)
    t.merge_upsert(
        _batch(
            spark,
            [
                ("u4", TS + dt.timedelta(2), 7, None, "delete"),  # c empties
                ("u3", TS + dt.timedelta(2), 8, None, "delete"),
                ("u5", TS, 9, "bz", "insert"),
            ],
        )
    )  # s3: a→(1,2), b→(2,7)
    return t


def test_maintain_view_equals_full_recompute(spark, tmp_table_dir):
    t = _make_table(spark, tmp_table_dir)
    sids = sorted(t._load_manifest(n)["snapshot_id"] for n in t.history())
    view = maintain_view(t, sids, GROUPS(), SUMS())
    assert _as_map(view) == _as_map(_full_recompute(t))
    # the emptied group is GONE, not present at zero
    assert "c" not in _as_map(view)


def test_intermediate_state_matches_each_snapshot(spark, tmp_table_dir):
    """Folding batch-by-batch with apply_deltas tracks every snapshot's
    full recompute, not just the final one."""
    t = _make_table(spark, tmp_table_dir)
    sids = sorted(t._load_manifest(n)["snapshot_id"] for n in t.history())
    state = None
    for a, b in zip(sids, sids[1:]):
        d = view_deltas(t.change_feed(a, b), GROUPS(), SUMS())
        state = d if state is None else apply_deltas(state, d, ["g"])
        expect = (
            t.read_at(b)
            .groupBy(GROUPS()["g"].alias("g"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(SUMS()["chars"]).cast("long").alias("chars"),
            )
        )
        got = {
            r["g"]: (r["n_rows"], r["chars"])
            for r in state.where(F.col("n_rows") > 0).collect()
        }
        assert got == _as_map(expect), f"drift at snapshot {b}"


def test_view_deltas_signs(spark, tmp_table_dir):
    t = _make_table(spark, tmp_table_dir)
    sids = sorted(t._load_manifest(n)["snapshot_id"] for n in t.history())
    # sids[0] is the empty CREATE snapshot; batch-2 deltas are [1]→[2]
    d = _as_map(view_deltas(t.change_feed(sids[1], sids[2]), GROUPS(), SUMS()))
    # batch 2: a loses u1(4) gains u2 resize 3→2 → n −1, chars −5
    assert d["a"] == (-1, -5)
    # b gains u1 as "bcccc"(5) → +1, +5 ; c gains u4 "cc" → +1, +2
    assert d["b"] == (1, 5)
    assert d["c"] == (1, 2)


def test_count_only_view(spark, tmp_table_dir):
    """sum_exprs is optional — COUNT-only views maintain fine."""
    t = _make_table(spark, tmp_table_dir)
    sids = sorted(t._load_manifest(n)["snapshot_id"] for n in t.history())
    view = maintain_view(t, sids, GROUPS())
    got = {r["g"]: r["n_rows"] for r in view.collect()}
    assert got == {"a": 1, "b": 2}
