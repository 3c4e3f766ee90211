"""Point-in-time (AS-OF) join (operators/joins.py asof_join).

Contract: pandas merge_asof / DuckDB ASOF JOIN semantics — nearest
at-or-before (backward) or at-or-after (forward) right row per key,
inclusive at equality, left rows without a candidate unmatched (nulls).
The time-bucketed skew path must be result-identical to the
single-window path.

Reference analog: "the release in effect at this event's date"
(clinvar_ingest/processing_history.py:121-141), resolved there by
correlated per-release-pair queries.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from clinvar_ingest_spark.operators.joins import asof_join

T0 = dt.datetime(2024, 1, 1)


def _ts(h):
    return T0 + dt.timedelta(hours=h)


@pytest.fixture()
def sides(spark):
    left = spark.createDataFrame(
        [
            ("k1", _ts(1), "l-a"),
            ("k1", _ts(5), "l-b"),
            ("k1", _ts(10), "l-c"),
            ("k2", _ts(3), "l-d"),   # no right rows at all
            ("k3", _ts(2), "l-e"),   # right rows only later
        ],
        "k string, t timestamp, lv string",
    )
    right = spark.createDataFrame(
        [
            ("k1", _ts(1), "r-1"),   # equal ts → inclusive match for l-a
            ("k1", _ts(4), "r-2"),
            ("k1", _ts(9), "r-3"),
            ("k3", _ts(7), "r-4"),
        ],
        "k string, rt timestamp, rv string",
    )
    return left, right


def _collect(df):
    return {
        r["lv"]: (r["rt"], r["rv"])
        for r in df.orderBy("k", "t").collect()
    }


def test_backward_inclusive_and_unmatched(spark, sides):
    left, right = sides
    got = _collect(asof_join(left, right, "k", "t", "rt"))
    assert got["l-a"] == (_ts(1), "r-1")   # inclusive at equality
    assert got["l-b"] == (_ts(4), "r-2")
    assert got["l-c"] == (_ts(9), "r-3")
    assert got["l-d"] == (None, None)      # key absent from right
    assert got["l-e"] == (None, None)      # all right rows later


def test_forward(spark, sides):
    left, right = sides
    got = _collect(asof_join(left, right, "k", "t", "rt", direction="forward"))
    assert got["l-a"] == (_ts(1), "r-1")   # inclusive
    assert got["l-b"] == (_ts(9), "r-3")
    assert got["l-c"] == (None, None)      # nothing at/after hour 10
    assert got["l-e"] == (_ts(7), "r-4")


def test_within_tolerance(spark, sides):
    left, right = sides
    # match only if the right row is at most 2 hours older
    got = _collect(
        asof_join(
            left,
            right,
            "k",
            "t",
            "rt",
            within=lambda lt, rt: lt - rt <= F.expr("INTERVAL 2 HOURS"),
        )
    )
    assert got["l-a"] == (_ts(1), "r-1")
    assert got["l-b"] == (_ts(4), "r-2")   # 1h gap: ok
    assert got["l-c"] == (_ts(9), "r-3")   # 1h gap: ok
    # widen the data: l at h5 vs nearest r at h4 passes, but a 3h gap fails
    got2 = _collect(
        asof_join(
            left,
            right,
            "k",
            "t",
            "rt",
            within=lambda lt, rt: lt - rt <= F.expr("INTERVAL 30 MINUTES"),
        )
    )
    assert got2["l-b"] == (None, None)     # 1h gap > 30min → unmatched
    assert got2["l-a"] == (_ts(1), "r-1")  # 0 gap still fine


def test_suffix_on_collision(spark):
    left = spark.createDataFrame([("k", 1.0, "x")], "k string, t double, v string")
    right = spark.createDataFrame([("k", 0.5, "y")], "k string, t double, v string")
    out = asof_join(left, right, "k", "t", "t")
    assert set(out.columns) == {"k", "t", "v", "t_r", "v_r"}
    r = out.first()
    assert (r["v"], r["t_r"], r["v_r"]) == ("x", 0.5, "y")


def _rand_sides(spark, n_left=400, n_right=300, n_keys=7):
    """Deterministic pseudo-random fixture: md5-derived times so both
    the plain and the bucketed path see real collisions and gaps."""
    left = (
        spark.range(n_left)
        .select(
            F.concat(F.lit("k"), (F.col("id") % n_keys)).alias("k"),
            (
                F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 6), 16, 10)
                .cast("long") % 10000
            ).cast("double").alias("t"),
            F.col("id").alias("lid"),
        )
    )
    right = (
        spark.range(n_right)
        .select(
            F.concat(F.lit("k"), (F.col("id") % (n_keys + 2))).alias("k"),
            (
                F.conv(F.substring(F.md5(F.concat(F.lit("r"), F.col("id"))), 1, 6), 16, 10)
                .cast("long") % 10000
            ).cast("double").alias("rt"),
            F.col("id").alias("rid"),
        )
        # enforce the uniqueness precondition per (k, rt)
        .groupBy("k", "rt")
        .agg(F.max("rid").alias("rid"))
    )
    return left, right


def test_bucketed_path_on_timestamps(spark, sides):
    """Regression: the bucket ordinal must handle TIMESTAMP(_NTZ)
    columns (a straight double cast is an AnalysisException on
    Spark 4)."""
    left, right = sides
    plain = _collect(asof_join(left, right, "k", "t", "rt"))
    bucketed = _collect(
        asof_join(left, right, "k", "t", "rt", time_buckets=4)
    )
    assert plain == bucketed


def test_bucketed_path_on_dates(spark):
    left = spark.createDataFrame(
        [("k", dt.date(2024, 1, 5), "l")], "k string, d date, lv string"
    )
    right = spark.createDataFrame(
        [("k", dt.date(2024, 1, 3), "r1"), ("k", dt.date(2024, 1, 7), "r2")],
        "k string, rd date, rv string",
    )
    out = asof_join(left, right, "k", "d", "rd", time_buckets=2).first()
    assert (out["rd"], out["rv"]) == (dt.date(2024, 1, 3), "r1")


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_bucketed_path_identical(spark, direction):
    left, right = _rand_sides(spark)
    plain = asof_join(left, right, "k", "t", "rt", direction=direction)
    bucketed = asof_join(
        left, right, "k", "t", "rt", direction=direction, time_buckets=8
    )
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, bucketed.collect()))
    assert a == b
    # sanity: a healthy share of rows actually matched
    n_match = sum(1 for r in a if r[3] is not None)
    assert n_match > len(a) * 0.5
