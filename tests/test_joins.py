"""range_join and prioritized_left_join semantics."""

import datetime as dt

from pyspark.sql import functions as F

from clinvar_ingest_spark.operators.joins import prioritized_left_join, range_join

D = dt.datetime


def test_range_join_pm1_day(spark):
    a = spark.createDataFrame(
        [("v1", D(2024, 1, 10)), ("v2", D(2024, 1, 20))], "vid string, vd timestamp"
    )
    b = spark.createDataFrame(
        [("r1", D(2024, 1, 9)), ("r2", D(2024, 1, 11)), ("r3", D(2024, 1, 15))],
        "rid string, rd timestamp",
    )
    got = sorted(
        (r["vid"], r["rid"])
        for r in range_join(a, b, "vd", "rd", max_days=1).collect()
    )
    assert got == [("v1", "r1"), ("v1", "r2")]


def test_prioritized_first_match_wins(spark):
    left = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "id long, grp string"
    )
    s1 = spark.createDataFrame([(1, "exact-1")], "k long, v string")
    s2 = spark.createDataFrame(
        [("x", "grp-x"), ("y", "grp-y")], "g string, v string"
    )
    out = prioritized_left_join(
        left,
        [
            (s1, lambda l, r: l.id == r["_m0_k"], "v"),
            (s2, lambda l, r: l.grp == r["_m1_g"], "v"),
        ],
        output_col="match",
        default=F.lit("none"),
    )
    got = {r["id"]: r["match"] for r in out.collect()}
    # id=1 matches BOTH strategies; the higher-priority exact match wins
    assert got == {1: "exact-1", 2: "grp-y", 3: "none"}
    assert out.columns == ["id", "grp", "match"]


def test_range_join_left_multiplicity_under_aqe(spark):
    """The left path's unmatched-row reattachment must preserve EXACT row
    multiplicity under AQE re-planning and arbitrary repartitioning — the
    row id is derived from row content, not monotonically_increasing_id()
    (round-2 ADVICE: MID is recomputed per plan branch and unstable)."""
    rows = (
        # 2 IDENTICAL matched rows + 2 identical unmatched + singletons
        [("dup-hit", D(2024, 1, 10))] * 2
        + [("dup-miss", D(2024, 3, 1))] * 2
        + [("v1", D(2024, 1, 10)), ("v2", D(2024, 1, 20))]
    )
    a = spark.createDataFrame(rows, "vid string, vd timestamp").repartition(7)
    b = spark.createDataFrame(
        [("r1", D(2024, 1, 9)), ("r2", D(2024, 1, 11)), ("r3", D(2024, 1, 15))],
        "rid string, rd timestamp",
    ).repartition(3)
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try:
        out = range_join(a, b, "vd", "rd", max_days=1, how="left")
        got = sorted((r["vid"], r["rid"]) for r in out.collect())
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert got == sorted(
        [("dup-hit", "r1"), ("dup-hit", "r2")] * 2
        + [("dup-miss", None)] * 2
        + [("v1", "r1"), ("v1", "r2"), ("v2", None)]
    )
