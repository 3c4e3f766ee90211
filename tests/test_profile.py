"""column_profile: one-pass Deequ-style stats, exact vs approx."""

from pyspark.sql import functions as F

from clinvar_ingest_spark.operators.profile import column_profile


def test_column_profile_exact(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 10), (3, "a", 20), (4, None, 20)],
        "id long, s string, v int",
    )
    got = {r["column"]: r for r in column_profile(df).collect()}
    assert set(got) == {"id", "s", "v"}
    for r in got.values():
        assert r["n_rows"] == 4
    assert (got["s"]["n_nulls"], got["s"]["n_distinct"]) == (1, 2)
    assert (got["v"]["n_nulls"], got["v"]["n_distinct"]) == (1, 2)
    # native-type ordering, not lexicographic: min of (10, 20) is "10"
    assert (got["v"]["min_value"], got["v"]["max_value"]) == ("10", "20")
    assert (got["id"]["min_value"], got["id"]["max_value"]) == ("1", "4")


def test_column_profile_single_aggregate_plan(spark):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("m")
    )
    prof = column_profile(df)
    plan = prof._jdf.queryExecution().executedPlan().toString()
    # one global aggregate feeding the explode — no join, no window
    assert "Join" not in plan and "Window" not in plan


def test_column_profile_approx_bounds(spark):
    df = spark.range(5000).select(
        F.col("id"), (F.col("id") % 97).alias("m")
    )
    exact = {
        r["column"]: r["n_distinct"]
        for r in column_profile(df).collect()
    }
    approx = {
        r["column"]: r["n_distinct"]
        for r in column_profile(df, approx_distinct=True, rsd=0.02).collect()
    }
    # HLL++ rsd is a standard deviation, not a bound: allow ~4 sigma
    for c, e in exact.items():
        assert abs(approx[c] - e) <= max(3, int(0.08 * e)), (c, e, approx[c])


def test_distribution_drift(spark):
    from clinvar_ingest_spark.operators.profile import distribution_drift

    before = spark.createDataFrame(
        [("a",)] * 4 + [("b",)] * 2 + [("gone",)], "g string"
    )
    after = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 1 + [("new",)] * 3, "g string"
    )
    out = {
        r["group"]: r
        for r in distribution_drift(before, after, F.col("g")).collect()
    }
    assert (out["a"].n_before, out["a"].n_after, out["a"].delta) == (4, 5, 1)
    assert out["a"].drift_bps == 2500
    assert out["b"].drift_bps == 5000  # 2 -> 1
    # vanishing and appearing groups both surface
    assert (out["gone"].n_after, out["gone"].drift_bps) == (0, 10000)
    assert (out["new"].n_before, out["new"].drift_bps) == (0, 30000)
