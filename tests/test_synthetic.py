"""Generator determinism: same seed → byte-identical log at any parallelism."""

from clinvar_ingest_spark.sources import synthetic_change_log


def _key(r):
    return (r["seq"], r["part"], r["op"], r["url"], r["warc_ts"],
            bytes(r["html"]) if r["html"] is not None else None, r["lang"])


def test_identical_across_partitionings(spark):
    a = synthetic_change_log(spark, 800, n_urls=100, num_partitions=1)
    b = synthetic_change_log(spark, 800, n_urls=100, num_partitions=13)
    assert sorted(map(_key, a.collect())) == sorted(map(_key, b.collect()))


def test_shape(spark):
    df = synthetic_change_log(spark, 500, n_urls=60)
    assert df.columns == ["part", "seq", "op", "url", "warc_ts", "html", "lang"]
    ops = {r["op"] for r in df.select("op").distinct().collect()}
    assert ops == {"insert", "update", "delete"}
    # deletes carry no payload
    assert df.filter("op = 'delete' and html is not null").count() == 0
    assert df.filter("op != 'delete' and html is null").count() == 0
