"""crawl_schedule: per-host politeness queues, host-affine sharding."""

import hashlib

from clinvar_ingest_spark.operators.crawl import crawl_schedule


def test_crawl_schedule_slots_and_shards(spark):
    rows = [
        ("https://a.com/1", 10),
        ("https://a.com/2", 30),
        ("https://a.com/3", 30),  # tie with /2 -> url order
        ("https://b.org/x", 5),
        ("not a url", 1),  # unparseable host -> '' group
    ]
    df = spark.createDataFrame(rows, "url string, priority long")
    out = crawl_schedule(df, politeness_ms=100, n_fetchers=3).collect()
    by_url = {r.url: r for r in out}
    a = [by_url[f"https://a.com/{i}"] for i in (1, 2, 3)]
    # priority desc, url asc: /2 (30) then /3 (30) then /1 (10)
    assert (a[1].slot, a[2].slot, a[0].slot) == (0, 1, 2)
    assert a[0].fetch_at_ms == 200
    assert by_url["https://b.org/x"].slot == 0
    # every url of a host shares the host's shard, and the shard is the
    # md5 arithmetic (portable across engines)
    exp = int(hashlib.md5(b"a.com").hexdigest()[:8], 16) % 3
    assert {r.shard for r in a} == {exp}
    assert by_url["not a url"].host == ""
