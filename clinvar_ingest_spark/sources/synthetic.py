"""Deterministic synthetic Common-Crawl-style change log.

Reference analog: the golden XML fixture corpus
(/root/reference/test/data/, catalog test/Readme.md) — each generator
knob exercises one engine feature (FIXTURES.md §1):

* ``hot_share``      — fraction of events landing on a tiny hot-url set
                       (hot-domain skew → salted dedup test),
* ``delete_frac``    — interleaved tombstones, delete-then-reinsert,
* out-of-order ``warc_ts`` vs ``seq`` — LWW tiebreak test,
* ``with_lang``      — the pre-/post-schema-evolution shapes.

Everything derives from ``spark.range`` + ``xxhash64(id, seed, k)``
column expressions: no driver-side loops, no Python RNG, no collect —
the same generator expression runs at 10^4 rows in tests and would run
at 10^10 rows on a cluster. Same (n_events, seed) → byte-identical log
at any parallelism (tested).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_TS = 1_600_000_000  # 2020-09-13 UTC; fixed epoch base, never "now"


def _rnd(seed: int, k: int) -> Column:
    """Deterministic pseudo-random non-negative 64-bit per row."""
    return F.abs(F.xxhash64(F.col("id"), F.lit(seed), F.lit(k)))


def synthetic_change_log(
    spark: SparkSession,
    n_events: int,
    n_urls: int | None = None,
    n_parts: int = 4,
    hot_share: int = 30,
    hot_urls: int = 8,
    delete_frac: int = 6,
    seed: int = 42,
    with_lang: bool = True,
    num_partitions: int | None = None,
    html_repeat: int = 0,
) -> DataFrame:
    """Ordered change log: (part, seq, op, url, warc_ts, html[, lang]).

    ``hot_share``/``delete_frac`` are percents. ``seq`` is globally
    monotonic (so per-part monotonic too). ``warc_ts`` has ±~90 min
    jitter against seq order, so LWW by (warc_ts, seq) differs from
    arrival order — the dedup actually has work to do.
    """
    n_urls = n_urls or max(n_events // 8, 4)
    rng = spark.range(0, n_events, 1, num_partitions or spark.sparkContext.defaultParallelism)

    is_hot = _rnd(seed, 1) % 100 < F.lit(hot_share)
    uid = F.when(is_hot, _rnd(seed, 2) % F.lit(hot_urls)).otherwise(
        F.lit(hot_urls) + _rnd(seed, 2) % F.lit(max(n_urls - hot_urls, 1))
    )
    domain = F.when(uid < F.lit(hot_urls), F.lit(0)).otherwise(uid % 199 + 1)
    url = F.concat(
        F.lit("https://d"), domain.cast("string"),
        F.lit(".example.com/page/"), uid.cast("string"),
    )

    opr = _rnd(seed, 3) % 100
    op = (
        F.when(opr < F.lit(delete_frac), F.lit("delete"))
        .when(opr < F.lit(delete_frac + 10), F.lit("insert"))
        .otherwise(F.lit("update"))
    )

    jitter = (_rnd(seed, 4) % 10800).cast("long") - F.lit(5400)
    warc_ts = F.timestamp_seconds(F.lit(BASE_TS) + F.col("id") * 7 + jitter)

    body_parts = [
        F.lit("<html><head><title>Page "), uid.cast("string"),
        F.lit("</title><script>var t=1;</script></head><body><h1>Doc "),
        uid.cast("string"),
        F.lit("</h1><p>revision "), F.col("id").cast("string"),
        F.lit(" &amp; content for url "), uid.cast("string"), F.lit(".</p>"),
    ]
    if html_repeat:
        # Common-Crawl pages are KB-scale; pad with deterministic filler
        # paragraphs (1..2·html_repeat of ~70 B each) so extraction and
        # shuffle carry realistic per-event weight in benchmarks.
        n_paras = (_rnd(seed, 7) % html_repeat + html_repeat).cast("int")
        para = F.concat(
            F.lit("<p>lorem ipsum dolor sit amet consectetur adipiscing elit r"),
            (_rnd(seed, 8) % 1000).cast("string"),
            F.lit("</p>"),
        )
        body_parts.append(F.repeat(para, n_paras))
    body_parts.append(F.lit("<!-- c --></body></html>"))
    html = F.when(op != F.lit("delete"), F.encode(F.concat(*body_parts), "UTF-8"))

    cols = [
        (_rnd(seed, 5) % n_parts).cast("int").alias("part"),
        F.col("id").alias("seq"),
        op.alias("op"),
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
    ]
    if with_lang:
        langs = F.array(*[F.lit(x) for x in ["en", "de", "fr", "es", "pt"]])
        cols.append(
            F.when(op != F.lit("delete"), langs[(_rnd(seed, 6) % 5).cast("int")])
            .alias("lang")
        )
    return rng.select(*cols)
