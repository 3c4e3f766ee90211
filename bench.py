#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line.

Measures two things:

1. headline queries from ``__spark_entry__`` at $SPARK_GRAFT_SF_DIR
   (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS];
2. the north-star metric: sustained change-events/sec of the full CDC
   ingest (synthetic log → Arrow extract → salted LWW merge → snapshot
   commit), run at TWO parallelism levels (cpus and cpus/4) on the SAME
   input to evidence the N-vs-4N throughput-scaling criterion
   (BASELINE.json north_rule; no real cluster in the sandbox).

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BENCH_INGEST_EVENTS,
BENCH_SKIP_SCALING=1 (skip the low-parallelism rerun while iterating).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
INGEST_EVENTS = int(os.environ.get("BENCH_INGEST_EVENTS", "1000000"))

HEADLINE = [
    "lww_latest_event",
    "lww_latest_event_salted",
    "pricing_summary",
    "revenue_by_nation",
    "range_join_1day",
    "semi_join_active_customers",
]


def _session(cores: int):
    from clinvar_ingest_spark.session import get_spark

    return get_spark(
        f"bench-c{cores}", master=f"local[{cores}]", shuffle_partitions=max(cores, 8)
    )


def run_queries(spark) -> dict[str, float]:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    out = {}
    for name in HEADLINE:
        if name not in qs:
            continue
        t0 = time.monotonic()
        df = qs[name](spark, SF_DIR)
        n = df.count()
        out[name] = round(time.monotonic() - t0, 3)
        assert n >= 0
    return out


PAGES_SCHEMA_FIELDS = [
    ("url", "string"), ("warc_ts", "timestamp"), ("seq", "long"),
    ("html", "binary"), ("lang", "string"), ("text", "string"),
]


def _pages_schema():
    from pyspark.sql import types as T

    m = {
        "string": T.StringType(), "timestamp": T.TimestampType(),
        "long": T.LongType(), "binary": T.BinaryType(),
    }
    return T.StructType([T.StructField(n, m[t]) for n, t in PAGES_SCHEMA_FIELDS])


def gen_log(spark, n_events: int, workdir: str) -> str:
    """Materialize the log once so every parallelism level reads the
    SAME bytes from disk (scan included in the measured path, like a
    real Kafka/Iceberg tail). KB-scale pages via html_repeat."""
    from clinvar_ingest_spark.sources import synthetic_change_log

    log_path = os.path.join(workdir, "change_log")
    if not os.path.exists(log_path):
        synthetic_change_log(
            spark, n_events, n_urls=n_events // 8,
            num_partitions=max(CPUS, 8), html_repeat=15,
        ).write.mode("overwrite").parquet(log_path)
    return log_path


def run_ingest(spark, n_events: int, workdir: str, tag: str) -> float:
    """Full pipeline on the materialized log; returns events/sec."""
    from clinvar_ingest_spark.sources import ChangeLogSource
    from clinvar_ingest_spark.streaming import IngestPipeline
    from clinvar_ingest_spark.tables import SnapshotTable

    log_path = gen_log(spark, n_events, workdir)
    tbl_path = os.path.join(workdir, f"pages_{tag}")
    shutil.rmtree(tbl_path, ignore_errors=True)
    tbl = SnapshotTable(spark, tbl_path, key_col="url", n_buckets=64).create(
        _pages_schema()
    )
    src = ChangeLogSource(spark.read.parquet(log_path))
    pipe = IngestPipeline(spark, src, tbl, dedup_strategy="max_by")
    t0 = time.monotonic()
    pipe.run_to_end(span=max(n_events // 4, 1))  # 4 micro-batches
    wall = time.monotonic() - t0
    return n_events / wall


def _warmup(spark, workdir: str, tag: str):
    """Small untimed ingest: JIT/Arrow/codegen warmup per session so the
    measured runs compare parallelism, not JVM warmth."""
    from clinvar_ingest_spark.sources import ChangeLogSource, synthetic_change_log
    from clinvar_ingest_spark.streaming import IngestPipeline
    from clinvar_ingest_spark.tables import SnapshotTable

    p = os.path.join(workdir, f"warm_{tag}")
    shutil.rmtree(p, ignore_errors=True)
    tbl = SnapshotTable(spark, p, key_col="url", n_buckets=8).create(_pages_schema())
    src = ChangeLogSource(
        synthetic_change_log(spark, 50_000, n_urls=8_000, html_repeat=15)
    )
    IngestPipeline(spark, src, tbl).run_to_end(span=50_000)
    shutil.rmtree(p, ignore_errors=True)


def main():
    results: dict = {"sf": SF_DIR, "cpus": CPUS}
    t_all = time.monotonic()

    workdir = tempfile.mkdtemp(prefix="bench_ingest_")
    try:
        eps_lo = None
        eff = None
        if os.environ.get("BENCH_SKIP_SCALING") != "1":
            # low-parallelism level FIRST (any residual JVM warmth then
            # favors neither side: each level gets its own warmup)
            lo_cores = max(CPUS // 4, 1)
            spark_lo = _session(lo_cores)
            gen_log(spark_lo, INGEST_EVENTS, workdir)
            _warmup(spark_lo, workdir, "lo")
            eps_lo = run_ingest(spark_lo, INGEST_EVENTS, workdir, "lo")
            spark_lo.stop()

        spark = _session(CPUS)
        qtimes = run_queries(spark)
        _warmup(spark, workdir, "hi")
        eps_hi = run_ingest(spark, INGEST_EVENTS, workdir, "hi")
        spark.stop()
        if eps_lo:
            # efficiency of scaling from N=lo_cores to 4N=CPUS
            eff = eps_hi / (4.0 * eps_lo)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

    total = time.monotonic() - t_all
    results.update(
        {
            "metric": "bench_total_wall",
            "value": round(total, 3),
            "unit": "sec",
            "queries": qtimes,
            "ingest": {
                "n_events": INGEST_EVENTS,
                "events_per_sec_hi": round(eps_hi, 1),
                "events_per_sec_lo": round(eps_lo, 1) if eps_lo else None,
                "cores_hi": CPUS,
                "cores_lo": max(CPUS // 4, 1),
                "scaling_efficiency_n_to_4n": round(eff, 3) if eff else None,
            },
        }
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
