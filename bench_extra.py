#!/usr/bin/env python
"""Round-6 optimization measurement harness (bench.py is FROZEN; this
file carries the extra instrumentation the optimization round needs).

Subcommands:

  plans [names...]     — save .explain("formatted") of headline queries
                         to plans/r06/<name>_<tag>.txt (tag via --tag)
  queries [names...]   — time headline queries with a noop sink
                         (guide §1.4), best of N, per-query seconds
  ingest               — one instrumented ingest leg; prints the
                         per-stage driver wall split (metrics.snapshot)
                         for peak / cow8 / mor8 / scaling shapes

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as bench.py).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "lww_latest_event",
    "lww_latest_event_salted",
    "pricing_summary",
    "revenue_by_nation",
    "range_join_1day",
    "semi_join_active_customers",
]


def _session(cores: int | None = None):
    from clinvar_ingest_spark.session import get_spark

    cores = cores or CPUS
    return get_spark(
        f"bench-extra-c{cores}",
        master=f"local[{cores}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )


def cmd_plans(args):
    import __spark_entry__ as entrymod

    spark = _session()
    qs = entrymod.queries()
    names = args.names or HEADLINE
    os.makedirs("plans/r06", exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = f"plans/r06/{name}_{args.tag}.txt"
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")
    spark.stop()


def cmd_queries(args):
    import __spark_entry__ as entrymod

    spark = _session()
    qs = entrymod.queries()
    names = args.names or HEADLINE
    # warmup like bench.py
    qs[HEADLINE[0]](spark, SF_DIR).count()
    out = {}
    for name in names:
        samples = []
        for _ in range(args.n):
            spark.sparkContext.setJobDescription(f"noop:{name}")
            t0 = time.monotonic()
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.monotonic() - t0, 3))
        out[name] = {"min": min(samples), "samples": samples}
        print(name, out[name])
    print(json.dumps({"sf": SF_DIR, "cpus": CPUS, "queries": out}))
    spark.stop()


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


def cmd_ingest(args):
    """One instrumented leg. Shapes mirror bench.py exactly."""
    from clinvar_ingest_spark import metrics as _metrics
    from clinvar_ingest_spark.sources import ChangeLogSource, synthetic_change_log
    from clinvar_ingest_spark.streaming import IngestPipeline
    from clinvar_ingest_spark.tables import SnapshotTable

    shape = args.shape
    cores = args.cores or CPUS
    spark = _session(cores)
    workdir = args.workdir or tempfile.mkdtemp(prefix="bench_extra_")
    os.makedirs(workdir, exist_ok=True)
    if shape in ("peak", "cow8", "mor8"):
        n_events, html_repeat, n_buckets = 2_000_000, 15, 64
        span = n_events // 8 if shape in ("cow8", "mor8") else n_events
        merge_mode = "mor" if shape == "mor8" else "cow"
    else:  # scaling
        n_events, html_repeat, n_buckets = 6_000_000, 4, 32
        span, merge_mode = n_events, "cow"

    log_path = os.path.join(workdir, f"change_log_{n_events}_{html_repeat}")
    if not os.path.exists(log_path):
        synthetic_change_log(
            spark, n_events, n_urls=n_events // 8,
            num_partitions=max(CPUS, 8), html_repeat=html_repeat,
        ).write.mode("overwrite").parquet(log_path)

    # warmup (same as bench.py _warmup)
    if not args.no_warmup:
        p = os.path.join(workdir, "warm")
        shutil.rmtree(p, ignore_errors=True)
        tbl = SnapshotTable(spark, p, key_col="url", n_buckets=8).create(
            _pages_schema()
        )
        src = ChangeLogSource(
            synthetic_change_log(spark, 50_000, n_urls=8_000, html_repeat=15)
        )
        IngestPipeline(spark, src, tbl).run_to_end(span=50_000)
        shutil.rmtree(p, ignore_errors=True)

    results = []
    for i in range(args.n):
        tbl_path = os.path.join(workdir, f"pages_{shape}_{i}")
        shutil.rmtree(tbl_path, ignore_errors=True)
        tbl = SnapshotTable(
            spark, tbl_path, key_col="url", n_buckets=n_buckets
        ).create(_pages_schema())
        src = ChangeLogSource(spark.read.parquet(log_path))
        pipe = IngestPipeline(
            spark, src, tbl, dedup_strategy="window", merge_mode=merge_mode
        )
        _metrics.reset()
        t0 = time.monotonic()
        pipe.run_to_end(span=span)
        wall = time.monotonic() - t0
        st = _metrics.snapshot()
        st["wall"] = round(wall, 3)
        st["eps"] = round(n_events / wall, 1)
        results.append(st)
        print(json.dumps({"attempt": i, **st}))
        shutil.rmtree(tbl_path, ignore_errors=True)
    best = max(results, key=lambda s: s["eps"])
    print(json.dumps({
        "shape": shape, "cores": cores, "n_events": n_events,
        "best_eps": best["eps"], "best_split": best,
    }))
    if not args.workdir:
        shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("plans")
    p.add_argument("names", nargs="*")
    p.add_argument("--tag", default="before")
    p = sub.add_parser("queries")
    p.add_argument("names", nargs="*")
    p.add_argument("-n", type=int, default=3)
    p = sub.add_parser("ingest")
    p.add_argument("--shape", default="cow8",
                   choices=["peak", "cow8", "mor8", "scaling"])
    p.add_argument("--cores", type=int, default=None)
    p.add_argument("-n", type=int, default=1)
    p.add_argument("--workdir", default=None,
                   help="reuse a workdir so the log is generated once")
    p.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()
    {"plans": cmd_plans, "queries": cmd_queries, "ingest": cmd_ingest}[args.cmd](args)


if __name__ == "__main__":
    main()
