#!/usr/bin/env python
"""One-off scaling-leg experiment harness (not part of the bench
contract): measures lo/hi ingest throughput for several scaling-log
shapes to pick the round-3 bench configuration. Prints one JSON line
per (config, round)."""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuse session/gen/run helpers)


def leg(cores, n_events, workdir, tag, html_repeat, n_buckets=32, warm=True):
    s = bench._session(cores)
    try:
        if warm:
            bench._warmup(s, workdir, f"w{tag}")
        from clinvar_ingest_spark.sources import synthetic_change_log

        log_path = os.path.join(workdir, f"log_{n_events}_{html_repeat}")
        if not os.path.exists(log_path):
            synthetic_change_log(
                s, n_events, n_urls=n_events // 8,
                num_partitions=32, html_repeat=html_repeat,
            ).write.mode("overwrite").parquet(log_path)
        from clinvar_ingest_spark.sources import ChangeLogSource
        from clinvar_ingest_spark.streaming import IngestPipeline
        from clinvar_ingest_spark.tables import SnapshotTable

        tbl_path = os.path.join(workdir, f"pages_{tag}")
        shutil.rmtree(tbl_path, ignore_errors=True)
        tbl = SnapshotTable(
            s, tbl_path, key_col="url", n_buckets=n_buckets
        ).create(bench._pages_schema())
        pipe = IngestPipeline(
            s, ChangeLogSource(s.read.parquet(log_path)), tbl,
            dedup_strategy="window",
        )
        t0 = time.monotonic()
        pipe.run_to_end(span=n_events)
        wall = time.monotonic() - t0
        return n_events / wall, wall
    finally:
        bench._stop(s)


def main():
    cfgs = json.loads(sys.argv[1]) if len(sys.argv) > 1 else [
        {"n": 2_000_000, "rep": 15, "rounds": 2},
        {"n": 6_000_000, "rep": 4, "rounds": 2},
    ]
    workdir = tempfile.mkdtemp(prefix="scalexp_")
    try:
        for cfg in cfgs:
            c_lo, c_hi = cfg.get("lo", 1), cfg.get("hi", 4)
            for r in range(cfg.get("rounds", 1)):
                lo, wl = leg(c_lo, cfg["n"], workdir,
                             f"lo{cfg['rep']}_{c_lo}_{r}", cfg["rep"])
                hi, wh = leg(c_hi, cfg["n"], workdir,
                             f"hi{cfg['rep']}_{c_hi}_{r}", cfg["rep"])
                print(json.dumps({
                    "cfg": cfg, "round": r,
                    "lo_eps": round(lo, 1), "lo_wall": round(wl, 1),
                    "hi_eps": round(hi, 1), "hi_wall": round(wh, 1),
                    "eff": round(hi / ((c_hi / c_lo) * lo), 3),
                }), flush=True)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
