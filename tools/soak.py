#!/usr/bin/env python
"""Sustained-operation soak: the ops lifecycle a long-running deployment
exercises, compressed into one run. Prints ONE JSON line.

    32 micro-batches over a synthetic change log (MoR appends)
    + compaction every 8 batches
    + incremental derived-table refresh after every batch
    + a hard pipeline handover (fresh IngestPipeline) mid-run
    + orphan vacuum + snapshot expiry at the end
    + lineage audit
    + final-state equivalence vs an independent DuckDB LWW replay

Usage: python tools/soak.py [n_events] [n_batches]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from clinvar_ingest_spark.operators.normalize import (
        domain_stats_incremental,
    )
    from clinvar_ingest_spark.session import get_spark
    from clinvar_ingest_spark.sources import ChangeLogSource, synthetic_change_log
    from clinvar_ingest_spark.streaming import IngestPipeline
    from clinvar_ingest_spark.tables import SnapshotTable
    from pyspark.sql import types as T

    spark = get_spark("soak", master=f"local[{os.cpu_count() or 8}]")
    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("seq", T.LongType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("lang", T.StringType()),
        T.StructField("text", T.StringType()),
    ])
    workdir = tempfile.mkdtemp(prefix="soak_")
    try:
        log_path = os.path.join(workdir, "log")
        synthetic_change_log(
            spark, n_events, n_urls=n_events // 8, html_repeat=5
        ).write.parquet(log_path)
        log = spark.read.parquet(log_path)
        src = ChangeLogSource(log)
        tbl = SnapshotTable(spark, os.path.join(workdir, "pages"), "url", 32)
        tbl.create(schema)

        def mk_pipe():
            return IngestPipeline(
                spark, src, SnapshotTable(spark, tbl.path, "url", 32),
                merge_mode="mor",
                derived={"domain_stats": domain_stats_incremental},
            )

        span = n_events // n_batches + 1
        end = src.max_seq()
        ranges = src.plan_batches(-1, end, span)
        pipe = mk_pipe()
        t0 = time.monotonic()
        applied = compactions = 0
        for i, rng in enumerate(ranges):
            if i == len(ranges) // 2:
                pipe = mk_pipe()  # hard handover: resume from committed HWM
            rep = pipe.run_batch(rng, log_end_seq=end)
            applied += 0 if rep.skipped else 1
            if (i + 1) % 8 == 0:
                if tbl.compact() is not None:
                    compactions += 1
        wall = time.monotonic() - t0

        audit = pipe.verify_lineage()  # BEFORE expiry: old snapshots still resolvable
        vac = tbl.vacuum_orphans(keep_snapshots=10)
        state = pipe.current_state().select("url", "seq", "text")
        got = sorted((r["url"], r["seq"], r["text"]) for r in state.collect())

        # independent replay oracle: DuckDB LWW over the same log
        import duckdb

        con = duckdb.connect()
        want = con.execute(f"""
            WITH log AS (SELECT * FROM read_parquet('{log_path}/*.parquet')),
            w AS (SELECT url, seq, op,
                         -- byte-exact replica of functions/extract.py for
                         -- the synthetic corpus: script/comment/tag strip,
                         -- &amp; decode, whitespace collapse, trim
                         CASE WHEN html IS NULL THEN NULL ELSE
                           trim(regexp_replace(replace(regexp_replace(
                             decode(html),
                             '<script[^>]*>.*?</script\\s*>|<!--.*?-->|<[^>]*>',
                             ' ', 'gs'), '&amp;', '&'),
                             '\\s+', ' ', 'g')) END AS text,
                         row_number() OVER (PARTITION BY url
                           ORDER BY warc_ts DESC, seq DESC) AS rn
                  FROM log)
            SELECT url, seq, text FROM w WHERE rn = 1 AND op <> 'delete'
            ORDER BY url, seq
        """).fetchall()
        want = sorted((u, s, t) for u, s, t in want)
        state_ok = got == want

        derived_n = pipe.derived_table("domain_stats").count()
        print(json.dumps({
            "metric": "soak",
            "n_events": n_events,
            "n_batches_applied": applied,
            "compactions": compactions,
            "events_per_sec_sustained": round(n_events / wall, 1),
            "wall_sec": round(wall, 1),
            "lineage_ok": audit["ok"],
            "state_matches_sql_replay": state_ok,
            "state_rows": len(got),
            "derived_domains": derived_n,
            "orphans_removed": vac["removed"],
            "snapshots_after_expiry": vac["snapshots"],
        }))
        return 0 if (audit["ok"] and state_ok) else 1
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
