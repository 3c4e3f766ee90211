#!/usr/bin/env python
"""Sustained-churn soak for the incremental near-dup index: N batches of
inserts/updates/deletes over doc-shaped pages, NearDupIndex.refresh()
after every batch, final equality vs a from-scratch full recompute.
Prints ONE JSON line.

Usage: python tools/soak_neardup.py [n_docs] [n_batches]
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n_buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from clinvar_ingest_spark.operators.curation import derive_curated_corpus
    from clinvar_ingest_spark.operators.incremental_dedup import NearDupIndex
    from clinvar_ingest_spark.session import get_spark
    from clinvar_ingest_spark.tables import SnapshotTable

    spark = get_spark("soak-neardup", master="local[8]", shuffle_partitions=16)
    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("seq", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    workdir = tempfile.mkdtemp(prefix="soak_nd_")
    try:
        tbl = SnapshotTable(
            spark, os.path.join(workdir, "t"), "url", n_buckets
        ).create(schema)
        idx = NearDupIndex(tbl)

        # deterministic text pool: 40 base phrases, docs get base + small
        # suffix, so near-dup groups form and churn across batches
        def batch_df(b):
            # CDC shape: batch 0 bootstraps the whole corpus; later
            # batches churn (update/delete) TWO groups' docs — localized
            # deltas, the case where key-granularity closure pays off
            if b == 0:
                lo, hi = 0, n_docs
                d = spark.range(lo, hi)
            else:
                g1, g2 = b % 40, (b + 13) % 40
                d = spark.range(0, n_docs).filter(
                    (F.col("id") % 40).isin(g1, g2)
                    & ((F.col("id") + b) % 3 == 0)
                )
            d = d.select(
                F.concat(F.lit("https://docs.site/d"), F.col("id")).alias("url"),
                F.timestamp_seconds(
                    F.lit(1704067200) + F.lit(b) * 86400 + F.col("id")
                ).alias("warc_ts"),
                (F.lit(b) * n_docs * 2 + F.col("id")).alias("seq"),
                # group-DISTINCT vocabulary (8 tokens all carrying the
                # group id): near-dups form only within a group, so the
                # corpus holds ~40 small clusters, not 2 giant ones —
                # a giant cluster makes ANY closure O(corpus) by
                # definition and can't evidence key granularity
                F.concat(
                    F.lit("ga"), (F.col("id") % 40).cast("string"),
                    F.lit(" gb"), (F.col("id") % 40).cast("string"),
                    F.lit(" gc"), (F.col("id") % 40).cast("string"),
                    F.lit(" gd"), (F.col("id") % 40).cast("string"),
                    F.lit(" ge"), (F.col("id") % 40).cast("string"),
                    F.lit(" gf"), (F.col("id") % 40).cast("string"),
                    F.lit(" gg"), (F.col("id") % 40).cast("string"),
                    F.lit(" gh"), (F.col("id") % 40).cast("string"),
                    F.lit(" rev "), F.lit(b % 3).cast("string"),
                    F.lit(" tail "), (F.col("id") % 7).cast("string"),
                ).alias("text"),
                F.when((F.col("id") + b) % 17 == 0, F.lit("delete"))
                 .otherwise(F.lit("update")).alias("op"),
            )
            return d

        t0 = time.monotonic()
        touched, members, deltas = [], [], []
        for b in range(n_batches):
            tbl.merge_upsert(batch_df(b))
            touched.append(idx.refresh(collect_stats=True))
            st = getattr(idx, "last_stats", {})
            members.append(st.get("affected_members"))
            deltas.append(st.get("delta"))
        wall = time.monotonic() - t0

        inc = sorted(
            (r["cluster"], r["keeper"], r["n_members"], r["best_q"])
            for r in idx.curated().collect()
        )
        full = sorted(
            (r["cluster"], r["keeper"], r["n_members"], r["best_q"])
            for r in derive_curated_corpus(tbl.read().select("url", "text")).collect()
        )
        ok = inc == full
        print(json.dumps({
            "metric": "soak_neardup",
            "n_docs": n_docs,
            "n_batches": n_batches,
            "n_buckets": n_buckets,
            "wall_sec": round(wall, 1),
            "buckets_touched_per_batch": touched,
            "affected_members_per_batch": members,
            "delta_docs_per_batch": deltas,
            "clusters": len(inc),
            "incremental_equals_full": ok,
        }))
        return 0 if ok else 1
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
