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
        tbl = SnapshotTable(spark, os.path.join(workdir, "t"), "url", 16).create(schema)
        idx = NearDupIndex(tbl)

        # deterministic text pool: 40 base phrases, docs get base + small
        # suffix, so near-dup groups form and churn across batches
        def batch_df(b):
            lo, hi = b * n_docs // n_batches, (b + 1) * n_docs // n_batches
            d = spark.range(lo, hi).select(
                F.concat(F.lit("https://docs.site/d"), F.col("id")).alias("url"),
                F.timestamp_seconds(F.lit(1704067200) + F.lit(b) * 86400 + F.col("id")).alias("warc_ts"),
                (F.lit(b) * n_docs + F.col("id")).alias("seq"),
                F.concat(
                    F.lit("phrase pool token run number "),
                    (F.col("id") % 40).cast("string"),
                    F.lit(" shared boilerplate span alpha beta gamma delta epsilon zeta "),
                    F.lit("rev "), F.lit(b % 3).cast("string"),
                    F.lit(" tail "), (F.col("id") % 7).cast("string"),
                ).alias("text"),
                F.when((F.col("id") + b) % 17 == 0, F.lit("delete"))
                 .otherwise(F.lit("update")).alias("op"),
            )
            # each batch also REVISITS a slice of earlier docs (updates + deletes)
            if b > 0:
                redo = spark.range(0, lo).filter((F.col("id") + b) % 11 == 0).select(
                    F.concat(F.lit("https://docs.site/d"), F.col("id")).alias("url"),
                    F.timestamp_seconds(F.lit(1704067200) + F.lit(b) * 86400 + F.lit(50000) + F.col("id")).alias("warc_ts"),
                    (F.lit(b) * n_docs + F.lit(n_docs) + F.col("id")).alias("seq"),
                    F.concat(F.lit("rewritten content batch "), F.lit(b).cast("string"),
                             F.lit(" unique tokens "), (F.col("id") % 13).cast("string"),
                             F.lit(" omega psi chi phi upsilon")).alias("text"),
                    F.when((F.col("id") + b) % 5 == 0, F.lit("delete"))
                     .otherwise(F.lit("update")).alias("op"),
                )
                d = d.unionByName(redo)
            return d

        t0 = time.monotonic()
        touched = []
        for b in range(n_batches):
            tbl.merge_upsert(batch_df(b))
            touched.append(idx.refresh())
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
            "wall_sec": round(wall, 1),
            "buckets_touched_per_batch": touched,
            "clusters": len(inc),
            "incremental_equals_full": ok,
        }))
        return 0 if ok else 1
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
