"""DML microbench: copy-on-write vs delta (equality-delete) row edits.

The scale claim under test: on a large table, a SMALL update/delete is
write-bound under CoW (every touched bucket is rewritten end-to-end)
but append-bound under delta mode (one small parquet append + a delete
file), at the price of one anti-join per read until compaction folds
it. This prints one JSON line with both walls and the post-edit read
wall, so the trade is measured, not asserted.

Run: python tools/bench_dml.py  [rows] [cores]
"""

import json
import os
import shutil
import sys
import tempfile
import time


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from clinvar_ingest_spark.session import get_spark
    from clinvar_ingest_spark.tables import SnapshotTable

    spark = get_spark(
        "bench-dml", master=f"local[{cores}]", shuffle_partitions=cores * 2
    )
    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("seq", T.LongType()),
        T.StructField("text", T.StringType()),
    ])

    def mk():
        path = tempfile.mkdtemp(prefix="bench_dml_")
        t = SnapshotTable(spark, path, key_col="url", n_buckets=32).create(schema)
        base = (
            spark.range(rows)
            .select(
                F.concat(F.lit("https://h/"), F.col("id")).alias("url"),
                F.timestamp_seconds(F.lit(1577836800) + F.col("id")).alias(
                    "warc_ts"
                ),
                F.col("id").alias("seq"),
                F.concat(
                    F.lit("body text payload "), F.col("id")
                ).alias("text"),
                F.lit("update").alias("op"),
            )
        )
        t.merge_upsert(base)
        return t, path

    out = {"rows": rows, "cores": cores, "edit_pct": 1}
    pred = (F.col("seq") % 100) == 7  # ~1% of rows, every bucket touched
    for mode in ("cow", "delta"):
        t, path = mk()
        w0 = time.time()
        t.update_where(pred, {"text": F.lit("edited")}, mode=mode)
        out[f"update_{mode}_sec"] = round(time.time() - w0, 3)
        w0 = time.time()
        n = t.read().count()
        out[f"read_after_{mode}_sec"] = round(time.time() - w0, 3)
        assert n == rows, (mode, n)
        if mode == "delta":
            w0 = time.time()
            t.compact()
            out["compact_fold_sec"] = round(time.time() - w0, 3)
            w0 = time.time()
            assert t.read().count() == rows
            out["read_after_fold_sec"] = round(time.time() - w0, 3)
        shutil.rmtree(path, ignore_errors=True)
    out["speedup_update"] = round(
        out["update_cow_sec"] / out["update_delta_sec"], 2
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
