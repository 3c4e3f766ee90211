"""File-format sources with explicit schemas.

Reference parity: the reference reads/writes NDJSON(.gz) per entity
with fixed declared schemas and an autodetect fallback
(clinvar_ingest/parse.py:184-278, cloud/bigquery/create_tables.py:70-91,
unified gzip/local/remote open parse.py:33-50 + fs.py:51-83). Spark's
DataFrameReader + Hadoop codecs make the transport free; what this
module pins down is the schema contract:

* explicit schema → no sampling pass over 100 TB, dirty values become
  NULL (permissive, like the reference's int_or_none/sanitize_date),
* ``infer=True`` opt-in reproduces the reference's autodetect mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_ndjson(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    infer: bool = False,
) -> DataFrame:
    """Newline-delimited JSON (gzip transparent via codec extension)."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    elif not infer:
        raise ValueError("pass a schema or set infer=True (autodetect)")
    return r.json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
    infer: bool = False,
) -> DataFrame:
    r = spark.read.option("header", header)
    if schema is not None:
        r = r.schema(schema)
    elif infer:
        r = r.option("inferSchema", True)
    else:
        raise ValueError("pass a schema or set infer=True (autodetect)")
    return r.csv(path)


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: T.StructType | str | None = None,
    **kwargs,
) -> DataFrame:
    """Format dispatch (reference reader_fn_for_format, parse.py:133-143)."""
    fmt = fmt.lower()
    if fmt in ("ndjson", "json", "jsonl"):
        return read_ndjson(spark, path, schema, **kwargs)
    if fmt == "csv":
        return read_csv(spark, path, schema, **kwargs)
    if fmt == "parquet":
        r = spark.read
        if schema is not None:
            r = r.schema(schema)
        return r.parquet(path)
    raise ValueError(f"unknown format {fmt!r}")


def write_ndjson(df: DataFrame, path: str, compression: str | None = "gzip"):
    """Per-entity NDJSON sink analog (parse.py:232-252); used for interop
    exports, not the lake format (that is parquet snapshots)."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
