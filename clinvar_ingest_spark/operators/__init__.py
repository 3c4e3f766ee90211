from clinvar_ingest_spark.operators.dedup import lww_dedup  # noqa: F401
