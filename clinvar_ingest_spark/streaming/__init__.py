from clinvar_ingest_spark.streaming.pipeline import IngestPipeline  # noqa: F401
