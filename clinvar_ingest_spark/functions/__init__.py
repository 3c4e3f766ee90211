from clinvar_ingest_spark.functions.extract import extract_text  # noqa: F401
