from clinvar_ingest_spark.sources.synthetic import synthetic_change_log  # noqa: F401
from clinvar_ingest_spark.sources.change_log import ChangeLogSource  # noqa: F401
