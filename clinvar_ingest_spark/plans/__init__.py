from clinvar_ingest_spark.plans.explain import (  # noqa: F401
    executed_plan,
    plan_has,
    pushed_filters,
)
