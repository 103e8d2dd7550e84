from healthcare_rcm_etl_pipeline_spark.operators import (  # noqa: F401
    dedup,
    keys,
    quality,
    scd2,
    similarity,
)
